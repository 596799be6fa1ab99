"""Substring-dedup fidelity vs a TRUE suffix-array reference (r08).

``duplicated_ngram_spans`` documents itself as replacing Lee et al. 2021's
suffix array with a dense n-gram hash-group. This file pins the claim that
the replacement is EXACT, not an approximation, via the classic identity:

    position p lies inside some corpus-duplicated substring of length >= n
        <=>  some duplicated n-gram's window [q, q+n-1] covers p

(→: every length-n window inside a duplicated substring is itself a
duplicated substring; ←: a duplicated n-gram IS a duplicated substring of
length n.) So the dup-position coverage, and therefore the maximal spans,
their count, and the covered-token total, are identical between the two
formulations. The reference here is computed the suffix-array way —
suffix array + LCP over the separator-joined corpus, per-suffix max-LCP
with a neighbor, union of [i, i + m_i - 1] for m_i >= n — i.e. a genuinely
independent second derivation, exercised by hypothesis over adversarially
small alphabets (which maximize duplicate structure).

The ONE divergence class that survives the identity is int64 hash
collision between distinct grams (xxhash64 over the token-array slice):
~2^-64 per gram pair, negligible at any corpus size this engine targets
and impossible to hit deterministically in a test; documented here rather
than bounded empirically.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from volga_spark.operators.dedup import duplicated_ngram_spans

# --- pure-Python suffix-array reference (small corpora only) ---------------


def _suffix_array(seq: list) -> list[int]:
    """O(N^2 log N) suffix array — fine at test sizes, trivially correct."""
    return sorted(range(len(seq)), key=lambda i: seq[i:])


def _lcp_array(seq: list, sa: list[int]) -> list[int]:
    """lcp[j] = common prefix length of suffixes sa[j-1], sa[j] (lcp[0]=0)."""
    lcp = [0] * len(sa)
    for j in range(1, len(sa)):
        a, b = sa[j - 1], sa[j]
        k = 0
        while a + k < len(seq) and b + k < len(seq) and seq[a + k] == seq[b + k]:
            k += 1
        lcp[j] = k
    return lcp


def sa_dup_coverage(docs: list[list[str]], n: int) -> dict[int, set[int]]:
    """Per-doc sets of 1-based token positions covered by some duplicated
    substring of length >= n, via suffix array + LCP (the Lee et al.
    formulation). Docs are joined with unique, unrepeatable separator
    tokens so no gram crosses a document boundary."""
    seq: list = []
    where: list[tuple[int, int] | None] = []  # global idx -> (doc, 1-based pos)
    for d, toks in enumerate(docs):
        for p, t in enumerate(toks):
            seq.append(("t", t))
            where.append((d, p + 1))
        seq.append(("sep", d))  # unique per doc, never equal to a token
        where.append(None)
    sa = _suffix_array(seq)
    lcp = _lcp_array(seq, sa)
    rank = {s: j for j, s in enumerate(sa)}
    cover: dict[int, set[int]] = {d: set() for d in range(len(docs))}
    for i in range(len(seq)):
        j = rank[i]
        m = max(lcp[j] if j > 0 else 0, lcp[j + 1] if j + 1 < len(seq) else 0)
        if m < n:
            continue
        # positions [i, i + m - 1] are inside a duplicated substring; clip
        # at separators (the unique separator can never extend a match, so
        # m already stops before one — assert, don't clip silently)
        for g in range(i, i + m):
            assert where[g] is not None, "match ran through a separator"
            d, p = where[g]
            cover[d].add(p)
    return cover


def _runs(posset: set[int]) -> list[tuple[int, int]]:
    """Maximal [s, e] runs of a 1-based position set."""
    runs = []
    for p in sorted(posset):
        if runs and p == runs[-1][1] + 1:
            runs[-1][1] = p
        else:
            runs.append([p, p])
    return [tuple(r) for r in runs]


def _ngram_dup_starts(docs: list[list[str]], n: int) -> dict[int, set[int]]:
    """1-based start positions of corpus-duplicated n-grams, per doc (the
    operator's n_dup_positions counts these)."""
    from collections import Counter

    c: Counter = Counter()
    for toks in docs:
        for i in range(len(toks) - n + 1):
            c[tuple(toks[i : i + n])] += 1
    out: dict[int, set[int]] = {}
    for d, toks in enumerate(docs):
        out[d] = {
            i + 1
            for i in range(len(toks) - n + 1)
            if c[tuple(toks[i : i + n])] > 1
        }
    return out


# --- the property -----------------------------------------------------------

_corpus = st.lists(
    st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=18),
    min_size=2,
    max_size=5,
)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(docs=_corpus, n=st.integers(min_value=2, max_value=3))
def test_ngram_spans_equal_suffix_array_dup_regions(spark, docs, n):
    """For every random corpus: the operator's (n_dup_positions, n_spans,
    dup_tokens) per document equal the suffix-array reference's duplicated-
    region statistics exactly."""
    rows = [(d, " ".join(toks)) for d, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_dup_positions"], r["n_spans"], r["dup_tokens"])
        for r in duplicated_ngram_spans(
            df, "text", "doc_id", n=n, wide_input=True
        ).collect()
    }

    cover = sa_dup_coverage(docs, n)
    starts = _ngram_dup_starts(docs, n)
    want = {}
    for d in range(len(docs)):
        if not cover[d]:
            continue  # operator emits rows only for docs with dup spans
        runs = _runs(cover[d])
        want[d] = (len(starts[d]), len(runs), sum(e - s + 1 for s, e in runs))

    assert got == want


def test_sa_reference_known_case(spark):
    """Deterministic anchor: a hand-checkable corpus where the dup region
    is a strict subset of both docs and spans merge across overlaps."""
    docs = [
        "x y a b c d e f x".split(),
        "q a b c d r c d e f".split(),
    ]
    cover = sa_dup_coverage(docs, 3)
    # doc0: 'a b c d' (pos 3-6) and 'c d e f' (pos 5-8) overlap → one run 3-8
    assert _runs(cover[0]) == [(3, 8)]
    # doc1: 'a b c d' at pos 2-5; 'c d e f' at pos 7-10
    assert _runs(cover[1]) == [(2, 5), (7, 10)]

    df = spark.createDataFrame(
        [(0, " ".join(docs[0])), (1, " ".join(docs[1]))],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_spans"], r["dup_tokens"])
        for r in duplicated_ngram_spans(
            df, "text", "doc_id", n=3, wide_input=True
        ).collect()
    }
    assert got == {0: (1, 6), 1: (2, 8)}
