"""BPE tokenizer: distributed train/encode vs an independent naive reference.

The reference implementation here is the Sennrich et al. (2016) pseudocode
taken literally — full pair-count recount every round, merge replay in
learned order for encoding — deliberately a different algorithm shape from
the incremental loop in `operators/bpe.py`, so agreement pins correctness
rather than echoing the implementation.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
import pytest

from volga_spark.operators.bpe import (
    END,
    BpeModel,
    encode_bpe,
    learn_merges_from_counts,
    train_bpe,
    word_counts,
)
from volga_spark.tables import load_table

SF = "/root/testdata/sf0.001"


def naive_learn(counts: list[tuple[str, int]], num_merges: int):
    words = {w: tuple(list(w) + [END]) for w, _ in counts}
    freq = dict(counts)
    merges = []
    for _ in range(num_merges):
        pc: Counter = Counter()
        for w, syms in words.items():
            c = freq[w]
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        new = {}
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and (syms[i], syms[i + 1]) == best:
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new[w] = tuple(out)
        words = new
    return merges


def naive_encode(word: str, merges) -> list[str]:
    syms = list(word) + [END]
    for a, b in merges:
        out, i = [], 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def _pandas_word_counts() -> list[tuple[str, int]]:
    texts = pd.read_parquet(f"{SF}/documents.parquet")["text"]
    c: Counter = Counter()
    for t in texts:
        for w in str(t).split(" "):
            if w:
                c[w] += 1
    return sorted(c.items())


def test_word_counts_exact(spark):
    docs = load_table(spark, SF, "documents")
    got = {
        (r["word"], r["count"])
        for r in word_counts(docs, "text").collect()
    }
    assert got == set(_pandas_word_counts())


def test_learn_merges_matches_naive_reference():
    counts = _pandas_word_counts()
    fast, _ = learn_merges_from_counts(counts, 60)
    assert list(fast) == naive_learn(counts, 60)


def test_train_encode_parity_and_roundtrip(spark):
    docs = load_table(spark, SF, "documents").limit(50)
    model = train_bpe(docs, "text", num_merges=80)
    ref_merges = naive_learn(
        sorted(
            (r["word"], r["count"])
            for r in word_counts(docs, "text").collect()
        ),
        80,
    )
    assert list(model.merges) == ref_merges

    out = encode_bpe(docs.select("doc_id", "text"), model).collect()
    rev = {i: t for t, i in model.vocab.items()}
    for row in out:
        toks_ref = [
            t for w in row["text"].split(" ") if w for t in naive_encode(w, ref_merges)
        ]
        assert [rev[i] for i in row["bpe_ids"]] == toks_ref
        # trained on its own corpus with no cap → no unks, exact round trip
        assert -1 not in row["bpe_ids"]
        decoded = model.decode_tokens([rev[i] for i in row["bpe_ids"]])
        assert decoded == " ".join(w for w in row["text"].split(" ") if w)


def test_deterministic_across_partitionings(spark):
    docs = load_table(spark, SF, "documents")
    m1 = train_bpe(docs.repartition(1), "text", num_merges=40)
    m16 = train_bpe(docs.repartition(16), "text", num_merges=40)
    assert m1.merges == m16.merges
    assert m1.vocab == m16.vocab


def test_merges_compress(spark):
    docs = load_table(spark, SF, "documents").limit(30)
    m0 = train_bpe(docs, "text", num_merges=0)
    m200 = train_bpe(docs, "text", num_merges=200)
    n0 = sum(len(r["bpe_ids"]) for r in encode_bpe(docs, m0).collect())
    n200 = sum(len(r["bpe_ids"]) for r in encode_bpe(docs, m200).collect())
    assert n200 < n0  # merges strictly shorten the char-level stream


def test_unk_and_empty_edges(spark):
    model = train_bpe(
        spark.createDataFrame([("ab ab ba",)], "text string"), "text", num_merges=5
    )
    df = spark.createDataFrame(
        [(1, "ab zq"), (2, ""), (3, "  ")], "id long, text string"
    )
    rows = {r["id"]: r["bpe_ids"] for r in encode_bpe(df, model).collect()}
    assert rows[2] == [] and rows[3] == []
    assert -1 in rows[1]  # z/q never seen → unk id
    # known word still encodes to in-vocab ids
    known = [i for i in rows[1] if i != -1]
    assert known and all(i in set(model.vocab.values()) for i in known)


def test_encode_plan_is_map_side(spark):
    docs = load_table(spark, SF, "documents")
    model = train_bpe(docs.limit(10), "text", num_merges=10)
    plan = (
        encode_bpe(docs.select("doc_id", "text"), model)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # encoding fuses behind the scan


def test_max_words_cap_and_min_count():
    counts = [("aaaa", 100), ("bbbb", 50), ("cccc", 1)]
    merges_all, _ = learn_merges_from_counts(counts, 3)
    merges_top, _ = learn_merges_from_counts(counts[:2], 3)
    # the cap only drops tail words; head merges unchanged here
    assert merges_all[:1] == merges_top[:1]
