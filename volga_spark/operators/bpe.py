"""Byte-pair-encoding tokenizer: distributed training + distributed encoding.

The reference's text surface stops at a BPE-ish regex split
(`operators/text.py` ``tokens``); a training-data pipeline additionally
needs the real thing — learned merge rules — to produce the token ids a
model will actually train on. This module implements standard BPE
(Sennrich, Haddow & Birch 2016, "Neural Machine Translation of Rare Words
with Subword Units") decomposed for Spark:

- ``train_bpe``: the ONLY corpus-sized stage is an exact distributed word
  count (explode → groupBy — map-side partial agg, shuffle volume is
  |distinct words|, never |tokens|). The merge-learning loop then runs on
  the driver over that word-frequency table. This is not a sampling
  shortcut: Sennrich BPE is *defined* over word counts — the corpus enters
  the algorithm only through them — so learning from the full count table
  is exact. What must stay bounded at 100 TB is the table itself:
  ``min_count`` drops hapax junk and ``max_words`` keeps the top-frequency
  words (by (count DESC, word ASC), a total order); mass beyond the cap is
  rare-word tail whose pair counts are negligible by construction. This is
  the same bounded-driver-input discipline as IVF's training sample
  (`operators/similarity.py`), except here the bound loses almost nothing
  because counts concentrate.

- ``encode_bpe``: merge ranks closure-ship to executors (a few hundred KB
  for a real 32k–64k vocab); one ``mapInPandas`` pass applies the standard
  lowest-rank-pair-first merge loop per word, with an intra-batch
  word→tokens cache — natural text repeats words heavily, so the amortized
  per-token cost approaches a dict hit. No shuffle: encoding is map-side,
  fused behind whatever scan feeds it.

Determinism: pair selection tie-breaks on (count DESC, pair ASC) and token
ids are (alphabet sorted, then merge outputs in merge order), so the model
is a pure function of the word-count table — identical across partitionings
and runs, which the tests pin.
"""

from __future__ import annotations

from collections import Counter, defaultdict
from dataclasses import dataclass, field
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END = "</w>"  # end-of-word marker, part of the learned symbol space


@dataclass(frozen=True)
class BpeModel:
    """Learned merges + the token-id space they induce. Picklable; shipped
    to executors via closure (broadcast-variable semantics without the
    explicit handle — the object is immutable and a few hundred KB)."""

    merges: tuple[tuple[str, str], ...]
    alphabet: tuple[str, ...]  # initial symbols (chars + END), sorted
    vocab: dict[str, int] = field(hash=False)

    @property
    def ranks(self) -> dict[tuple[str, str], int]:
        return {pair: i for i, pair in enumerate(self.merges)}

    def encode_word(
        self, word: str, _ranks: dict | None = None
    ) -> list[str]:
        """Standard BPE encode: repeatedly merge the lowest-rank adjacent
        pair until none remains. Symbols outside the learned space stay as
        single characters (mapped to unk at the id layer)."""
        ranks = _ranks if _ranks is not None else self.ranks
        syms = list(word) + [END]
        while len(syms) > 1:
            best_rank, best_i = None, None
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_i is None:
                break
            syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        return syms

    def decode_tokens(self, toks: list[str]) -> str:
        """Inverse of encode over in-vocab text: concatenate and turn the
        end-of-word markers back into spaces."""
        return "".join(toks).replace(END, " ").rstrip(" ")


def word_counts(
    docs: DataFrame, text_col: str = "text", min_count: int = 1
) -> DataFrame:
    """Exact distributed word counts — the corpus-sized stage of BPE
    training. Shuffle carries (word, partial count) only."""
    wc = (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("count"))
    )
    if min_count > 1:
        wc = wc.filter(F.col("count") >= min_count)
    return wc


def learn_merges_from_counts(
    counts: list[tuple[str, int]], num_merges: int
) -> tuple[tuple[tuple[str, str], ...], tuple[str, ...]]:
    """The Sennrich merge loop over a word-frequency table. Incremental:
    pair counts and a pair→words index update only for words that contained
    the merged pair, so each round costs O(symbols in affected words), not
    O(table). Pure function of `counts` (order-insensitive — ties break on
    (count DESC, pair ASC))."""
    words: dict[str, list[str]] = {w: list(w) + [END] for w, _ in counts}
    freq = dict(counts)
    pair_counts: Counter = Counter()
    where: defaultdict[tuple[str, str], set[str]] = defaultdict(set)
    for w, syms in words.items():
        c = freq[w]
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            pair_counts[p] += c
            where[p].add(w)

    alphabet = tuple(sorted({s for syms in words.values() for s in syms}))
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_counts[best] < 1:
            break
        merges.append(best)
        merged = best[0] + best[1]
        for w in list(where[best]):
            syms, c = words[w], freq[w]
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pair_counts[p] -= c
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                where[p].discard(w)
            i, out = 0, []
            while i < len(syms):
                if (
                    i < len(syms) - 1
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
            for i in range(len(out) - 1):
                p = (out[i], out[i + 1])
                pair_counts[p] += c
                where[p].add(w)
    return tuple(merges), alphabet


def train_bpe(
    docs: DataFrame,
    text_col: str = "text",
    num_merges: int = 200,
    min_count: int = 1,
    max_words: int = 1 << 18,
) -> BpeModel:
    """Learn a BPE model from a corpus. One distributed exact word count,
    then the driver merge loop over the bounded frequency table (see module
    docstring for why this is exact, and what `max_words` bounds)."""
    wc = word_counts(docs, text_col, min_count)
    top = (
        wc.orderBy(F.col("count").desc(), F.col("word").asc())
        .limit(max_words)
        .collect()
    )
    counts = [(r["word"], r["count"]) for r in top]
    merges, alphabet = learn_merges_from_counts(counts, num_merges)
    vocab: dict[str, int] = {s: i for i, s in enumerate(alphabet)}
    for a, b in merges:
        tok = a + b
        if tok not in vocab:  # re-merges of equal strings can collide
            vocab[tok] = len(vocab)
    return BpeModel(merges=merges, alphabet=alphabet, vocab=vocab)


def encode_bpe(
    docs: DataFrame,
    model: BpeModel,
    text_col: str = "text",
    out_col: str = "bpe_ids",
    unk_id: int = -1,
) -> DataFrame:
    """Append `out_col`: array<int> of BPE token ids, document order
    preserved, symbols outside the learned space → ``unk_id``. Map-side
    only (one mapInPandas, no shuffle); the model rides the closure."""
    from pyspark.sql.types import ArrayType, IntegerType, StructField, StructType

    # build a fresh StructType — StructType.add mutates in place, and
    # df.schema hands back the plan's cached instance
    out_schema = StructType(
        list(docs.schema.fields)
        + [StructField(out_col, ArrayType(IntegerType()))]
    )
    merges, vocab = model.merges, dict(model.vocab)
    alphabet = model.alphabet

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        m = BpeModel(merges=merges, alphabet=alphabet, vocab=vocab)
        ranks = m.ranks
        cache: dict[str, list[int]] = {}

        def enc(text: str) -> list[int]:
            ids: list[int] = []
            for w in text.split(" "):
                if not w:
                    continue
                hit = cache.get(w)
                if hit is None:
                    hit = [
                        vocab.get(t, unk_id) for t in m.encode_word(w, ranks)
                    ]
                    cache[w] = hit
                ids.extend(hit)
            return ids

        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = pdf[text_col].map(enc)
            yield pdf

    return docs.mapInPandas(gen, schema=out_schema)
