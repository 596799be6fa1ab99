"""Corpus-trained n-gram language-model perplexity scoring (CCNet shape).

CCNet (Wenzek et al. 2020, "CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data") ranks and filters web documents by the
perplexity of an n-gram LM trained on a clean reference corpus — the
standard "does this read like real text" gate between heuristic quality
rules and model-based classifiers in large-scale training-data pipelines.

This is the Spark-native version with a bigram model (this image has no
KenLM; the *distributed shape* — counts as DataFrames, scoring as joins —
is the point and is identical for any n):

- **train** (`train_bigram_lm`): vocabulary by unigram frequency cutoff
  (everything rarer folds into ``<unk>``), then mapped unigram + bigram
  counts via explode → groupBy. All exact integers; map-side partial
  aggregation makes shuffle volume ~|vocab²-observed|, not |tokens|.
- **score** (`score_perplexity`): explode each document's bigrams, map
  both sides through the vocab, join the count tables, add-k smoothed
  conditional probability, per-document mean negative log2-prob and
  perplexity 2^H. With a frequency-capped vocab the whole model
  broadcasts, so scoring is map-side only — zero shuffle per scored
  document at any corpus size; the per-doc reduce is one keyed agg.

Scale rules (100 TB corpus, 1000 executors):
- ``min_count`` bounds the model: the vocab (hence the bigram table) stops
  growing with corpus size once rare tokens fold to <unk>; a 100k-word
  vocab's observed-bigram table is tens of MB — broadcastable.
- If the model outgrows the broadcast threshold, drop ``broadcast_model=
  False`` to shuffle-join on the gram key instead (same plan shape as any
  fact⋈dim beyond broadcast size).
- Training is two groupBys over exploded tokens — the same partial-agg
  discipline as every exact count here (asserted in tests).

The reference engine has no text tier at all; this module extends the
beyond-reference training-data surface (BASELINE north star). No reference
file corresponds.
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

UNK = "<unk>"


@dataclass
class BigramLM:
    """A trained bigram model: exact token counts over the mapped corpus.

    ``unigrams``: (w, c1) — count of w as a bigram LEFT context (i.e. over
    all non-final token positions), which is the correct conditional-prob
    denominator. ``bigrams``: (w1, w2, c12). ``vocab``: (w,) the kept
    words; everything else maps to <unk>. ``vocab_size`` counts <unk> and
    is the smoothing V.
    """

    vocab: DataFrame
    unigrams: DataFrame
    bigrams: DataFrame
    vocab_size: int


def _tokens(text_col: str | Column) -> Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.split(c, " ")


def _bigram_pairs(text_col: str | Column) -> Column:
    """array<struct<w1,w2>> of adjacent token pairs, [] for 1-token docs."""
    t = _tokens(text_col)
    return F.arrays_zip(
        F.slice(t, 1, F.greatest(F.size(t) - 1, F.lit(0))).alias("w1"),
        F.slice(t, 2, F.greatest(F.size(t) - 1, F.lit(0))).alias("w2"),
    )


def _map_unk(df: DataFrame, col: str, vocab: DataFrame) -> DataFrame:
    """Replace out-of-vocab values of `col` with <unk> via a broadcast
    left join (the vocab is frequency-capped, so it always broadcasts)."""
    v = F.broadcast(vocab.withColumnRenamed("w", f"__v_{col}"))
    return df.join(
        v, df[col] == v[f"__v_{col}"], "left"
    ).withColumn(
        col, F.coalesce(F.col(f"__v_{col}"), F.lit(UNK))
    ).drop(f"__v_{col}")


def train_bigram_lm(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 2,
) -> BigramLM:
    """Train on a reference corpus: vocab cutoff, then mapped counts.

    Two passes (both single-shuffle groupBys over exploded tokens):
    1. raw unigram counts → vocab = words with count ≥ min_count;
    2. bigram pairs with both sides mapped through the vocab → (w1,w2,c12),
       and left-context counts (w1,c1) derived from the SAME mapped pairs,
       so Σ_w2 c12(w1,w2) == c1(w1) exactly (the invariant tests pin).
    """
    toks = docs.select(F.explode(_tokens(text_col)).alias("w"))
    raw_counts = toks.groupBy("w").agg(F.count("*").alias("c"))
    vocab = raw_counts.filter(F.col("c") >= min_count).select("w")
    vocab_size = vocab.count() + 1  # + <unk>

    pairs = docs.select(F.explode(_bigram_pairs(text_col)).alias("p")).select(
        F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )
    pairs = _map_unk(_map_unk(pairs, "w1", vocab), "w2", vocab)
    bigrams = pairs.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    unigrams = pairs.groupBy("w1").agg(F.count("*").alias("c1")).withColumnRenamed(
        "w1", "w"
    )
    return BigramLM(
        vocab=vocab, unigrams=unigrams, bigrams=bigrams, vocab_size=vocab_size
    )


def score_perplexity(
    docs: DataFrame,
    lm: BigramLM,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: float = 1.0,
    broadcast_model: bool = True,
) -> DataFrame:
    """Per-document add-k bigram cross-entropy and perplexity.

    For each adjacent pair (w1, w2) after <unk> mapping:
        P(w2|w1) = (c12 + k) / (c1 + k·V)
    H(doc) = -(1/N) Σ log2 P  (N = bigram count); perplexity = 2^H.
    Documents with < 2 tokens get null H/perplexity (no bigrams to score).

    All arithmetic is native Column expressions; with ``broadcast_model``
    the three model joins are broadcasts, so the scan → score path is one
    map-side stage followed by the per-doc aggregation.
    """
    b = F.broadcast if broadcast_model else (lambda d: d)
    exploded = docs.select(
        F.col(id_col), F.explode(_bigram_pairs(text_col)).alias("p")
    ).select(id_col, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    mapped = _map_unk(_map_unk(exploded, "w1", lm.vocab), "w2", lm.vocab)

    big = b(lm.bigrams)
    uni = b(lm.unigrams.withColumnRenamed("w", "__uw"))
    joined = (
        mapped.join(big, ["w1", "w2"], "left")
        .join(uni, mapped["w1"] == F.col("__uw"), "left")
        .select(
            id_col,
            F.coalesce(F.col("c12"), F.lit(0)).alias("c12"),
            F.coalesce(F.col("c1"), F.lit(0)).alias("c1"),
        )
    )
    logp = F.log2(
        (F.col("c12") + F.lit(float(k)))
        / (F.col("c1") + F.lit(float(k) * lm.vocab_size))
    )
    scored = joined.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"),
        (-F.avg(logp)).alias("cross_entropy"),
    )
    out = docs.join(scored, id_col, "left")
    return out.withColumn(
        "perplexity", F.pow(F.lit(2.0), F.col("cross_entropy"))
    )


def perplexity_filter(
    docs: DataFrame,
    lm: BigramLM,
    max_perplexity: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: float = 1.0,
) -> DataFrame:
    """CCNet's keep rule: documents at or under the perplexity ceiling
    (CCNet uses the per-language ceiling between its head/middle tercile;
    pick the ceiling from `score_perplexity` quantiles the same way).
    Unscoreable (<2 token) docs are dropped — no evidence they are text."""
    scored = score_perplexity(docs, lm, text_col=text_col, id_col=id_col, k=k)
    return scored.filter(F.col("perplexity") <= F.lit(float(max_perplexity)))


def perplexity_udf(lm: BigramLM, k: float = 1.0):
    """Map-side per-document scorer: `text -> cross_entropy` as an
    Arrow-batched pandas UDF with the model dictionaries in the task
    closure.

    The explode/agg path above is the batch-throughput shape; this one is
    for contexts that cannot re-aggregate per document — streaming append
    mode (a streaming groupBy would demand watermark semantics the
    score doesn't need) and request-mode point scoring. The closure ships
    the same frequency-capped model the broadcast join does (`min_count`
    bounds it), so executor memory is vocab-bounded, not corpus-bounded.

    Exactness: python sums the per-bigram log2 terms in document order,
    the explode/agg path in shuffle order — float addition reorders, so
    the two paths agree to ~1e-12 relative, not bit-exact (the pytest pins
    the tolerance; the STREAM vs BATCH parity of THIS udf is bit-exact).
    """
    from pyspark.sql.functions import pandas_udf

    vocab = {r["w"] for r in lm.vocab.collect()}
    c12 = {
        (r["w1"], r["w2"]): r["c12"] for r in lm.bigrams.collect()
    }
    c1 = {r["w"]: r["c1"] for r in lm.unigrams.collect()}
    v = float(lm.vocab_size)
    kk = float(k)

    @pandas_udf("double")
    def h(texts: pd.Series) -> pd.Series:
        import math

        out = []
        for t in texts:
            ws = [w if w in vocab else UNK for w in t.split(" ")]
            pairs = list(zip(ws, ws[1:]))
            if not pairs:
                out.append(None)
                continue
            s = 0.0
            for a, b in pairs:
                s += math.log2(
                    (c12.get((a, b), 0) + kk) / (c1.get(a, 0) + kk * v)
                )
            out.append(-s / len(pairs))
        return pd.Series(out, dtype="float64")

    return h
