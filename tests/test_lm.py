"""Bigram-LM perplexity scoring (CCNet shape): exact count parity vs
DuckDB, a Python reference model for the log-domain leg, ranking sanity,
and plan audits (native exprs, broadcast model joins)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from volga_spark.operators.lm import (
    UNK,
    perplexity_filter,
    score_perplexity,
    train_bigram_lm,
)
from volga_spark.oracle import compare_frames, run_oracle
from volga_spark.tables import load_table

# The same vocab-cutoff + <unk> mapping + counts, in DuckDB SQL: parallel
# unnest of the two shifted list slices zips adjacent token pairs.
BIGRAM_ORACLE = """
    WITH t AS (SELECT string_split(text, ' ') AS l FROM documents),
    raw AS (SELECT unnest(l) AS w FROM t),
    vocab AS (SELECT w FROM (SELECT w, count(*) AS c FROM raw GROUP BY w)
              WHERE c >= {min_count}),
    pairs AS (
        SELECT unnest(l[1:len(l)-1]) AS w1, unnest(l[2:len(l)]) AS w2 FROM t
    ),
    mapped AS (
        SELECT CASE WHEN w1 IN (SELECT w FROM vocab) THEN w1
                    ELSE '<unk>' END AS w1,
               CASE WHEN w2 IN (SELECT w FROM vocab) THEN w2
                    ELSE '<unk>' END AS w2
        FROM pairs
    )
    SELECT w1, w2, count(*) AS c12 FROM mapped GROUP BY w1, w2
"""


def test_bigram_counts_match_duckdb(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    lm = train_bigram_lm(docs, min_count=2)
    got = lm.bigrams.toPandas()
    oracle = run_oracle(BIGRAM_ORACLE.format(min_count=2), sf_dir)
    assert not compare_frames(got, oracle)


def test_left_context_counts_are_bigram_marginals(spark, sf_dir):
    """Sum over w2 of c12(w1, w2) must equal c1(w1) exactly — the unigram
    table is the conditional-prob denominator, derived from the same
    mapped pairs."""
    docs = load_table(spark, sf_dir, "documents")
    lm = train_bigram_lm(docs, min_count=3)
    marg = lm.bigrams.groupBy("w1").agg(F.sum("c12").alias("m"))
    bad = (
        marg.join(lm.unigrams, marg["w1"] == lm.unigrams["w"], "full")
        .filter(
            F.col("m").isNull()
            | F.col("c1").isNull()
            | (F.col("m") != F.col("c1"))
        )
        .count()
    )
    assert bad == 0


def _python_reference(train_texts, score_texts, min_count, k):
    from collections import Counter

    raw = Counter(w for t in train_texts for w in t.split(" "))
    vocab = {w for w, c in raw.items() if c >= min_count}
    vocab_size = len(vocab) + 1

    def m(w):
        return w if w in vocab else UNK

    c12, c1 = Counter(), Counter()
    for t in train_texts:
        ws = [m(w) for w in t.split(" ")]
        for a, b in zip(ws, ws[1:]):
            c12[(a, b)] += 1
            c1[a] += 1

    out = []
    for t in score_texts:
        ws = [m(w) for w in t.split(" ")]
        pairs = list(zip(ws, ws[1:]))
        if not pairs:
            out.append(None)
            continue
        h = -sum(
            math.log2((c12[(a, b)] + k) / (c1[a] + k * vocab_size))
            for a, b in pairs
        ) / len(pairs)
        out.append(h)
    return out


def test_scoring_matches_python_reference(spark):
    train = [
        "the cat sat on the mat",
        "the dog sat on the rug",
        "a cat and a dog sat",
        "the cat and the dog",
    ]
    score = [
        "the cat sat on the rug",
        "rug dog the on sat zebra",
        "single",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(train)], ["doc_id", "text"]
    )
    to_score = spark.createDataFrame(
        [(i, t) for i, t in enumerate(score)], ["doc_id", "text"]
    )
    lm = train_bigram_lm(docs, min_count=2)
    got = {
        r["doc_id"]: r["cross_entropy"]
        for r in score_perplexity(to_score, lm, k=1.0).collect()
    }
    expected = _python_reference(train, score, min_count=2, k=1.0)
    for i, h in enumerate(expected):
        if h is None:
            assert got[i] is None
        else:
            assert got[i] == pytest.approx(h, abs=1e-9), (i, got[i], h)


def test_fluent_text_scores_below_gibberish(spark, sf_dir):
    """An in-distribution document must score lower perplexity than one of
    never-seen tokens — the CCNet ranking property the gate depends on.
    (The synthetic corpus is itself near-random word soup, so permuting a
    doc barely moves its score; out-of-vocab text is the discriminable
    case.)"""
    docs = load_table(spark, sf_dir, "documents")
    lm = train_bigram_lm(docs, min_count=2)
    fluent = docs.orderBy("doc_id").limit(1).collect()[0]["text"]
    n = len(fluent.split(" "))
    gibberish = " ".join(f"zzqx{i}" for i in range(n))
    pair = spark.createDataFrame(
        [(0, fluent), (1, gibberish)], ["doc_id", "text"]
    )
    scores = {
        r["doc_id"]: r["perplexity"]
        for r in score_perplexity(pair, lm).collect()
    }
    assert scores[0] < scores[1], scores


def test_filter_keeps_only_low_perplexity(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(200)
    lm = train_bigram_lm(docs, min_count=2)
    scored = score_perplexity(docs, lm).select("doc_id", "perplexity")
    ceiling = scored.approxQuantile("perplexity", [0.5], 0.0)[0]
    kept = perplexity_filter(docs, lm, ceiling)
    assert 0 < kept.count() < 200
    assert kept.filter(F.col("perplexity") > ceiling).count() == 0


def test_scoring_plan_is_native_with_broadcast_model(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(100)
    lm = train_bigram_lm(docs, min_count=2)
    scored = score_perplexity(docs, lm)
    scored.count()
    plan = scored._jdf.queryExecution().executedPlan().toString()
    for marker in ("Python", "Pandas", "BatchEval"):
        assert marker not in plan, marker
    assert plan.count("BroadcastHashJoin") >= 3, plan[:2000]


def test_lm_scores_stream_identically(spark, sf_dir, tmp_path):
    """The map-side scorer runs unchanged on a streaming frame in append
    mode (no aggregation, no watermark needed) and matches batch — the
    one-definition-N-modes property for the perplexity gate; the
    explode/agg path is the batch-throughput twin (tolerance-compared:
    float sum order differs)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from volga_spark.streaming.runner import run_available_now_to_memory
    from volga_spark.tables import load_table as _lt

    docs = _lt(spark, sf_dir, "documents").select("doc_id", "text").limit(200)
    lm = train_bigram_lm(docs, min_count=2)

    d = str(tmp_path / "docs")
    os.makedirs(d)
    pdf = docs.toPandas()
    pq.write_table(
        pa.Table.from_pandas(pdf, preserve_index=False),
        os.path.join(d, "p0.parquet"),
    )
    from volga_spark.operators.lm import perplexity_udf

    h = perplexity_udf(lm)
    stream = spark.readStream.schema("doc_id bigint, text string").parquet(d)
    streamed = run_available_now_to_memory(
        stream.select("doc_id", h("text").alias("cross_entropy")),
        output_mode="append",
    )
    got = sorted(map(tuple, streamed.collect()))
    # bit-exact vs the SAME udf on the batch frame
    want = sorted(
        map(
            tuple,
            docs.select("doc_id", h("text").alias("cross_entropy")).collect(),
        )
    )
    assert got == want
    # and ~1e-12-relative vs the explode/agg batch path (float sum order)
    agg = {
        r["doc_id"]: r["cross_entropy"]
        for r in score_perplexity(docs, lm).collect()
    }
    for doc_id, ce in got:
        assert ce == pytest.approx(agg[doc_id], rel=1e-12)
