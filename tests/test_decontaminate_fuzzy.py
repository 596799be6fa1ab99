"""Fuzzy (containment-rule) decontamination vs DuckDB mirror + crafted leaks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from volga_spark.operators.dedup import decontaminate, decontaminate_fuzzy
from volga_spark.oracle import compare_frames, run_oracle
from volga_spark.tables import load_table

SF = "/root/testdata/sf0.01"

# benchmark derived from the corpus itself (tokens 11..20 of the first five
# docs) so the ENTIRE pipeline — benchmark construction included — can be
# mirrored in one DuckDB statement over the same parquet
_ORACLE = """
    WITH bench AS (
        SELECT doc_id AS bid,
               array_to_string((string_split(text, ' '))[11:20], ' ') AS btext
        FROM documents WHERE doc_id <= 5
    ),
    bw AS (SELECT bid, string_split(btext, ' ') AS w FROM bench),
    bgp AS (
        SELECT bid, w, unnest(generate_series(1, len(w) - 2)) AS pos
        FROM bw WHERE len(w) >= 3
    ),
    bgrams AS (
        SELECT DISTINCT bid, array_to_string(w[pos:pos+2], ' ') AS gram FROM bgp
    ),
    bsize AS (SELECT bid, count(*) AS bn FROM bgrams GROUP BY bid),
    cw AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    cgp AS (
        SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS pos
        FROM cw WHERE len(w) >= 3
    ),
    cgrams AS (
        SELECT DISTINCT doc_id, array_to_string(w[pos:pos+2], ' ') AS gram FROM cgp
    ),
    hits AS (
        SELECT c.doc_id, b.bid, count(*) AS matches
        FROM cgrams c JOIN bgrams b USING (gram) GROUP BY 1, 2
    ),
    best AS (
        SELECT h.doc_id, max(h.matches * 1.0 / s.bn) AS best_containment
        FROM hits h JOIN bsize s USING (bid)
        WHERE h.matches * 1.0 / s.bn >= 0.6
        GROUP BY h.doc_id
    )
    SELECT d.doc_id,
           coalesce(b.best_containment, 0.0) AS best_containment,
           (b.doc_id IS NOT NULL) AS contaminated
    FROM (SELECT doc_id FROM documents) d LEFT JOIN best b USING (doc_id)
"""


def test_matches_duckdb_oracle(spark):
    docs = load_table(spark, SF, "documents")
    toks = F.split(F.col("text"), " ")
    bench = docs.filter(F.col("doc_id") <= 5).select(
        "doc_id", F.concat_ws(" ", F.slice(toks, 11, 10)).alias("q")
    )
    got = decontaminate_fuzzy(
        docs, bench, bench_text_col="q", bench_id_col="doc_id", n=3, threshold=0.6
    ).select("doc_id", "best_containment", "contaminated")
    want = run_oracle(_ORACLE, SF)
    assert compare_frames(got.toPandas(), want) == []
    # the five source docs contain their own slice verbatim → containment 1.0
    flagged = {r["doc_id"]: r["best_containment"] for r in got.collect() if r["contaminated"]}
    assert all(flagged.get(i) == 1.0 for i in range(1, 6))


def _leak_corpus(spark):
    question = "what is the capital of the small island nation of palau in oceania today"
    edited = question.replace("capital", "currency")  # one-token edit
    noise_a = "alpha beta gamma delta epsilon zeta eta theta"
    noise_b = "iota kappa lambda mu nu xi omicron pi"
    corpus = spark.createDataFrame(
        [
            (1, f"{noise_a} {edited} {noise_b}"),
            (2, f"{noise_a} {noise_b}"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(100, question)], "qid long, q string")
    return corpus, bench


def test_one_token_edit_caught_by_fuzzy_missed_by_exact(spark):
    corpus, bench = _leak_corpus(spark)
    fuzzy = {
        r["doc_id"]: r
        for r in decontaminate_fuzzy(
            corpus, bench, bench_text_col="q", bench_id_col="qid", n=5, threshold=0.6
        ).collect()
    }
    # 14-token question, edit at token 3: 5-grams avoiding it = 10 - 5 = ...
    # exact check below; the point is it clears 0.6 but is < 1.0
    assert fuzzy[1]["contaminated"] and 0.6 <= fuzzy[1]["best_containment"] < 1.0
    assert not fuzzy[2]["contaminated"]

    exact = {
        r["doc_id"]: r["contaminated"]
        for r in decontaminate(
            corpus, bench, bench_text_col="q", n=13
        ).collect()
    }
    # every verbatim 13-gram of the 14-token question spans the edited token
    assert not exact[1]  # the exact rule misses this leak entirely
    assert not exact[2]


def test_benchmark_side_broadcasts(spark):
    corpus, bench = _leak_corpus(spark)
    df = decontaminate_fuzzy(
        corpus, bench, bench_text_col="q", bench_id_col="qid", n=5, threshold=0.6
    )
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 2  # gram probe + size join
