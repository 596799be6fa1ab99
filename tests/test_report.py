"""Corpus report: the whole dataset-card aggregation hash-matches DuckDB
(counts, exact distincts, and single-division rates only — the report's
determinism discipline), plus a grouping/global sanity check."""

from __future__ import annotations

from pyspark.sql import functions as F

from volga_spark.operators.report import corpus_report
from volga_spark.oracle import compare_frames, run_oracle
from volga_spark.tables import load_table

# the same 7 Gopher rules the Spark expressions implement, in DuckDB SQL
_GP = """
    (n >= 50 AND n <= 100000)
    AND ((length(text) - (n - 1)) / n >= 3
         AND (length(text) - (n - 1)) / n <= 10)
    AND (((length(text) - length(replace(text, '#', '')))
          + (length(text) - length(replace(text, '...', ''))) / 3.0)
         / n <= 0.1)
    AND (len(list_filter(string_split(text, chr(10)),
             l -> l LIKE '-%' OR l LIKE '*%' OR l LIKE '•%'))
         / len(string_split(text, chr(10))) <= 0.9)
    AND (len(list_filter(string_split(text, chr(10)), l -> l LIKE '%...'))
         / len(string_split(text, chr(10))) <= 0.3)
    AND (len(list_filter(string_split(text, ' '),
             t -> regexp_matches(t, '[A-Za-z]'))) / n >= 0.8)
    AND (len(list_filter(['the','be','to','of','and','that','have','with'],
             w -> list_contains(string_split(text, ' '), w))) >= 2)
"""

ORACLE = f"""
    WITH per AS (
        SELECT source, lang, text,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
               md5(text) AS fp,
               md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nfp,
               CASE WHEN {_GP} THEN 1 ELSE 0 END AS gp
        FROM documents
    )
    SELECT source, lang,
           count(*) AS n_docs,
           CAST(sum(n) AS BIGINT) AS n_tokens,
           CAST(sum(n) AS BIGINT) / count(*) AS avg_tokens,
           count(DISTINCT fp) AS distinct_docs,
           count(DISTINCT nfp) AS distinct_norm_docs,
           1.0 - count(DISTINCT fp) / count(*) AS exact_dup_rate,
           CAST(sum(gp) AS BIGINT) / count(*) AS gopher_pass_rate
    FROM per GROUP BY source, lang
"""


def test_report_matches_duckdb(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    got = corpus_report(docs, group_by=["source", "lang"]).toPandas()
    oracle = run_oracle(ORACLE, sf_dir)
    assert not compare_frames(got, oracle)


def test_global_report_consistent_with_grouped(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    grouped = corpus_report(docs, group_by=["source"])
    glob = corpus_report(docs).collect()[0]
    sums = grouped.agg(
        F.sum("n_docs").alias("d"), F.sum("n_tokens").alias("t")
    ).first()
    assert glob["n_docs"] == sums["d"]
    assert glob["n_tokens"] == sums["t"]
    assert 0.0 <= glob["exact_dup_rate"] <= 1.0
    assert 0.0 <= glob["gopher_pass_rate"] <= 1.0
    # distinct counts can only shrink when groups merge
    assert glob["distinct_docs"] <= sums["d"]


SKEW_ORACLE = """
    WITH counts AS (
        SELECT event_type, count(*) AS n FROM events GROUP BY event_type
    ),
    tot AS (SELECT count(*) AS t FROM events)
    SELECT event_type, n, n / (SELECT t FROM tot) AS share
    FROM counts ORDER BY n DESC, event_type ASC LIMIT 3
"""


def test_skew_report_matches_duckdb(spark, sf_dir):
    from volga_spark.operators.report import skew_report

    ev = load_table(spark, sf_dir, "events")
    got = skew_report(ev, ["event_type"], top_k=3).toPandas()
    oracle = run_oracle(SKEW_ORACLE, sf_dir)
    assert not compare_frames(got, oracle)


def test_skew_report_flags_injected_hot_key(spark, sf_dir):
    from volga_spark.operators.report import skew_report

    ev = load_table(spark, sf_dir, "events").select("user_id")
    hot = spark.range(ev.count() * 2).select(F.lit(-1).alias("user_id"))
    skewed = ev.union(hot)
    top = skew_report(skewed, ["user_id"], top_k=1).first()
    assert top["user_id"] == -1
    assert top["share"] > 0.6
