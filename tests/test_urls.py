"""URL extraction/canonicalization parity vs DuckDB + blocklist semantics.

URLs are injected deterministically (identical SQL on both engines), same
discipline as tests/test_pii.py: the comparison verifies the extraction
expressions, not the injection.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from volga_spark.operators.urls import (
    blocklisted_expr,
    canonical_url,
    extract_hosts,
    first_host,
    flag_blocklisted,
    url_oracle_exprs,
)
from volga_spark.oracle import compare_frames, run_oracle
from volga_spark.tables import load_table

_SPARK_INJECT = (
    "concat(substring(text, 1, 30),"
    " CASE WHEN doc_id % 2 = 0 THEN concat(' https://www.Site', CAST(doc_id % 7 AS STRING),"
    "   '.example.com/p/', CAST(doc_id AS STRING), '/') ELSE '' END,"
    " CASE WHEN doc_id % 3 = 0 THEN concat(' http://cdn', CAST(doc_id % 5 AS STRING),"
    "   '.example.net/x#frag') ELSE '' END)"
)
_DUCK_INJECT = (
    "concat(substring(text, 1, 30),"
    " CASE WHEN doc_id % 2 = 0 THEN concat(' https://www.Site', CAST(doc_id % 7 AS VARCHAR),"
    "   '.example.com/p/', CAST(doc_id AS VARCHAR), '/') ELSE '' END,"
    " CASE WHEN doc_id % 3 = 0 THEN concat(' http://cdn', CAST(doc_id % 5 AS VARCHAR),"
    "   '.example.net/x#frag') ELSE '' END)"
)


def _seeded(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", F.expr(_SPARK_INJECT).alias("text"))


def test_url_extraction_matches_duckdb(spark, sf_dir):
    got = (
        _seeded(spark, sf_dir)
        .select(
            "doc_id",
            first_host("text").alias("first_host"),
            extract_hosts("text").alias("hosts"),
        )
        .toPandas()
    )
    ex = url_oracle_exprs("text")
    oracle = run_oracle(
        f"""
        WITH seeded AS (SELECT doc_id, {_DUCK_INJECT} AS text FROM documents)
        SELECT doc_id, {ex['first_host']} AS first_host, {ex['hosts']} AS hosts
        FROM seeded
        """,
        sf_dir,
    )
    assert got["first_host"].str.contains("example.com").any()
    problems = compare_frames(got, oracle)
    assert not problems, "; ".join(problems)


def test_canonical_url_normalizes(spark):
    rows = [
        ("HTTP://WWW.Example.com/a/b/",),
        ("https://example.com/a/b",),
        ("http://example.com/a/b#sec",),
    ]
    df = spark.createDataFrame(rows, "u string")
    # The scheme/host chain lowercases the prefix; mixed-case hosts beyond
    # simple prefixes are handled by extract_hosts (already lowercased).
    out = [r[0] for r in df.select(canonical_url("u")).collect()]
    assert out[1] == "https://example.com/a/b"
    assert out[2] == "https://example.com/a/b"


def test_blocklist_join_and_expr_agree(spark, sf_dir):
    seeded = _seeded(spark, sf_dir)
    domains = ("site1.example.com", "cdn2.example.net")
    joined = flag_blocklisted(seeded, domains).select("doc_id", "blocklisted")
    exprd = seeded.select(
        "doc_id", blocklisted_expr("text", domains).alias("blocklisted")
    )
    j = {r["doc_id"]: r["blocklisted"] for r in joined.collect()}
    e = {r["doc_id"]: r["blocklisted"] for r in exprd.collect()}
    assert j == e
    assert any(j.values()) and not all(j.values())


def test_blocklist_join_is_broadcast(spark, sf_dir):
    seeded = _seeded(spark, sf_dir)
    plan = (
        flag_blocklisted(seeded, ("a.example.com",))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
