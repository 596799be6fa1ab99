"""Delete propagation: scrubs hash-match DuckDB anti-join oracles, the
array-provenance cascade (both strategies) agrees with an unnest oracle,
the scrub plan is a broadcast anti-join (corpus never shuffles), and the
audit check reports zero survivors."""

from __future__ import annotations

from pyspark.sql import functions as F

import volga_spark.operators.forget as forget_mod
from volga_spark.operators.forget import (
    forget_report,
    scrub_corpus,
    scrub_derived,
    verify_forgotten,
)
from volga_spark.oracle import compare_frames, run_oracle
from volga_spark.tables import load_table


def _tombstones(spark, sf_dir):
    # every 37th doc is tombstoned — a small list vs the corpus, like real
    # takedown batches
    return load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 37 == 0
    ).select("doc_id", "text")


def test_scrub_by_id_matches_duckdb(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    got = scrub_corpus(docs, _tombstones(spark, sf_dir)).select(
        "doc_id", "source"
    ).toPandas()
    oracle = run_oracle(
        """
        SELECT doc_id, source FROM documents
        WHERE doc_id NOT IN (SELECT doc_id FROM documents WHERE doc_id % 37 = 0)
        """,
        sf_dir,
    )
    assert not compare_frames(got, oracle)


def test_scrub_by_content_catches_copies(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # re-crawl one tombstoned doc's text under a fresh id: id-mode misses
    # it, content-mode removes it
    tomb = docs.filter(F.col("doc_id") == 0)
    assert tomb.count() == 1
    copy = tomb.select(
        (F.lit(10_000_000)).alias("doc_id"), F.col("text")
    )
    corpus = docs.unionByName(copy)
    by_id = scrub_corpus(corpus, tomb, by_id=True, by_content=False)
    assert by_id.filter(F.col("doc_id") == 10_000_000).count() == 1
    by_both = scrub_corpus(corpus, tomb, by_id=True, by_content=True)
    assert by_both.filter(F.col("doc_id") == 10_000_000).count() == 0
    assert verify_forgotten(by_both, tomb) == 0


def test_scalar_cascade_matches_duckdb(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    from volga_spark.operators.chunking import chunk_documents, chunk_oracle_sql

    chunks = chunk_documents(docs, chunk_tokens=32, overlap=8)
    got = scrub_derived(chunks, _tombstones(spark, sf_dir)).toPandas()
    oracle = run_oracle(
        f"SELECT * FROM ({chunk_oracle_sql(chunk_tokens=32, overlap=8)}) "
        f"WHERE doc_id % 37 <> 0",
        sf_dir,
    )
    assert not compare_frames(got, oracle)


def test_array_cascade_both_strategies_agree(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(500)
    seqs = docs.groupBy((F.col("doc_id") % 50).alias("g")).agg(
        F.collect_list("doc_id").alias("doc_ids")
    )
    tomb = _tombstones(spark, sf_dir)
    small = scrub_derived(seqs, tomb, provenance_col="doc_ids")
    old = forget_mod.LITERAL_CUTOVER
    forget_mod.LITERAL_CUTOVER = 0  # force the explode path
    try:
        large = scrub_derived(seqs, tomb, provenance_col="doc_ids")
    finally:
        forget_mod.LITERAL_CUTOVER = old
    a = sorted(r["g"] for r in small.collect())
    b = sorted(r["g"] for r in large.collect())
    assert a == b
    # and no surviving sequence references a tombstoned doc
    tomb_ids = {r["doc_id"] for r in tomb.collect()}
    for r in small.collect():
        assert not (set(r["doc_ids"]) & tomb_ids)


def test_scrub_plan_is_broadcast_anti_join(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    plan = scrub_corpus(
        docs, _tombstones(spark, sf_dir)
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    # corpus side must not exchange: its FileScan is a DIRECT child of the
    # join (the ":- FileScan" branch). The one allowed hash exchange is the
    # tombstone-side distinct — bounded by the tombstone list, not the
    # corpus — feeding the BroadcastExchange.
    assert ":- FileScan parquet" in plan
    assert plan.count("Exchange hashpartitioning") <= 1
    assert plan.count("BroadcastExchange") == 1


def test_forget_report_counts(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    tomb = _tombstones(spark, sf_dir)
    after = scrub_corpus(docs, tomb)
    rep = {r["table"]: r for r in forget_report(
        {"documents": (docs, after)}
    ).collect()}
    r = rep["documents"]
    assert r["rows_removed"] == tomb.count()
    assert r["rows_before"] == r["rows_kept"] + r["rows_removed"]
