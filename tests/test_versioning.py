"""Snapshot diff: DuckDB full-outer-join oracle over a crafted delta of
the documents table, plus digest-only plan audit (text never shuffles)."""

from __future__ import annotations

from pyspark.sql import functions as F

from volga_spark.operators.versioning import diff_summary, snapshot_diff
from volga_spark.oracle import compare_frames, run_oracle
from volga_spark.tables import load_table

# new snapshot = documents with: ids % 10 == 0 removed, ids % 7 == 0
# modified (text doubled), 3 fresh ids added
NEW_SQL = """
    SELECT doc_id, text || ' ' || text AS text FROM documents
    WHERE doc_id % 10 <> 0 AND doc_id % 7 = 0
    UNION ALL
    SELECT doc_id, text FROM documents
    WHERE doc_id % 10 <> 0 AND doc_id % 7 <> 0
    UNION ALL
    SELECT * FROM (VALUES (1000001, 'brand new doc'),
                          (1000002, 'another new doc'),
                          (1000003, 'third new doc')) t(doc_id, text)
"""

ORACLE = f"""
    WITH new_snap AS ({NEW_SQL}),
    o AS (SELECT doc_id, md5(text) AS ofp FROM documents),
    n AS (SELECT doc_id, md5(text) AS nfp FROM new_snap)
    SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
           CASE WHEN o.ofp IS NULL THEN 'added'
                WHEN n.nfp IS NULL THEN 'removed'
                WHEN o.ofp <> n.nfp THEN 'modified'
                ELSE 'unchanged' END AS change
    FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
"""


def _new_snapshot(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    kept = docs.filter(F.col("doc_id") % 10 != 0)
    modified = kept.filter(F.col("doc_id") % 7 == 0).select(
        "doc_id", F.concat_ws(" ", "text", "text").alias("text")
    )
    unchanged = kept.filter(F.col("doc_id") % 7 != 0)
    fresh = spark.createDataFrame(
        [
            (1000001, "brand new doc"),
            (1000002, "another new doc"),
            (1000003, "third new doc"),
        ],
        ["doc_id", "text"],
    )
    return modified.union(unchanged).union(fresh)


def test_diff_matches_duckdb(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    got = snapshot_diff(docs, _new_snapshot(spark, sf_dir)).toPandas()
    oracle = run_oracle(ORACLE, sf_dir)
    assert not compare_frames(got, oracle)


def test_summary_and_classes(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    diff = snapshot_diff(docs, _new_snapshot(spark, sf_dir))
    summary = {r["change"]: r["n"] for r in diff_summary(diff).collect()}
    assert summary["added"] == 3
    n_docs = docs.count()
    assert summary["removed"] == docs.filter(F.col("doc_id") % 10 == 0).count()
    assert sum(summary.values()) == n_docs + 3


def test_diff_plan_ships_digests_not_text(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    diff = snapshot_diff(docs, _new_snapshot(spark, sf_dir))
    diff.count()
    plan = diff._jdf.queryExecution().executedPlan().toString()
    # the exchanges carry (__id, fingerprint) projections — the raw text
    # column must not appear in any exchange input
    for seg in plan.split("Exchange")[1:]:
        head = seg.split("\n")[0]
        assert "text" not in head, head


def test_schema_diff_and_breaking_changes(spark):
    from volga_spark.operators.versioning import breaking_changes, schema_diff

    old = spark.createDataFrame(
        [], "doc_id int, text string, score float, stale string"
    )
    new = spark.createDataFrame(
        [], "doc_id bigint, text string, score string, fresh string"
    )
    diff = schema_diff(old, new)
    assert diff == [
        ("doc_id", "retyped", "int", "bigint"),
        ("fresh", "added", None, "string"),
        ("score", "retyped", "float", "string"),
        ("stale", "removed", "string", None),
    ]
    breaking = breaking_changes(diff)
    # widening int->bigint is compatible; float->string and the removal break
    assert [(c, ch) for c, ch, *_ in breaking] == [
        ("score", "retyped"), ("stale", "removed")
    ]
    assert schema_diff(old, old) == []
