"""KMV bottom-k sketches: DuckDB parity, merge closure, estimator bounds.

The sketch is an exact function of the corpus (k smallest distinct md5
strings) and every estimator is integer arithmetic — so unlike most
"approximate" operators these tests compare EXACT frames against DuckDB,
plus statistical bounds on the estimates against known ground truth.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from volga_spark.operators.overlap import (
    kmv_distinct_estimate,
    kmv_merge,
    kmv_overlap,
    kmv_sketch,
)
from volga_spark.oracle import compare_frames, run_oracle
from volga_spark.tables import load_table

SF = "/root/testdata/sf0.001"


def test_sketch_matches_duckdb_bottom_k(spark):
    got = kmv_sketch(load_table(spark, SF, "documents"), "text", k=64).toPandas()
    want = run_oracle(
        """
        SELECT h, CAST(row_number() OVER (ORDER BY h) AS INT) AS rank
        FROM (SELECT DISTINCT md5(text) AS h FROM documents)
        ORDER BY h LIMIT 64
        """,
        SF,
    )
    assert compare_frames(got, want) == []


def test_partitioning_invariance(spark):
    """Bottom-k of distinct hashes doesn't depend on row placement — the
    partial-sketch plan is deterministic under ANY repartitioning (stronger
    than SpaceSaving, whose evictions are placement-sensitive)."""
    d = load_table(spark, SF, "documents")
    a = kmv_sketch(d.repartition(2), "text", k=32).collect()
    b = kmv_sketch(d.repartition(13, "doc_id"), "text", k=32).collect()
    assert a == b


def test_merge_closure(spark):
    """bottom-k(merge(sk(A), sk(B))) == sk(A u B) EXACTLY — the property
    that lets yesterday's persisted sketch join tomorrow's corpus."""
    d = load_table(spark, SF, "documents")
    a = d.filter(F.col("doc_id") % 2 == 0)
    b = d.filter(F.col("doc_id") % 2 == 1)
    merged = kmv_merge(
        kmv_sketch(a, "text", k=48), kmv_sketch(b, "text", k=48), k=48
    ).collect()
    direct = kmv_sketch(d, "text", k=48).collect()
    assert merged == direct


def test_sketch_by_equals_per_side(spark):
    """One-pass multi-corpus sketching == N independent sketches."""
    from volga_spark.operators.overlap import kmv_sketch_by

    d = load_table(spark, SF, "documents")
    combined = kmv_sketch_by(d, "text", F.col("doc_id") % 3, k=24)
    for s in ("0", "1", "2"):
        got = [
            (r["h"], r["rank"])
            for r in combined.filter(F.col("side") == s)
            .select("h", "rank")
            .collect()
        ]
        want = [
            (r["h"], r["rank"])
            for r in kmv_sketch(
                d.filter(F.col("doc_id") % 3 == int(s)), "text", k=24
            ).collect()
        ]
        assert got == want, s


def test_underfull_sketch_is_exact(spark):
    df = spark.createDataFrame([(f"v{i % 7}",) for i in range(100)], "t string")
    sk = kmv_sketch(df, "t", k=128)
    est = kmv_distinct_estimate(sk, k=128).collect()[0]
    assert est["n_sketch"] == 7
    assert est["est"] == 7  # under-full -> exact count, no estimation


def test_distinct_estimate_bound(spark):
    n = 5000
    df = spark.range(n).select(F.col("id").cast("string").alias("t"))
    est = kmv_distinct_estimate(kmv_sketch(df, "t", k=128), k=128).collect()[0]
    # KMV relative error ~1/sqrt(k-2) ~ 9%; allow 4 sigma
    assert abs(est["est"] / n - 1.0) < 0.36, est["est"]


def test_overlap_estimator_known_truth(spark):
    # A = [0, 4000), B = [2000, 6000): |A n B| = 2000, J = 1/3
    a = spark.range(0, 4000).select(F.col("id").cast("string").alias("t"))
    b = spark.range(2000, 6000).select(F.col("id").cast("string").alias("t"))
    k = 256
    row = kmv_overlap(
        kmv_sketch(a, "t", k=k), kmv_sketch(b, "t", k=k), k=k
    ).collect()[0]
    assert row["n_union"] == k
    assert abs(row["x"] / k - 1 / 3) < 0.12  # ~4/sqrt(k)
    assert abs(row["est_union"] / 6000 - 1.0) < 0.25
    assert abs(row["est_intersection"] / 2000 - 1.0) < 0.45


def test_overlap_disjoint_and_identical(spark):
    a = spark.range(0, 3000).select(F.col("id").cast("string").alias("t"))
    b = spark.range(3000, 6000).select(F.col("id").cast("string").alias("t"))
    k = 64
    ska, skb = kmv_sketch(a, "t", k=k), kmv_sketch(b, "t", k=k)
    disjoint = kmv_overlap(ska, skb, k=k).collect()[0]
    assert disjoint["x"] == 0 and disjoint["est_intersection"] == 0
    same = kmv_overlap(ska, ska, k=k).collect()[0]
    assert same["x"] == k  # J = 1 -> every union-sketch member in both


def test_stream_equals_batch(spark, tmp_path):
    """Streamed sketch (micro-batched fold) == the batch sketch of the same
    rows — the union-closure property carried into the state handler."""
    from volga_spark.operators.overlap import kmv_stream_maintain
    from volga_spark.streaming import run_available_now_to_memory

    d = load_table(spark, SF, "documents").select("doc_id", "text")
    want = [(r["h"], r["rank"]) for r in kmv_sketch(d, "text", k=40).collect()]
    src = str(tmp_path / "kmv_src")
    for b in range(3):
        d.filter(F.col("doc_id") % 3 == b).coalesce(1).write.mode(
            "append" if b else "overwrite"
        ).parquet(src)
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    res = run_available_now_to_memory(
        kmv_stream_maintain(stream, "text", k=40), output_mode="update"
    ).toPandas()
    assert res["version"].max() >= 2  # fold genuinely crossed batches
    last = res[res["version"] == res["version"].max()].sort_values("rank")
    assert [(h, int(r)) for h, r in zip(last["h"], last["rank"])] == want


def test_overlap_pipeline_duckdb_parity(spark):
    """The full sketch->overlap pipeline against a DuckDB twin, EXACT frame
    match including the integer estimators — the driver-oracle shape."""
    d = load_table(spark, SF, "documents")
    k = 32
    a = d.filter(F.col("doc_id") % 2 == 0)
    b = d.filter(F.col("doc_id") % 2 == 1)
    got = kmv_overlap(
        kmv_sketch(a, "text", k=k), kmv_sketch(b, "text", k=k), k=k
    ).toPandas()
    want = run_oracle(
        f"""
        WITH ka AS (
            SELECT h FROM (SELECT DISTINCT md5(text) AS h FROM documents
                           WHERE doc_id % 2 = 0) ORDER BY h LIMIT {k}
        ),
        kb AS (
            SELECT h FROM (SELECT DISTINCT md5(text) AS h FROM documents
                           WHERE doc_id % 2 = 1) ORDER BY h LIMIT {k}
        ),
        ku AS (
            SELECT h FROM (SELECT h FROM ka UNION SELECT h FROM kb)
            ORDER BY h LIMIT {k}
        ),
        agg AS (
            SELECT CAST(sum(CASE WHEN h IN (SELECT h FROM ka)
                                  AND h IN (SELECT h FROM kb)
                             THEN 1 ELSE 0 END) AS BIGINT) AS x,
                   CAST(count(*) AS INT) AS n_union,
                   max(CAST(('0x' || substr(h, 1, 15)) AS BIGINT)) AS vk
            FROM ku
        )
        SELECT x, n_union, vk,
               CASE WHEN n_union < {k} THEN CAST(n_union AS BIGINT)
                    ELSE CAST(({k} - 1) * CAST({2 ** 33} AS BIGINT)
                              // greatest(1, vk // {2 ** 27}) AS BIGINT)
               END AS est_union,
               CAST(x * (CASE WHEN n_union < {k} THEN CAST(n_union AS BIGINT)
                         ELSE CAST(({k} - 1) * CAST({2 ** 33} AS BIGINT)
                                   // greatest(1, vk // {2 ** 27}) AS BIGINT) END)
                    // (CASE WHEN n_union = 0 THEN 1
                        WHEN n_union < {k} THEN n_union
                        ELSE {k} END) AS BIGINT) AS est_intersection
        FROM agg
        """,
        SF,
    )
    assert compare_frames(got, want) == []


def test_estimate_denominator_clamped_at_tiny_vk(spark):
    """ADVICE r07: a full sketch whose kth hash prefix is < 2^27 (the
    > ~5e11-distinct regime at k=128) must not divide by zero — the
    denominator is clamped to 1, capping (not corrupting) the estimate."""
    k = 16
    # 16 distinct synthetic "md5" strings whose 15-hex-char prefix is tiny:
    # 8 leading zeros then a 7-hex counter < 0x10 << 2^27.
    rows = [("0" * 8 + format(i, "07x") + "f" * 17,) for i in range(k)]
    sk = spark.createDataFrame(rows, "h string")
    est = kmv_distinct_estimate(sk, k=k).collect()[0]
    assert est["n_sketch"] == k and est["vk"] < 2**27
    assert est["est"] is not None and est["est"] > 0  # no NULL, no crash
    # the clamp makes this the ceiling value (k-1) * 2^33
    assert est["est"] == (k - 1) * 2**33
