"""Datagen source workload (reference DatagenSourceConfig parity) + approx
sketches. The generator is closed-form arithmetic, so the oracle regenerates
identical rows in DuckDB and the whole pipeline (generate → window agg) sits
in the exact-match gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from volga_spark.sources.datagen import DatagenSpec, FieldSpec, duck_generate_sql, generate
from volga_spark.tables import load_table
from volga_spark.workloads import workload

_SPEC = DatagenSpec(
    n_rows=20_000,
    fields=[
        FieldSpec("event_time", "incremental_timestamp", start_s=1_700_000_000, step_ms=250),
        FieldSpec("key", "key", num_unique=4),
        FieldSpec("seq", "increment"),
        FieldSpec("value", "uniform", lo=0.0, hi=100.0, seed=7),
        FieldSpec("kind", "values", values=("click", "view", "purchase")),
    ],
)


@workload(
    "q_datagen_window",
    oracle=f"""
        SELECT key, kind,
               count(*) AS n,
               CAST(sum(CAST(round(value * 10) AS BIGINT)) AS BIGINT) AS decivalue_sum,
               min(event_time) AS first_ts,
               max(seq) AS max_seq
        FROM {duck_generate_sql(_SPEC)}
        GROUP BY key, kind
    """,
    tags=("source", "datagen"),
)
def q_datagen_window(spark, sf_dir):
    """20k generated rows (the reference window-benchmark shape: 4 keys,
    rate-controlled timestamps, uniform values) → keyed aggregation.
    sf_dir unused — the source IS the generator."""
    df = generate(spark, _SPEC)
    return df.groupBy("key", "kind").agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("value") * 10).cast("long")).alias("decivalue_sum"),
        F.min("event_time").alias("first_ts"),
        F.max("seq").alias("max_seq"),
    )


@workload("q_approx_sketches", tags=("agg", "approx"))
def q_approx_sketches(spark, sf_dir):
    """The engine's ENTIRE approximate-by-construction surface, one tagged
    union — the single remaining rows-only driver row (r06 verdict item
    #2: everything deterministic-and-SQL-expressible moved behind real
    oracles; what remains here is genuinely not SQL-twinnable). Every leg
    is validated against independent Python recomputation or measured
    error/recall bounds in pytest:

    - ``sketch``: HLL distinct + KLL quantile sketches per l_returnflag
      (error bounds asserted in tests).
    - ``simhash``: SimHash64 banded near-dup candidates within Hamming
      radius ≤ 3 (bit-equality + banding recall in tests/test_dedup.py).
    - ``winnow``: rolling-hash winnowing fingerprint pairs at containment
      ≥ 0.6, Σdf² skew guard in the fingerprint join.
    - ``ivfpq``: IVF + product quantization ANN — corpus as m-byte PQ
      codes (32× compression), ADC table-lookup scoring, exact-cosine
      refine over the shortlist (recall vs brute force measured in
      tests/test_similarity.py).
    """
    li = load_table(spark, sf_dir, "lineitem")
    sketch = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.percentile_approx("l_extendedprice", 0.5).alias("p50_price"),
        F.percentile_approx("l_extendedprice", 0.99).alias("p99_price"),
    ).select(
        F.lit("sketch").alias("leg"),
        F.col("l_returnflag").alias("grp"),
        F.lit(None).cast("long").alias("id_a"),
        F.lit(None).cast("long").alias("id_b"),
        F.col("approx_parts").cast("double").alias("v1"),
        F.col("p50_price").cast("double").alias("v2"),
        F.col("p99_price").cast("double").alias("v3"),
    )

    from volga_spark.operators.dedup import (
        add_signatures,
        simhash_candidates,
        winnow_candidate_pairs,
    )

    d = load_table(spark, sf_dir, "documents")
    # ONE Arrow pass for both signature families (shared tokenization),
    # checkpointed so the two candidate branches read the cached frame
    sigs = add_signatures(d, "text", "doc_id", k=64, n=3).localCheckpoint(
        eager=False
    )
    # hamming verify fused into the banding join (radius arg): the
    # quadratic per-bucket candidate set never leaves its stage
    simhash = simhash_candidates(
        sigs.select("doc_id", "simhash"), "doc_id", bands=4, radius=3
    ).select(
        F.lit("simhash").alias("leg"),
        F.lit(None).cast("string").alias("grp"),
        "id_a",
        "id_b",
        F.col("hamming").cast("double").alias("v1"),
        F.lit(None).cast("double").alias("v2"),
        F.lit(None).cast("double").alias("v3"),
    )
    fps = sigs.select("doc_id", F.explode("winnow_fps").alias("fp"))
    # skew-guarded fingerprint join: Σdf² estimated from the df histogram,
    # hot (boilerplate) fingerprints pruned when it exceeds the limit
    wpairs, _ = winnow_candidate_pairs(fps, "doc_id")
    winnow = (
        wpairs.withColumn(
            "containment", F.col("shared_fps") / F.least("n_a", "n_b")
        )
        .filter(F.col("containment") >= 0.6)
        .select(
            F.lit("winnow").alias("leg"),
            F.lit(None).cast("string").alias("grp"),
            "id_a",
            "id_b",
            F.round("containment", 6).cast("double").alias("v1"),
            F.lit(None).cast("double").alias("v2"),
            F.lit(None).cast("double").alias("v3"),
        )
    )

    from volga_spark.operators.similarity import ivfpq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    ivfpq = ivfpq_topk(
        emb, queries, k=5, n_lists=16, n_probe=8, m=8, ksub=256, refine_factor=8
    ).select(
        F.lit("ivfpq").alias("leg"),
        F.lit(None).cast("string").alias("grp"),
        F.col("query_id").alias("id_a"),
        F.col("neighbor_id").alias("id_b"),
        F.col("rank").cast("double").alias("v1"),
        F.lit(None).cast("double").alias("v2"),
        F.lit(None).cast("double").alias("v3"),
    )
    return sketch.unionByName(simhash).unionByName(winnow).unionByName(ivfpq)
