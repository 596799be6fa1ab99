"""Deterministic split parity vs DuckDB + stability/fraction properties."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from volga_spark.operators.splits import hash_split, split_oracle_expr
from volga_spark.oracle import compare_frames, run_oracle
from volga_spark.tables import load_table

FR = {"train": 0.8, "val": 0.1, "test": 0.1}


def test_split_matches_duckdb(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    got = hash_split(docs, "doc_id", FR, seed="s1").toPandas()
    oracle = run_oracle(
        f"SELECT doc_id, {split_oracle_expr('doc_id', FR, seed='s1')} AS split"
        " FROM documents",
        sf_dir,
    )
    assert not compare_frames(got, oracle)


def test_split_fractions_and_determinism(spark, sf_dir):
    # larger id space for a tight fraction check
    ids = spark.range(0, 20000).withColumnRenamed("id", "doc_id")
    a = hash_split(ids, "doc_id", FR).groupBy("split").count().collect()
    counts = {r["split"]: r["count"] for r in a}
    assert set(counts) == {"train", "val", "test"}
    for name, frac in FR.items():
        assert counts[name] / 20000 == pytest.approx(frac, abs=0.02), name
    # rerun → identical assignment (pure function of (seed, id))
    b = hash_split(ids, "doc_id", FR).groupBy("split").count().collect()
    assert counts == {r["split"]: r["count"] for r in b}
    # different seed → different assignment
    c = hash_split(ids, "doc_id", FR, seed="other")
    diff = (
        hash_split(ids, "doc_id", FR)
        .alias("x")
        .join(c.alias("y"), "doc_id")
        .filter("x.split <> y.split")
        .count()
    )
    assert diff > 0


def test_split_is_stable_under_corpus_growth(spark):
    """Adding documents never moves an existing one across splits — the
    property `rand()`-based splits lack (eval contamination on re-split)."""
    small = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    big = spark.range(0, 5000).withColumnRenamed("id", "doc_id")
    s = {r["doc_id"]: r["split"] for r in hash_split(small, "doc_id", FR).collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(big, "doc_id", FR).collect()}
    assert all(b[k] == v for k, v in s.items())


def test_split_rejects_bad_fractions(spark):
    with pytest.raises(ValueError):
        hash_split(spark.range(5), "id", {"train": 0.5, "val": 0.2})


def _clustered(spark):
    """10k docs; docs 0..2999 grouped into 3-member clusters keyed by the
    member min (the connected_components output shape), rest singletons."""
    docs = spark.range(0, 10_000).withColumnRenamed("id", "doc_id")
    clusters = (
        spark.range(0, 3000)
        .select(
            F.col("id").alias("node"),
            (F.col("id") - (F.col("id") % 3)).alias("component"),
        )
    )
    return docs, clusters


def test_leakage_safe_split_cluster_atomic(spark):
    """No near-dup cluster ever spans two splits — the leakage guard."""
    from volga_spark.operators.splits import leakage_safe_split

    docs, clusters = _clustered(spark)
    out = leakage_safe_split(
        docs, clusters, "doc_id", FR, keep_cluster_col="cluster_id"
    )
    spans = (
        out.groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )
    assert spans == 0
    # every split is populated and fractions hold over cluster KEYS
    counts = {r["split"]: r["count"] for r in out.groupBy("split").count().collect()}
    assert set(counts) == {"train", "val", "test"}


def test_leakage_safe_split_singletons_match_hash_split(spark):
    """A document with no duplicate edge splits exactly as hash_split would
    — the cluster map only ever changes documents it mentions."""
    from volga_spark.operators.splits import leakage_safe_split

    docs, clusters = _clustered(spark)
    out = leakage_safe_split(docs, clusters, "doc_id", FR)
    plain = hash_split(docs, "doc_id", FR).withColumnRenamed("split", "want")
    diff = (
        out.filter(F.col("doc_id") >= 3000)
        .join(plain, "doc_id")
        .filter(F.col("split") != F.col("want"))
        .count()
    )
    assert diff == 0
    # members share their representative's split (key = min id)
    rep = out.filter(F.col("doc_id") % 3 == 0).filter(F.col("doc_id") < 3000)
    mem = out.filter(F.col("doc_id") % 3 != 0).filter(F.col("doc_id") < 3000)
    j = (
        mem.withColumn("k", F.col("doc_id") - (F.col("doc_id") % 3))
        .join(
            rep.select(F.col("doc_id").alias("k"), F.col("split").alias("rs")),
            "k",
        )
        .filter(F.col("split") != F.col("rs"))
    )
    assert j.count() == 0


def test_leakage_safe_split_deterministic_under_repartition(spark):
    from volga_spark.operators.splits import leakage_safe_split

    docs, clusters = _clustered(spark)
    a = leakage_safe_split(docs, clusters, "doc_id", FR)
    b = leakage_safe_split(docs.repartition(17), clusters.repartition(5), "doc_id", FR)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
