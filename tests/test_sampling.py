"""Deterministic sampling operators: DuckDB parity (identical row sets from
the same md5 rule), growth stability, and the temperature-mixing math."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from volga_spark.operators.sampling import (
    bernoulli_oracle_pred,
    bernoulli_sample,
    bottom_k_oracle_sql,
    bottom_k_sample,
    stratified_oracle_pred,
    stratified_sample,
    temperature_rates,
)
from volga_spark.oracle import compare_frames, run_oracle
from volga_spark.tables import load_table

DOCS = "read_parquet('{sf}/documents.parquet')"


def test_bottom_k_matches_duckdb_and_is_plan_sane(spark, sf_dir):
    df = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    got = bottom_k_sample(df, "doc_id", 97, seed="s1")
    sql = bottom_k_oracle_sql(
        f"(SELECT doc_id, source FROM {DOCS.format(sf=sf_dir)})", "doc_id", 97, "s1"
    )
    assert not compare_frames(got.toPandas(), run_oracle(sql, sf_dir))
    # scalable shape: per-partition top-k merge, not a global sort
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan


def test_bernoulli_matches_duckdb_and_is_growth_stable(spark, sf_dir):
    df = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    got = bernoulli_sample(df, "doc_id", 0.25, seed="s2")
    pred = bernoulli_oracle_pred("doc_id", 0.25, "s2")
    sql = f"SELECT doc_id, n_chars FROM {DOCS.format(sf=sf_dir)} WHERE {pred}"
    assert not compare_frames(got.toPandas(), run_oracle(sql, sf_dir))
    # growth stability: sampling half the corpus keeps exactly the kept rows
    # of that half — membership is per-row, independent of what else exists
    half = df.filter(F.col("doc_id") % 2 == 0)
    kept_half = set(
        r[0] for r in bernoulli_sample(half, "doc_id", 0.25, "s2").select("doc_id").collect()
    )
    kept_full = set(r[0] for r in got.select("doc_id").collect())
    assert kept_half == {d for d in kept_full if d % 2 == 0}
    # and the rate is in the statistical ballpark (n=500, ±4σ band)
    n, total = len(kept_full), df.count()
    assert 0.15 < n / total < 0.35


def test_stratified_matches_duckdb(spark, sf_dir):
    df = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    fr = {"src0": 1.0, "src1": 0.2, "src2": 0.5}
    got = stratified_sample(df, "source", "doc_id", fr, default_fraction=0.0, seed="s3")
    pred = stratified_oracle_pred("source", "doc_id", fr, 0.0, "s3")
    sql = f"SELECT doc_id, source FROM {DOCS.format(sf=sf_dir)} WHERE {pred}"
    assert not compare_frames(got.toPandas(), run_oracle(sql, sf_dir))
    # fraction-1.0 stratum keeps everything; default-0.0 strata keep nothing
    src_counts = dict(df.groupBy("source").count().collect())
    kept_counts = dict(got.groupBy("source").count().collect())
    assert kept_counts.get("src0") == src_counts["src0"]
    assert set(kept_counts) <= {"src0", "src1", "src2"}


def test_temperature_rates_math():
    sizes = {"en": 1_000_000, "fr": 10_000, "sw": 100}
    # alpha=1: proportional — every source sampled at the same rate
    r1 = temperature_rates(sizes, 1.0, 100_000)
    rates = {k: r1[k] for k in sizes}
    assert max(rates.values()) - min(rates.values()) < 1e-9
    # alpha<1 boosts small sources relative to proportional
    r03 = temperature_rates(sizes, 0.3, 100_000)
    assert r03["sw"] > r1["sw"] and r03["en"] < r1["en"]
    # expected kept rows hit the budget (within rounding)
    expected = sum(r03[k] * sizes[k] for k in sizes)
    assert abs(expected - 100_000) < 1.0
    # cap + redistribute: tiny source hits 1.0, budget still met
    r_cap = temperature_rates(sizes, 0.0, 200_000)  # uniform wants 66k of sw's 100
    assert r_cap["sw"] == 1.0
    expected = sum(r_cap[k] * sizes[k] for k in sizes)
    assert abs(expected - 200_000) < 1.0
    # degenerate budgets
    assert temperature_rates(sizes, 0.5, 0) == {k: 0.0 for k in sizes}
    all_of_it = temperature_rates(sizes, 0.5, 10_000_000)
    assert all(v == 1.0 for v in all_of_it.values())
    with pytest.raises(ValueError):
        temperature_rates(sizes, -0.1, 10)


def test_weighted_bottom_k_matches_python_reference(spark):
    """A-ES with md5-derived u: the Spark selection equals an independent
    Python replay of the same formula, and is partition-independent."""
    import hashlib
    import math

    from volga_spark.operators.sampling import weighted_bottom_k

    rows = [(i, float(1 + (i * 7) % 13)) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id bigint, w double")

    def py_key(i, w, seed="volga"):
        h = hashlib.md5(f"{seed}:{i}".encode()).hexdigest()
        u = (int(h[:12], 16) + 0.5) / 2**48
        return math.log(u) / w

    want = {
        i for i, _ in sorted(
            rows, key=lambda r: py_key(r[0], r[1]), reverse=True
        )[:40]
    }
    got = {r["doc_id"] for r in weighted_bottom_k(df, "doc_id", "w", 40).collect()}
    assert got == want
    got2 = {
        r["doc_id"]
        for r in weighted_bottom_k(df.repartition(11), "doc_id", "w", 40).collect()
    }
    assert got2 == want


def test_weighted_bottom_k_drops_nan_and_nonpositive_weights(spark):
    """NaN sorts above every number in Spark, so an unguarded NaN weight
    both passes `w > 0` and ranks first — corrupt scorer output would
    displace the whole sample. NaN/0/negative rows must all be excluded."""
    from volga_spark.operators.sampling import weighted_bottom_k

    rows = [(i, 1.0) for i in range(20)] + [
        (100, float("nan")),
        (101, float("nan")),
        (102, 0.0),
        (103, -1.0),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, w double")
    got = {r["doc_id"] for r in weighted_bottom_k(df, "doc_id", "w", 10).collect()}
    assert len(got) == 10 and got.isdisjoint({100, 101, 102, 103})


def test_weighted_bottom_k_inclusion_tracks_weight(spark):
    """Higher-weight rows are selected at measurably higher rates across
    independent seeds (inclusion ∝ weight is the A-ES contract)."""
    from volga_spark.operators.sampling import weighted_bottom_k

    rows = [(i, 10.0 if i < 100 else 1.0) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id bigint, w double")
    heavy_hits = light_hits = 0
    for s in range(8):
        sel = {
            r["doc_id"]
            for r in weighted_bottom_k(df, "doc_id", "w", 200, seed=f"s{s}").collect()
        }
        heavy_hits += sum(1 for i in sel if i < 100)
        light_hits += sum(1 for i in sel if i >= 100)
    # 100 heavy (w=10) vs 900 light (w=1): heavy inclusion rate must be
    # several times the light rate (exact rates depend on k/N regime)
    heavy_rate = heavy_hits / (8 * 100)
    light_rate = light_hits / (8 * 900)
    assert heavy_rate > 3 * light_rate, (heavy_rate, light_rate)
    # zero/negative weights never selected
    df2 = spark.createDataFrame(
        [(1, 0.0), (2, -1.0), (3, 5.0)], "doc_id bigint, w double"
    )
    sel2 = {r["doc_id"] for r in weighted_bottom_k(df2, "doc_id", "w", 3).collect()}
    assert sel2 == {3}


def test_weighted_bottom_k_plan_take_ordered(spark):
    import contextlib
    import io

    from volga_spark.operators.sampling import weighted_bottom_k

    df = spark.createDataFrame(
        [(i, 1.0 + i % 5) for i in range(500)], "doc_id bigint, w double"
    )
    out = weighted_bottom_k(df, "doc_id", "w", 25)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    p = buf.getvalue()
    assert "TakeOrderedAndProject" in p  # no global sort


# --- soft dedup (r08) ---


def test_cluster_soft_dedup_matches_duckdb_twin(spark, sf_dir):
    from volga_spark.operators.sampling import (
        cluster_soft_dedup,
        cluster_soft_dedup_oracle_sql,
    )
    from volga_spark.oracle import compare_frames, run_oracle
    from volga_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    # real near-dup map: exact-duplicate groups (md5(text)), component =
    # smallest member id — the hard-dedup survivor rule
    clusters_sql = """
        SELECT doc_id, MIN(doc_id) OVER (PARTITION BY md5(text)) AS component
        FROM documents
    """
    d2 = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    clusters = d2.select(
        "doc_id",
        F.min("doc_id").over(Window.partitionBy(F.md5("text"))).alias(
            "component"
        ),
    )
    got = cluster_soft_dedup(docs, clusters).toPandas()
    want = run_oracle(
        cluster_soft_dedup_oracle_sql(
            "SELECT doc_id, source FROM documents", clusters_sql
        ),
        sf_dir,
    )
    assert compare_frames(got, want) == []
    assert len(got) > 0


def test_cluster_soft_dedup_semantics(spark):
    from volga_spark.operators.sampling import cluster_soft_dedup

    # one giant cluster (ids 0..999 in component 0), one pair, singletons
    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in range(1010)], "doc_id long, text string"
    )
    rows = [(i, 0) for i in range(1000)] + [(1000, 1000), (1001, 1000)]
    clusters = spark.createDataFrame(rows, "doc_id long, component long")
    out = cluster_soft_dedup(docs, clusters).collect()
    by_id = {r["doc_id"]: r for r in out}
    # representative of every cluster guaranteed kept
    assert 0 in by_id and by_id[0]["is_representative"]
    assert 1000 in by_id and by_id[1000]["is_representative"]
    # singletons (not in the cluster map) always kept, size 1
    for i in (1002, 1005, 1009):
        assert by_id[i]["cluster_size"] == 1 and by_id[i]["is_representative"]
    # the 1000-member cluster keeps ~2 in expectation (1 rep + ~1 soft),
    # never anywhere near hard-keep-all; allow generous tail
    big_kept = sum(1 for r in out if r["cluster_size"] == 1000)
    assert 1 <= big_kept <= 12, big_kept
    # deterministic under repartition
    out2 = cluster_soft_dedup(docs.repartition(7), clusters).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))
