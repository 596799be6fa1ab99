"""LSH ANN recall vs the exact brute-force baseline on real embeddings."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from volga_spark.operators.similarity import brute_force_topk, lsh_topk
from volga_spark.tables import load_table


def test_lsh_recall_vs_brute_force(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(emb, queries, k=5).collect()
    approx = lsh_topk(emb, queries, k=5, n_planes=16, bands=8, dim=64).collect()
    truth = {(r.query_id, r.neighbor_id) for r in exact}
    found = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(truth & found) / len(truth)
    # 16 planes / 8 bands (2 bits each) on clustered embeddings: ~0.9 measured
    assert recall >= 0.7, f"LSH recall too low: {recall}"


def test_brute_force_scores_sane(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    rows = brute_force_topk(emb, queries, k=5).collect()
    assert len(rows) == 15
    for r in rows:
        assert -1.0 - 1e-9 <= r.score <= 1.0 + 1e-9


def test_approx_sketches_error_bounds(spark, sf_dir):
    from volga_spark.workloads import load_all
    from volga_spark.tables import load_table
    from pyspark.sql import functions as F

    reg = load_all()
    approx = {
        r.grp: r
        for r in reg["q_approx_sketches"]
        .fn(spark, sf_dir)
        .filter(F.col("leg") == "sketch")
        .collect()
    }
    li = load_table(spark, sf_dir, "lineitem")
    parts = {
        r.l_returnflag: r.parts
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("parts"))
        .collect()
    }
    # independent DISCRETE-percentile reference (inverted CDF — the
    # percentile_disc convention the exact operating point must hit), from
    # the raw values in python, not another Spark percentile function
    import math

    vals: dict = {}
    for r in li.select("l_returnflag", "l_extendedprice").collect():
        vals.setdefault(r.l_returnflag, []).append(r.l_extendedprice)

    def disc(v, p):
        v = sorted(v)
        return v[max(0, math.ceil(p * len(v)) - 1)]

    for flag, a in approx.items():
        # r09: the leg runs at EXACT operating points (HLL lgK=21 coupon
        # mode, percentile accuracy >= group size) — EQUALITY against an
        # independent reference for all three values, not bounds; the
        # approximate operating points are covered in
        # tests/test_sketch_exact_points.py
        assert a.v1 == float(parts[flag])
        assert a.v2 == disc(vals[flag], 0.5)
        assert a.v3 == disc(vals[flag], 0.99)


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    from volga_spark.operators.similarity import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(emb, queries, k=5).collect()
    approx = ivf_topk(emb, queries, k=5, n_lists=16, n_probe=8).collect()
    truth = {(r.query_id, r.neighbor_id) for r in exact}
    found = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(truth & found) / len(truth)
    # probing 8/16 lists on clustered embeddings: 0.82 measured both SFs
    assert recall >= 0.7, f"IVF recall too low: {recall}"


def test_ivf_deterministic(spark, sf_dir):
    from volga_spark.operators.similarity import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    a = sorted(map(tuple, ivf_topk(emb, queries, k=3, n_lists=16, n_probe=4)
                   .select("query_id", "neighbor_id", "rank").collect()))
    b = sorted(map(tuple, ivf_topk(emb, queries, k=3, n_lists=16, n_probe=4)
                   .select("query_id", "neighbor_id", "rank").collect()))
    assert a == b


def test_semdedup_keeps_one_per_group(spark):
    """SemDeDup on a synthetic corpus with planted near-identical groups:
    exactly one keeper per duplicate group (the member with the LOWEST
    centroid cosine — the paper's keep rule), singletons all kept, and
    every row appears exactly once."""
    import numpy as np

    from volga_spark.operators.similarity import semdedup

    rng = np.random.default_rng(17)
    rows = []
    vid = 0
    group_members = {}
    # 6 well-separated base directions; groups of 4 tiny perturbations each
    for g in range(6):
        base = rng.normal(size=16)
        base /= np.linalg.norm(base)
        ids = []
        for _ in range(4):
            v = base + rng.normal(scale=0.01, size=16)
            rows.append((vid, [float(x) for x in v]))
            ids.append(vid)
            vid += 1
        group_members[g] = ids
    singles = []
    for _ in range(10):
        v = rng.normal(size=16)
        rows.append((vid, [float(x) for x in v]))
        singles.append(vid)
        vid += 1
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    out = semdedup(df, threshold=0.98, n_lists=8, train_sample=64).collect()
    assert len(out) == len(rows)
    by_id = {r.vec_id: r for r in out}
    # every planted group collapses to >= ... one component with exactly one keeper
    for g, ids in group_members.items():
        comps = {by_id[i].component for i in ids}
        assert len(comps) == 1, (g, comps)
        keepers = [i for i in ids if by_id[i].keep]
        assert len(keepers) == 1, (g, keepers)
        # keep rule: lowest centroid cosine (tie: lowest id)
        expect = min(ids, key=lambda i: (by_id[i].cent_sim, i))
        assert keepers[0] == expect, (g, keepers, expect)
    # random singletons: kept, own component
    for i in singles:
        r = by_id[i]
        assert r.keep and r.component == i, i


def test_ivfpq_recall_vs_brute_force(spark, sf_dir):
    """IVF-PQ trades ranking exactness for 32x index memory; with generous
    probing (8/16 lists) and 16-dim subspaces the ADC ranking still recovers
    most of the exact top-5 on the clustered synthetic embeddings."""
    from volga_spark.operators.similarity import ivfpq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(emb, queries, k=5).collect()
    approx = ivfpq_topk(
        emb, queries, k=5, n_lists=16, n_probe=8, m=8, ksub=256, refine_factor=8
    ).collect()
    truth = {(r.query_id, r.neighbor_id) for r in exact}
    found = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(truth & found) / len(truth)
    # ADC-only ranking measures ~0.5 here; the exact-cosine refine stage
    # over the 40-candidate ADC shortlist recovers ~0.95+
    assert recall >= 0.8, f"IVF-PQ recall too low: {recall}"


def test_ivfpq_deterministic_and_codes_bounded(spark, sf_dir):
    from volga_spark.operators.similarity import ivfpq_topk, pq_encode, pq_train
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    a = sorted(map(tuple, ivfpq_topk(emb, queries, k=3, n_lists=16, n_probe=4, m=4, ksub=64)
                   .select("query_id", "neighbor_id", "rank").collect()))
    b = sorted(map(tuple, ivfpq_topk(emb, queries, k=3, n_lists=16, n_probe=4, m=4, ksub=64)
                   .select("query_id", "neighbor_id", "rank").collect()))
    assert a == b and a

    # codes: m entries, each < ksub (fits uint8 at ksub<=256 — the 32x story)
    rng = np.random.RandomState(0)
    x = rng.standard_normal((128, 64))
    books = pq_train(x, m=8, ksub=32, seed=1)
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    codes = pq_encode(x, books)
    assert codes.shape == (128, 8)
    assert codes.min() >= 0 and codes.max() < 32


def test_pq_adc_approximates_cosine():
    """ADC inner product over trained codebooks must approximate the true
    cosine of normalized vectors (quantization error bounded, ordering
    mostly preserved on separable data)."""
    import numpy as np
    from volga_spark.operators.similarity import pq_encode, pq_train

    rng = np.random.RandomState(3)
    # two well-separated clusters
    base = rng.standard_normal((2, 64)) * 4
    x = np.vstack([base[i % 2] + rng.standard_normal(64) * 0.3 for i in range(256)])
    books = pq_train(x, m=8, ksub=64, seed=2)
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    codes = pq_encode(xn, books)
    q = xn[0]
    lut = np.einsum("md,mkd->mk", q.reshape(8, 8), books)
    adc = lut[np.arange(8)[None, :], codes].sum(axis=1)
    true = xn @ q
    err = np.abs(adc - true)
    assert err.mean() < 0.05, err.mean()
    # same-cluster neighbors must outrank cross-cluster under ADC
    same = adc[2::2].mean()   # even rows share cluster 0 with q
    other = adc[1::2].mean()
    assert same > other


def test_ivf_distributed_training_recall(spark, sf_dir):
    """train='distributed' (MLlib k-means|| over the full corpus — zero
    driver-side vector collect) reaches the same recall band as the
    sample-trained quantizer."""
    from volga_spark.operators.similarity import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(emb, queries, k=5).collect()
    approx = ivf_topk(
        emb, queries, k=5, n_lists=16, n_probe=8, train="distributed"
    ).collect()
    truth = {(r.query_id, r.neighbor_id) for r in exact}
    found = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(truth & found) / len(truth)
    assert recall >= 0.7, f"distributed-IVF recall too low: {recall}"

    import pytest

    with pytest.raises(ValueError, match="train must be"):
        ivf_topk(emb, queries, k=5, train="bogus").collect()
