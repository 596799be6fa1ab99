"""Incremental aggregate view maintenance: batch-folded state equals
full re-aggregation (including after min/max repair), deletes drain
groups, plan stays one narrow shuffle per batch."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from volga_spark.operators.ivm import (
    init_agg,
    maintain_agg,
    read_view,
    repair_minmax,
)

SCHEMA = "k string, v bigint, row_id bigint"


def _rows(seed, n, keys="abcd"):
    rng = random.Random(seed)
    return [
        (rng.choice(keys), rng.randint(-50, 50), i + seed * 10_000)
        for i in range(n)
    ]


def _view(df, spark):
    return sorted(map(tuple, read_view(df, ["k"]).collect()))


def test_insert_only_maintenance_equals_reagg(spark):
    base = spark.createDataFrame(_rows(1, 40), SCHEMA)
    b1 = spark.createDataFrame(_rows(2, 25), SCHEMA)
    b2 = spark.createDataFrame(_rows(3, 17), SCHEMA)

    state = init_agg(base, ["k"], "v")
    state, d1 = maintain_agg(state, b1, None, ["k"], "v")
    assert d1.count() == 0  # inserts never dirty min/max
    state, _ = maintain_agg(state, b2, None, ["k"], "v")

    full = init_agg(base.unionByName(b1).unionByName(b2), ["k"], "v")
    assert _view(state, spark) == _view(full, spark)


def test_delete_maintenance_with_minmax_repair(spark):
    all_rows = _rows(5, 60)
    base = spark.createDataFrame(all_rows, SCHEMA)
    # delete a subset incl. some per-key extrema
    doomed = [r for r in all_rows if r[2] % 3 == 0]
    survivors = [r for r in all_rows if r[2] % 3 != 0]
    deletes = spark.createDataFrame(doomed, SCHEMA)
    remaining = spark.createDataFrame(survivors, SCHEMA)

    state = init_agg(base, ["k"], "v")
    state, dirty = maintain_agg(state, None, deletes, ["k"], "v")
    assert dirty.count() > 0  # deletes touched groups
    # count/sum are already exact pre-repair
    pre = {r["k"]: (r["n"], r["total"]) for r in read_view(state, ["k"]).collect()}
    full = init_agg(remaining, ["k"], "v")
    want = {r["k"]: (r["n"], r["total"]) for r in read_view(full, ["k"]).collect()}
    assert pre == want
    # min/max restored by repairing ONLY the dirty groups
    state = repair_minmax(state, remaining, dirty, ["k"], "v")
    assert _view(state, spark) == _view(full, spark)


def test_unrepaired_dirty_group_survives_insert_batches(spark):
    """An insert-only maintain between a delete and its repair must not
    launder the group's extrema clean: the NULL-marked group stays dirty
    and repair still restores the TRUE min/max, not the insert batch's."""
    base = spark.createDataFrame(
        [("a", -40, 1), ("a", 40, 2), ("a", 1, 3)], SCHEMA
    )
    state = init_agg(base, ["k"], "v")
    # delete the max (40) — group 'a' goes dirty, extrema NULLed
    state, dirty1 = maintain_agg(
        state, None, spark.createDataFrame([("a", 40, 2)], SCHEMA), ["k"], "v"
    )
    assert [r["k"] for r in dirty1.collect()] == ["a"]
    # insert-only batch lands BEFORE the repair (repair runs on a slower
    # cycle); its values are interior, so min(NULL, 5) would fake [5, 5]
    state, dirty2 = maintain_agg(
        state, spark.createDataFrame([("a", 5, 4)], SCHEMA), None, ["k"], "v"
    )
    assert [r["k"] for r in dirty2.collect()] == ["a"]  # still dirty
    remaining = spark.createDataFrame(
        [("a", -40, 1), ("a", 1, 3), ("a", 5, 4)], SCHEMA
    )
    state = repair_minmax(state, remaining, dirty2, ["k"], "v")
    assert _view(state, spark) == _view(init_agg(remaining, ["k"], "v"), spark)


def test_group_drained_to_zero_drops_out(spark):
    rows = [("a", 1, 1), ("a", 2, 2), ("b", 3, 3)]
    base = spark.createDataFrame(rows, SCHEMA)
    state = init_agg(base, ["k"], "v")
    dele = spark.createDataFrame(rows[:2], SCHEMA)
    state, _ = maintain_agg(state, None, dele, ["k"], "v")
    assert [r["k"] for r in state.collect()] == ["b"]


def test_mixed_insert_delete_random_property(spark):
    """Randomized: arbitrary insert/delete interleavings across 4 batches
    == one-shot aggregation of the surviving multiset."""
    rng = random.Random(11)
    live = _rows(7, 30)
    state = init_agg(spark.createDataFrame(live, SCHEMA), ["k"], "v")
    for step in range(4):
        ins = _rows(20 + step, rng.randint(5, 15))
        n_del = rng.randint(1, min(8, len(live)))
        dele = rng.sample(live, n_del)
        live = [r for r in live if r not in dele] + ins
        state, dirty = maintain_agg(
            state,
            spark.createDataFrame(ins, SCHEMA),
            spark.createDataFrame(dele, SCHEMA),
            ["k"],
            "v",
        )
        state = repair_minmax(
            state, spark.createDataFrame(live, SCHEMA), dirty, ["k"], "v"
        )
        # localCheckpoint keeps the lineage bounded across iterations,
        # the same discipline as the CC/graph loops
        state = state.localCheckpoint(eager=True)
    full = init_agg(spark.createDataFrame(live, SCHEMA), ["k"], "v")
    assert _view(state, spark) == _view(full, spark)


def test_maintenance_plan_is_one_shuffle(spark):
    import contextlib
    import io

    base = spark.createDataFrame(_rows(1, 40), SCHEMA)
    b1 = spark.createDataFrame(_rows(2, 25), SCHEMA)
    state = init_agg(base, ["k"], "v").localCheckpoint(eager=True)
    new_state, _ = maintain_agg(state, b1, None, ["k"], "v")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        new_state.explain("formatted")
    p = buf.getvalue()
    # batch-delta agg + merge agg over the union: ≤2 hash exchanges, both
    # narrow (key + 4 measures); no joins, no Python
    assert p.count("hashpartitioning(") <= 2, p[:3000]
    assert "BatchEvalPython" not in p and "Join" not in p


def test_distinct_sketch_merge_equals_rebuild_exactly(spark):
    """HLL union is deterministic: batch-folded sketches give BIT-identical
    estimates to a one-shot build, and estimates track exact distincts."""
    from volga_spark.operators.ivm import (
        init_distinct,
        maintain_distinct,
        read_distinct,
    )

    rows = [(f"k{i % 5}", i % 400) for i in range(3000)]
    base = spark.createDataFrame(rows[:1000], "k string, v bigint")
    b1 = spark.createDataFrame(rows[1000:2000], "k string, v bigint")
    b2 = spark.createDataFrame(rows[2000:], "k string, v bigint")

    state = init_distinct(base, ["k"], "v")
    state = maintain_distinct(state, b1, ["k"], "v").localCheckpoint(eager=True)
    state = maintain_distinct(state, b2, ["k"], "v")
    got = {r["k"]: r["approx_distinct"] for r in read_distinct(state, ["k"]).collect()}

    full = init_distinct(
        spark.createDataFrame(rows, "k string, v bigint"), ["k"], "v"
    )
    want = {r["k"]: r["approx_distinct"] for r in read_distinct(full, ["k"]).collect()}
    assert got == want  # bit-identical, not merely close

    exact = {
        r["k"]: r["d"]
        for r in spark.createDataFrame(rows, "k string, v bigint")
        .groupBy("k")
        .agg(F.countDistinct("v").alias("d"))
        .collect()
    }
    for k, est in got.items():
        assert abs(est - exact[k]) / exact[k] < 0.05, (k, est, exact[k])


def test_all_null_group_bootstrap_matches_maintenance(spark):
    """r07: a group whose values are ALL NULL must be absent from the
    bootstrap state (count(value)=0), exactly as maintain_agg's
    __cnt > 0 filter drops it — so bootstrap-then-maintain stays
    hash-identical to a fresh re-aggregation on that edge."""
    rows = [("dead", None, 1), ("dead", None, 2), ("live", 7, 3)]
    base = spark.createDataFrame(rows, "k string, v int, row_id bigint")
    state = init_agg(base, ["k"], "v")
    assert [r["k"] for r in state.collect()] == ["live"]
    # an all-NULL insert batch for a new group also contributes nothing
    ins = spark.createDataFrame(
        [("ghost", None, 4)], "k string, v int, row_id bigint"
    )
    state, dirty = maintain_agg(state, ins, None, ["k"], "v")
    assert dirty.count() == 0
    got = sorted(map(tuple, read_view(state, ["k"]).collect()))
    want = sorted(
        map(tuple, read_view(init_agg(base.unionByName(ins), ["k"], "v"), ["k"]).collect())
    )
    assert got == want


def _chunked_stream(spark, tmp_path, name, chunks, schema):
    src = str(tmp_path / name)
    for i, part in enumerate(chunks):
        spark.createDataFrame(part, schema).coalesce(1).write.mode(
            "append" if i else "overwrite"
        ).parquet(src)
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )


def test_stream_maintain_append_only_equals_reagg(spark, tmp_path):
    from volga_spark.operators.ivm import ivm_stream_maintain

    rows = _rows(21, 90)
    stream = _chunked_stream(
        spark, tmp_path, "ivm_src", [rows[:30], rows[30:60], rows[60:]], SCHEMA
    )
    state = ivm_stream_maintain(stream, ["k"], "v")
    full = init_agg(spark.createDataFrame(rows, SCHEMA), ["k"], "v")
    assert _view(state, spark) == _view(full, spark)


def test_stream_maintain_with_retractions_equals_reagg(spark, tmp_path):
    """'D' rows retract; a batch that deletes a group's MAX must still
    leave the view hash-identical to re-aggregating the survivors (the
    same-batch repair against the versioned row base)."""
    from volga_spark.operators.ivm import ivm_stream_maintain

    schema = "k string, v bigint, row_id bigint, op string"
    base = [(k, v, i, "I") for i, (k, v) in enumerate(
        [("a", -40), ("a", 40), ("a", 1), ("b", 5), ("b", -5), ("c", 9)]
    )]
    # batch 2 inserts + deletes a's max and one b row; batch 3 drains c
    b2 = [("a", 7, 10, "I"), ("a", 40, 1, "D"), ("b", 5, 3, "D")]
    b3 = [("c", 9, 5, "D"), ("d", 2, 11, "I")]
    stream = _chunked_stream(spark, tmp_path, "ivm_del_src", [base, b2, b3], schema)
    state = ivm_stream_maintain(stream, ["k"], "v", op_col="op")
    survivors = [
        ("a", -40, 0), ("a", 1, 2), ("a", 7, 10), ("b", -5, 4), ("d", 2, 11)
    ]
    full = init_agg(
        spark.createDataFrame(survivors, "k string, v bigint, row_id bigint"),
        ["k"],
        "v",
    )
    got = sorted(
        map(tuple, read_view(state.drop("row_id"), ["k"]).collect())
    )
    want = sorted(map(tuple, read_view(full, ["k"]).collect()))
    assert got == want
    # 'c' drained to zero and dropped out
    assert not [r for r in state.collect() if r["k"] == "c"]


def test_histogram_percentile_maintenance_exact_under_retraction(spark):
    """Bucketed-histogram percentile state: insert+delete maintenance is
    hash-identical to a fresh histogram of the survivors (counts are an
    abelian group — the property that lets percentiles retract at all),
    and the percentile bucket always contains the exact percentile_disc
    value of the surviving multiset."""
    from volga_spark.operators.ivm import (
        init_hist,
        maintain_hist,
        read_percentile_bucket,
    )

    rng = random.Random(31)
    edges = [float(x) for x in range(-40, 50, 10)]
    live = _rows(41, 80)
    state = init_hist(spark.createDataFrame(live, SCHEMA), ["k"], "v", edges)
    for step in range(3):
        ins = _rows(60 + step, rng.randint(5, 15))
        dele = rng.sample(live, rng.randint(3, 10))
        live = [r for r in live if r not in dele] + ins
        state = maintain_hist(
            state,
            spark.createDataFrame(ins, SCHEMA),
            spark.createDataFrame(dele, SCHEMA),
            ["k"],
            "v",
            edges,
        ).localCheckpoint(eager=True)
    fresh = init_hist(spark.createDataFrame(live, SCHEMA), ["k"], "v", edges)
    got = sorted(map(tuple, state.collect()))
    want = sorted(map(tuple, fresh.collect()))
    assert got == want
    # the p50 bucket brackets the true percentile_disc value per key
    p50 = {
        r["k"]: r["bucket"]
        for r in read_percentile_bucket(state, ["k"], 0.5).collect()
    }
    import bisect

    by_k = {}
    for k, v, _ in live:
        by_k.setdefault(k, []).append(v)
    for k, vals in by_k.items():
        vals.sort()
        true_p50 = vals[max(0, -(-len(vals) * 1 // 2) - 1)]  # ceil(0.5 n)-th
        true_bucket = bisect.bisect_right(edges, true_p50)
        assert p50[k] == true_bucket, (k, true_p50, p50[k], true_bucket)


def test_stream_histogram_with_retractions_equals_fresh(spark, tmp_path):
    """Streamed I/D histogram maintenance == fresh histogram of the
    survivors — no base table, no repair (the abelian property)."""
    from volga_spark.operators.ivm import hist_stream_maintain, init_hist

    edges = [float(x) for x in range(-40, 50, 10)]
    schema = "k string, v bigint, row_id bigint, op string"
    rng = random.Random(53)
    all_rows = [
        (rng.choice("abc"), rng.randint(-50, 50), i, "I") for i in range(60)
    ]
    dels = [(k, v, rid, "D") for (k, v, rid, _) in rng.sample(all_rows, 15)]
    chunks = [all_rows[:30], all_rows[30:] + dels[:7], dels[7:]]
    stream = _chunked_stream(spark, tmp_path, "hist_src", chunks, schema)
    state = hist_stream_maintain(stream, ["k"], "v", edges, op_col="op")

    doomed = {rid for (_, _, rid, _) in dels}
    survivors = [(k, v, rid) for (k, v, rid, _) in all_rows if rid not in doomed]
    fresh = init_hist(
        spark.createDataFrame(survivors, "k string, v bigint, row_id bigint"),
        ["k"],
        "v",
        edges,
    )
    assert sorted(map(tuple, state.collect())) == sorted(
        map(tuple, fresh.collect())
    )
