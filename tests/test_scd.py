"""SCD Type-2 dimension maintenance: bootstrap hash-matches the DuckDB
twin over `events`, ranges partition time per key, applies are idempotent,
late changes split the covering range, and point-in-time lookup reads the
version valid at each fact's timestamp."""

from __future__ import annotations

from pyspark.sql import functions as F

from volga_spark.operators.scd import (
    scd2_apply,
    scd2_init,
    scd2_lookup,
    scd2_oracle_sql,
)
from volga_spark.oracle import compare_frames, run_oracle
from volga_spark.tables import load_table

# events deduped to one change per (user_id, ts) — scd2 requires unique
# effective timestamps per key (documented contract)
_CHANGES_SQL = """
    SELECT user_id, ts AS eff_ts, max(event_type) AS tier
    FROM events GROUP BY user_id, ts
"""


def _changes(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id", F.col("ts").alias("eff_ts")).agg(
        F.max("event_type").alias("tier")
    ).select("user_id", "eff_ts", "tier")


def test_bootstrap_matches_duckdb(spark, sf_dir):
    got = scd2_init(
        _changes(spark, sf_dir), "user_id", ["tier"]
    ).toPandas()
    oracle = run_oracle(
        scd2_oracle_sql(_CHANGES_SQL, "user_id", ["tier"]), sf_dir
    )
    assert len(got) > 0
    assert not compare_frames(got, oracle)


def test_ranges_partition_time_per_key(spark, sf_dir):
    dim = scd2_init(_changes(spark, sf_dir), "user_id", ["tier"])
    # exactly one open row per key
    opens = dim.filter(F.col("valid_to").isNull()).groupBy("user_id").count()
    assert opens.filter(F.col("count") != 1).count() == 0
    # each closed row's valid_to equals the next row's valid_from (no gaps,
    # no overlaps)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("valid_from")
    bad = (
        dim.withColumn("__next", F.lead("valid_from").over(w))
        .filter(
            F.col("valid_to").isNotNull()
            & (F.col("valid_to") != F.col("__next"))
        )
        .count()
    )
    assert bad == 0


def test_apply_is_idempotent(spark, sf_dir):
    ch = _changes(spark, sf_dir).filter(F.col("user_id") < 50)
    dim = scd2_init(ch, "user_id", ["tier"])
    again = scd2_apply(dim, ch, "user_id", ["tier"])
    a = sorted(map(tuple, dim.collect()))
    b = sorted(map(tuple, again.collect()))
    assert a == b


def test_late_change_splits_range(spark):
    dim0 = scd2_init(
        spark.createDataFrame(
            [(1, 10, "bronze"), (1, 50, "gold")],
            "k bigint, eff_ts bigint, tier string",
        ),
        "k",
        ["tier"],
        ts_col="eff_ts",
    )
    late = spark.createDataFrame(
        [(1, 30, "silver")], "k bigint, eff_ts bigint, tier string"
    )
    rows = sorted(
        map(tuple, scd2_apply(dim0, late, "k", ["tier"]).collect())
    )
    assert rows == [
        (1, "bronze", 10, 30),
        (1, "gold", 50, None),
        (1, "silver", 30, 50),
    ]


def test_noop_change_is_suppressed(spark):
    dim0 = scd2_init(
        spark.createDataFrame(
            [(1, 10, "bronze")], "k bigint, eff_ts bigint, tier string"
        ),
        "k",
        ["tier"],
    )
    noop = spark.createDataFrame(
        [(1, 20, "bronze")], "k bigint, eff_ts bigint, tier string"
    )
    out = scd2_apply(dim0, noop, "k", ["tier"])
    assert sorted(map(tuple, out.collect())) == [(1, "bronze", 10, None)]


def test_point_in_time_lookup(spark):
    dim = scd2_init(
        spark.createDataFrame(
            [(1, 10, "bronze"), (1, 30, "silver"), (2, 5, "gold")],
            "k bigint, eff_ts bigint, tier string",
        ),
        "k",
        ["tier"],
    )
    facts = spark.createDataFrame(
        [(1, 9), (1, 10), (1, 29), (1, 30), (2, 100), (3, 50)],
        "k bigint, ts bigint",
    )
    got = {
        (r["k"], r["ts"]): r["tier"]
        for r in scd2_lookup(facts, dim, "k", "ts", ["tier"]).collect()
    }
    assert got == {
        (1, 9): None,       # before first version
        (1, 10): "bronze",  # inclusive lower bound
        (1, 29): "bronze",
        (1, 30): "silver",  # exclusive upper bound of the old version
        (2, 100): "gold",   # open range
        (3, 50): None,      # unknown key
    }


def test_scd2_lookup_enriches_stream_same_as_batch(spark, sf_dir):
    """Point-in-time dimension enrichment runs UNCHANGED on a streaming
    fact feed (stateless broadcast range probe → valid in stream-static
    joins) and matches the batch result row for row."""
    from volga_spark.operators.scd import scd2_init, scd2_lookup
    from volga_spark.streaming.runner import run_available_now_to_memory
    from volga_spark.streaming.sources import chunked_file_stream
    from volga_spark.tables import load_table

    changes = [
        (u, ts, tier)
        for u in range(50)
        for ts, tier in [(0, "bronze"), (500_000, "silver"), (900_000, "gold")]
    ]
    dim_src = spark.createDataFrame(changes, "user_id bigint, eff_ts bigint, tier string")
    dim = scd2_init(dim_src, "user_id", ["tier"], ts_col="eff_ts")

    facts = load_table(spark, sf_dir, "events").selectExpr(
        "event_id", "user_id", "(unix_micros(ts) div 1000000) % 1000000 AS fact_ts"
    )
    batch_out = scd2_lookup(facts, dim, "user_id", "fact_ts", ["tier"])

    stream, _ = chunked_file_stream(
        spark, sf_dir, "events", ts_col="ts", n_chunks=3
    )
    sfacts = stream.selectExpr(
        "event_id", "user_id", "(unix_micros(ts) div 1000000) % 1000000 AS fact_ts"
    )
    stream_out = run_available_now_to_memory(
        scd2_lookup(sfacts, dim, "user_id", "fact_ts", ["tier"]),
        output_mode="append",
    )
    got = sorted(map(tuple, stream_out.collect()))
    want = sorted(map(tuple, batch_out.collect()))
    assert got == want and len(want) > 0


def test_unsuppressed_bootstrap_matches_duckdb(spark, sf_dir):
    """suppress_noops=False hash-matches its DuckDB twin too (the
    out-of-order-feed mode keeps every observation)."""
    got = scd2_init(
        _changes(spark, sf_dir), "user_id", ["tier"], suppress_noops=False
    ).toPandas()
    oracle = run_oracle(
        scd2_oracle_sql(
            _CHANGES_SQL, "user_id", ["tier"], suppress_noops=False
        ),
        sf_dir,
    )
    assert len(got) > 0
    assert not compare_frames(got, oracle)


def test_scd2_deletes_become_tombstone_versions(spark):
    """CDC deletes end a key's validity: the delete becomes a tombstone
    version row (NULL attrs, __tomb=1) covering the deleted interval, and
    a later re-insert opens a fresh version after it."""
    from volga_spark.operators.scd import scd2_init, scd2_lookup

    schema = "k bigint, eff_ts bigint, tier string, is_del boolean"
    changes = [
        (1, 0, "a", False),
        (1, 10, None, True),   # delete at t=10
        (1, 20, "b", False),   # re-insert at t=20
        (2, 5, "x", False),    # untouched key
    ]
    dim = scd2_init(
        spark.createDataFrame(changes, schema), "k", ["tier"],
        delete_col="is_del",
    )
    got = sorted(
        (
            (r["k"], r["tier"], r["valid_from"], r["valid_to"], r["__tomb"])
            for r in dim.collect()
        ),
        key=lambda t: (t[0], t[2]),
    )
    assert got == [
        (1, "a", 0, 10, 0),
        (1, None, 10, 20, 1),
        (1, "b", 20, None, 0),
        (2, "x", 5, None, 0),
    ]
    # lookups: inside the tombstone interval → NULL, around it → values
    facts = spark.createDataFrame(
        [(1, 7), (1, 12), (1, 25)], "k bigint, ts bigint"
    )
    looked = {
        r["ts"]: r["tier"]
        for r in scd2_lookup(facts, dim, "k", "ts", ["tier"]).collect()
    }
    assert looked == {7: "a", 12: None, 25: "b"}


def test_scd2_late_arrival_does_not_resurrect_past_a_delete(spark):
    """A change older than an APPLIED delete must close at the tombstone
    boundary — the tombstone row is what makes late arrivals sound."""
    from volga_spark.operators.scd import scd2_apply, scd2_init

    schema = "k bigint, eff_ts bigint, tier string, is_del boolean"
    b1 = [(1, 0, "a", False), (1, 10, None, True)]
    dim = scd2_init(
        spark.createDataFrame(b1, schema), "k", ["tier"],
        suppress_noops=False, delete_col="is_del",
    )
    late = [(1, 5, "c", False)]  # arrives after the delete was applied
    dim2 = scd2_apply(
        dim, spark.createDataFrame(late, schema), "k", ["tier"],
        suppress_noops=False, delete_col="is_del",
    )
    got = sorted(
        (
            (r["tier"], r["valid_from"], r["valid_to"], r["__tomb"])
            for r in dim2.collect()
        ),
        key=lambda t: t[1],
    )
    assert got == [
        ("a", 0, 5, 0),
        ("c", 5, 10, 0),      # the late change closes AT the tombstone
        (None, 10, None, 1),  # key still deleted from t=10 on
    ]


def test_scd2_suppression_treats_delete_boundaries_as_real(spark):
    """With suppression ON, a re-insert equal to the pre-delete attrs is
    NOT a no-op (the tombstone between them differs), while
    tombstone-after-tombstone collapses."""
    from volga_spark.operators.scd import scd2_init

    schema = "k bigint, eff_ts bigint, tier string, is_del boolean"
    changes = [
        (1, 0, "a", False),
        (1, 10, None, True),
        (1, 12, None, True),  # duplicate delete — suppressed
        (1, 20, "a", False),  # same attrs as pre-delete — must survive
    ]
    dim = scd2_init(
        spark.createDataFrame(changes, schema), "k", ["tier"],
        suppress_noops=True, delete_col="is_del",
    )
    got = sorted(
        (
            (r["tier"], r["valid_from"], r["valid_to"], r["__tomb"])
            for r in dim.collect()
        ),
        key=lambda t: t[1],
    )
    assert got == [
        ("a", 0, 10, 0),
        (None, 10, 20, 1),
        ("a", 20, None, 0),
    ]
