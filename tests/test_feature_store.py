"""Offline feature retrieval (`get_historical_features`): multi-view
point-in-time correctness vs DuckDB's native ASOF JOIN, TTL expiry,
no-leakage (never a future feature), and name collision guard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from volga_spark.api.feature_store import FeatureView, get_historical_features
from volga_spark.oracle import compare_frames, run_oracle
from volga_spark.tables import load_table

DAY_US = 24 * 3600 * 1_000_000

ORACLE = """
    WITH spine AS (
        SELECT event_id, user_id, ts + INTERVAL 37 MINUTE AS sts FROM events
    ),
    v1 AS (SELECT user_id, ts, value FROM events),
    v2 AS (SELECT user_id, ts, event_type FROM events WHERE value > 0.5)
    SELECT s.event_id, s.user_id, s.sts,
           b1.value AS val__value,
           CASE WHEN s.sts - b2.ts <= INTERVAL 1 DAY
                THEN b2.event_type END AS typ__event_type
    FROM spine s
    ASOF LEFT JOIN v1 b1 ON b1.user_id = s.user_id AND b1.ts <= s.sts
    ASOF LEFT JOIN v2 b2 ON b2.user_id = s.user_id AND b2.ts <= s.sts
"""


def _setup(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    spine = ev.select(
        "event_id",
        "user_id",
        (F.col("ts") + F.expr("INTERVAL 37 MINUTE")).alias("sts"),
    )
    views = [
        FeatureView(
            name="val",
            source=ev.select("user_id", "ts", "value"),
            keys=["user_id"],
            ts_col="ts",
        ),
        FeatureView(
            name="typ",
            source=ev.filter(F.col("value") > 0.5).select(
                "user_id", "ts", "event_type"
            ),
            keys=["user_id"],
            ts_col="ts",
            ttl_us=DAY_US,
        ),
    ]
    return spine, views


def test_multi_view_matches_duckdb_asof(spark, sf_dir):
    spine, views = _setup(spark, sf_dir)
    got = get_historical_features(spine, "sts", views).toPandas()
    oracle = run_oracle(ORACLE, sf_dir)
    assert not compare_frames(got, oracle)


def test_no_future_leakage_and_ttl(spark, sf_dir):
    spine, views = _setup(spark, sf_dir)
    out = get_historical_features(spine, "sts", views)
    ev = load_table(spark, sf_dir, "events")

    # every attached val__value must exist at or before the spine ts for
    # that user (backward-only semantics = no label leakage)
    bad = (
        out.join(
            ev.select(
                F.col("user_id").alias("u"),
                F.col("ts").alias("fts"),
                F.col("value").alias("fv"),
            ),
            (F.col("user_id") == F.col("u"))
            & (F.col("val__value") == F.col("fv")),
        )
        .groupBy("event_id", "sts")
        .agg(F.min("fts").alias("first_seen"))
        .filter(F.col("first_seen") > F.col("sts"))
        .count()
    )
    assert bad == 0

    # TTL view: a user's typ feature must be NULL when their latest
    # qualifying feature row is older than a day
    expired = out.filter(
        F.col("typ__event_type").isNotNull()
    ).join(
        ev.filter(F.col("value") > 0.5)
        .groupBy("user_id")
        .agg(F.max("ts").alias("latest")),
        "user_id",
    ).filter(
        F.col("latest") < F.col("sts") - F.expr("INTERVAL 1 DAY")
    )
    assert expired.count() == 0


def test_spine_rows_and_columns_pass_through(spark, sf_dir):
    spine, views = _setup(spark, sf_dir)
    out = get_historical_features(spine, "sts", views)
    assert out.count() == spine.count()
    assert out.columns == ["event_id", "user_id", "sts", "val__value", "typ__event_type"]


def test_duplicate_view_name_rejected(spark, sf_dir):
    spine, views = _setup(spark, sf_dir)
    views[1].name = "val"
    with pytest.raises(ValueError, match="duplicate"):
        get_historical_features(spine, "sts", views)


def test_online_store_equals_offline_at_now(spark, sf_dir):
    """Train/serve consistency: stream-materialized online state must equal
    get_historical_features evaluated at a timestamp after the stream's
    end — both are latest-row-at-or-before-ts per key."""
    from volga_spark.api.feature_store import OnlineStore, materialize_online
    from volga_spark.streaming.sources import chunked_file_stream

    ev = load_table(spark, sf_dir, "events")
    view = FeatureView(
        name="val",
        source=ev.select("user_id", "ts", "value"),
        keys=["user_id"],
        ts_col="ts",
    )
    stream, _ = chunked_file_stream(spark, sf_dir, "events", "ts", n_chunks=3)
    online = materialize_online(stream, view)
    assert isinstance(online, OnlineStore)

    users = ev.select("user_id").distinct()
    served = online.lookup(users)

    now = ev.agg(F.max("ts")).first()[0]
    spine = users.withColumn("sts", F.lit(now) + F.expr("INTERVAL 1 HOUR"))
    offline = get_historical_features(spine, "sts", [view]).drop("sts")

    got = sorted(map(tuple, served.collect()))
    want = sorted(map(tuple, offline.collect()))
    assert got == want
    assert served.count() == users.count()
    online.close()


def test_view_resolution_is_single_shuffle_carry(spark, sf_dir):
    """Plan audit: resolving one feature view is the as-of carry — ONE hash
    exchange per side on the entity key feeding a sort-merge carry, no
    BroadcastNestedLoop / cartesian anywhere (the N-way pre-join
    anti-pattern would show as extra exchanges of the spine)."""
    spine, views = _setup(spark, sf_dir)
    out = get_historical_features(spine, "sts", views[:1])
    out.count()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("hashpartitioning(user_id") <= 2, plan[:3000]


def test_online_store_serves_over_http(spark, sf_dir):
    """The OnlineStore plugs into the same HTTP front end as the
    point-in-time FeatureService — latest-value lookups with key-only
    requests, responses equal to a direct lookup."""
    import json
    import urllib.request

    from volga_spark.api.feature_store import FeatureView, materialize_online
    from volga_spark.api.serving import FeatureServer
    from volga_spark.streaming.sources import chunked_file_stream

    ev = load_table(spark, sf_dir, "events")
    view = FeatureView(
        name="val",
        source=ev.select("user_id", "ts", "value"),
        keys=["user_id"],
        ts_col="ts",
    )
    stream, _ = chunked_file_stream(spark, sf_dir, "events", "ts", n_chunks=3)
    online = materialize_online(stream, view)

    users = [r["user_id"] for r in ev.select("user_id").distinct().limit(5).collect()]
    with FeatureServer(spark, online) as srv:
        body = json.dumps(
            {"requests": [{"request_id": i, "user_id": u} for i, u in enumerate(users)]}
        ).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/features",
            data=body,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as resp:
            out = json.loads(resp.read())["features"]

    served = {r["user_id"]: r["val__value"] for r in out}
    direct = {
        r["user_id"]: r["val__value"]
        for r in online.lookup(
            spark.createDataFrame([(u,) for u in users], ["user_id"])
        ).collect()
    }
    assert served == direct and len(served) == len(users)
    online.close()
