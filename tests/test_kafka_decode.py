"""Kafka source JSON→rows decode logic (reference KafkaSourceConfig JSON→
Arrow decode, src/runtime/functions/source/kafka/mod.rs:22-48), tested
without a broker: the same from_json projection applied to a frame with
kafka's (key, value) wire schema."""

from __future__ import annotations

import json

from pyspark.sql import functions as F


def test_kafka_value_json_decode(spark):
    schema = "event_id bigint, user_id bigint, event_type string, value double"
    payloads = [
        {"event_id": 1, "user_id": 10, "event_type": "click", "value": 1.5},
        {"event_id": 2, "user_id": 11, "event_type": "view", "value": 2.25},
    ]
    wire = spark.createDataFrame(
        [(str(p["user_id"]).encode(), json.dumps(p).encode()) for p in payloads],
        "key binary, value binary",
    )
    decoded = wire.select(
        F.from_json(F.col("value").cast("string"), schema).alias("j")
    ).select("j.*")
    rows = {r.event_id: r for r in decoded.collect()}
    assert rows[1].event_type == "click" and rows[1].value == 1.5
    assert rows[2].user_id == 11 and rows[2].value == 2.25
    # malformed payloads decode to NULL struct (PERMISSIVE), not a crash
    bad = spark.createDataFrame([(b"k", b"{not json")], "key binary, value binary")
    out = bad.select(F.from_json(F.col("value").cast("string"), schema).alias("j")).collect()
    assert out[0].j is None or out[0].j.event_id is None
