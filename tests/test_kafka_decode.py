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


def test_quarantine_split_preserves_everything(spark):
    """good ∪ quarantine covers every input row exactly once; quarantine
    keeps the raw payload for replay; the split works on a stream."""
    from volga_spark.streaming.runner import run_available_now_to_memory
    from volga_spark.streaming.sources import decode_json_with_quarantine

    schema = "event_id bigint, user_id bigint, event_type string, value double"
    payloads = [
        json.dumps({"event_id": 1, "user_id": 10, "event_type": "c", "value": 1.5}),
        json.dumps({"event_id": 2, "user_id": 11, "event_type": "v", "value": 2.0}),
        "{not json",
        "{}",
    ]
    wire = spark.createDataFrame(
        [(b"k", p.encode()) for p in payloads], "key binary, value binary"
    )
    good, quar = decode_json_with_quarantine(wire, schema)
    assert good.count() == 2 and quar.count() == 2
    assert {r.event_id for r in good.collect()} == {1, 2}
    assert {r.raw_payload for r in quar.collect()} == {"{not json", "{}"}

    # same split on a streaming frame
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = os.path.join(tempfile.mkdtemp(), "wire")
    os.makedirs(d)
    pq.write_table(
        pa.table({"key": [b"k"] * 4, "value": [p.encode() for p in payloads]}),
        os.path.join(d, "p0.parquet"),
    )
    stream = spark.readStream.schema("key binary, value binary").parquet(d)
    sgood, squar = decode_json_with_quarantine(stream, schema)
    res = run_available_now_to_memory(sgood, output_mode="append")
    assert {r.event_id for r in res.collect()} == {1, 2}
    qres = run_available_now_to_memory(
        squar.select("raw_payload"), output_mode="append"
    )
    assert {r.raw_payload for r in qres.collect()} == {"{not json", "{}"}
