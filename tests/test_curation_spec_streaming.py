"""CurationSpec on a STREAM: the map-side stage subset (gates + rewrites +
annotators — everything except corpus-wide dedup/sampling-free stages that
need global state) runs unchanged on a Structured Streaming frame and
produces the identical row set as batch. The spec front end inherits the
one-config-N-modes property the expression tier already pins."""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from volga_spark.api.curation import CurationSpec
from volga_spark.streaming.runner import run_available_now_to_memory
from volga_spark.tables import load_table

# map-side-only spec: filters and rewrites, no global state
SPEC = CurationSpec(
    stages=[
        {"op": "min_chars", "n": 20},
        {"op": "pii_redact"},
        {"op": "c4_clean_lines"},
        {"op": "fim", "seed": "stream-parity-fim"},
        {"op": "span_corrupt", "span_len": 3, "corrupt_one_in": 5},
        {"op": "bernoulli_sample", "fraction": 0.7, "seed": "stream-parity"},
        {"op": "split", "fractions": {"train": 0.9, "val": 0.1}, "seed": "sp"},
    ]
)


def test_spec_stream_equals_batch(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    batch = SPEC.build(spark, docs).toPandas()

    root = os.path.join(
        tempfile.gettempdir(), "volga_spark_spec_stream", uuid.uuid4().hex[:8]
    )
    os.makedirs(root, exist_ok=True)
    try:
        pdf = docs.orderBy("doc_id").toPandas()
        per = (len(pdf) + 2) // 3
        for i in range(3):
            spark.createDataFrame(pdf.iloc[i * per : (i + 1) * per]).coalesce(
                1
            ).write.mode("overwrite").parquet(os.path.join(root, f"chunk{i}"))
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(root, "chunk*"))
        )
        streamed = run_available_now_to_memory(
            SPEC.build(spark, stream), output_mode="append"
        ).toPandas()
    finally:
        shutil.rmtree(root, ignore_errors=True)

    b = batch.sort_values("doc_id").reset_index(drop=True)
    s = streamed.sort_values("doc_id").reset_index(drop=True)
    assert len(b) == len(s) > 0
    for col in b.columns:
        assert b[col].tolist() == s[col].tolist(), col
    # the gates actually gated (deterministic sample drops ~30%)
    assert len(b) < docs.count()
