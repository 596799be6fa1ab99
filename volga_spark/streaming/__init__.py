"""Structured Streaming wrappers (SURVEY §2.12, §3).

A Volga *pipeline* in Streaming mode = a Structured Streaming query:
sources (file/kafka/rate/memory), ``withWatermark`` for bounded
out-of-orderness (reference src/runtime/watermark/manager.rs:29-170),
stateful per-row sliding windows (reference WindowOperator), and keyed
upsert / parquet / memory sinks (reference
src/runtime/operators/sink/sink_operator.rs:9-17).
"""

from volga_spark.streaming.runner import run_available_now_to_memory, upsert_by_key
from volga_spark.streaming.sources import chunked_file_stream
from volga_spark.streaming.stateful_window import sliding_window_stream

__all__ = [
    "run_available_now_to_memory",
    "upsert_by_key",
    "chunked_file_stream",
    "sliding_window_stream",
]
