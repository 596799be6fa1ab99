"""Nanosecond-timestamp detection over both parquet layouts.

The driver testdata is single-file parquet; derived/scaled copies (scale
probe, compaction output, any Spark write) are DIRECTORIES of part files.
`tables._nanos_ts_columns` must detect timestamp[ns] columns in both, and
`load_table` must deliver identical µs-truncated values either way.
"""

from __future__ import annotations

import os
from datetime import timezone

import pyarrow as pa
import pyarrow.parquet as pq

from volga_spark.tables import _nanos_ts_columns, load_table

# 1.5µs past the second: truncation (not rounding) to µs must keep ...500µs
_NS_VALUES = [1_700_000_000_000_000_500, 1_700_000_001_999_999_999]


def _ns_table() -> pa.Table:
    return pa.table(
        {
            "event_id": pa.array([1, 2], type=pa.int64()),
            "ts": pa.array(_NS_VALUES, type=pa.timestamp("ns")),
        }
    )


def test_detects_ns_column_in_single_file(tmp_path):
    p = str(tmp_path / "events.parquet")
    pq.write_table(_ns_table(), p)
    assert _nanos_ts_columns(p) == ("ts",)


def test_detects_ns_column_in_directory_dataset(tmp_path):
    d = str(tmp_path / "events.parquet")
    os.makedirs(d)
    # Spark-write shape: part files + a _SUCCESS marker
    pq.write_table(_ns_table().slice(0, 1), f"{d}/part-00000.snappy.parquet")
    pq.write_table(_ns_table().slice(1, 1), f"{d}/part-00001.snappy.parquet")
    open(f"{d}/_SUCCESS", "w").close()
    assert _nanos_ts_columns(d) == ("ts",)


def test_empty_directory_detects_nothing(tmp_path):
    d = str(tmp_path / "empty.parquet")
    os.makedirs(d)
    assert _nanos_ts_columns(d) == ()


def test_load_table_equal_across_layouts(spark, tmp_path):
    single = tmp_path / "single"
    single.mkdir()
    pq.write_table(_ns_table(), str(single / "events.parquet"))

    as_dir = tmp_path / "dirset"
    d = str(as_dir / "events.parquet")
    os.makedirs(d)
    pq.write_table(_ns_table().slice(0, 1), f"{d}/part-00000.snappy.parquet")
    pq.write_table(_ns_table().slice(1, 1), f"{d}/part-00001.snappy.parquet")

    rows_single = {
        (r.event_id, r.ts)
        for r in load_table(spark, str(single), "events").collect()
    }
    rows_dir = {
        (r.event_id, r.ts)
        for r in load_table(spark, str(as_dir), "events").collect()
    }
    assert rows_single == rows_dir
    # µs TRUNCATION of the ns values, matching DuckDB's read of the same file
    expected_us = {v // 1000 for v in _NS_VALUES}
    got_us = {
        int(r.ts.replace(tzinfo=timezone.utc).timestamp() * 1_000_000)
        for r in load_table(spark, str(single), "events").collect()
    }
    assert got_us == expected_us
