"""ROWS-frame streaming window — oracle parity for the de-registered
``q_stream_sliding_rows``.

The driver's correctness gate records at most 50 registry rows (r04
registered 51 and this query silently got no row), so the ROWS-frame
streaming leg lives outside the registry and keeps full oracle coverage
here instead — the exact same DuckDB comparison the driver runs.
"""

from __future__ import annotations

from volga_spark.oracle import compare_frames, run_oracle
from volga_spark.workloads.streaming import (
    STREAM_SLIDING_ROWS_ORACLE,
    q_stream_sliding_rows,
)


def test_stream_sliding_rows_matches_oracle(spark, sf_dir):
    spark_pdf = q_stream_sliding_rows(spark, sf_dir).toPandas()
    oracle_pdf = run_oracle(STREAM_SLIDING_ROWS_ORACLE, sf_dir)
    problems = compare_frames(spark_pdf, oracle_pdf)
    assert not problems, "; ".join(problems)
