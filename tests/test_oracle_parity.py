"""Every registered workload must match its DuckDB oracle at sf0.001.

This is the in-repo mirror of the driver's CORRECTNESS gate (driver runs the
same comparison at sf0.01).
"""

from __future__ import annotations

import pytest

from volga_spark.oracle import compare_frames, run_oracle
from volga_spark.workloads import load_all

REG = load_all()
ORACLED = [name for name, wl in REG.items() if wl.oracle is not None]


@pytest.mark.parametrize("name", ORACLED)
def test_workload_matches_oracle(spark, sf_dir, name):
    wl = REG[name]
    sdf = wl.fn(spark, sf_dir)
    spark_pdf = sdf.toPandas()
    oracle_pdf = run_oracle(wl.oracle, sf_dir)
    problems = compare_frames(spark_pdf, oracle_pdf)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_all_workloads_return_rows(spark, sf_dir):
    for name, wl in REG.items():
        df = wl.fn(spark, sf_dir)
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert len(e.queries()) >= len(e.oracle_sql())
