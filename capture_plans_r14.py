#!/usr/bin/env python
"""Capture .explain('formatted') for named queries into plans/r14/.

Usage: python capture_plans_r14.py <suffix> [query ...]
Writes plans/r14/<query>_<suffix>.txt. Plans are captured UN-executed
(lazy localCheckpoints still show their full upstream subtree), matching
the *_before.txt capture convention of this round.
"""
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    suffix = sys.argv[1]
    names = sys.argv[2:]
    from volga_spark.session import get_spark
    from volga_spark.workloads import load_all

    spark = get_spark("capture_plans_r14")
    reg = load_all()
    outdir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r14")
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = reg[name].fn(spark, SF)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        n_ex = buf.getvalue().count("Exchange")
        print(f"{name}: {path} ({n_ex} Exchange mentions)")


if __name__ == "__main__":
    main()
