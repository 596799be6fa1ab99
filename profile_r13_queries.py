#!/usr/bin/env python
"""Bench-style subset profiler for the r13 optimization round.

Runs the named queries (argv, default: the r13-touched set) with the
EXACT bench methodology — tuned session, bench warm-up subset, bench
materialization (xxhash64 over every column), per-trial cleanup, N
trials, min reported — so standalone numbers are comparable across two
back-to-back invocations (old vs new worktree) on a quiet host. Prints
one line per query plus the per-trial telemetry (load / steal) so a
host burst is visible in the output itself.

Usage: python profile_r13_queries.py [-n TRIALS] [query ...]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import _Telemetry, _cleanup, materialize  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

DEFAULT = [
    "q_dedup_approx_pairs",
    "q_approx_sketches",
    "q_dedup_substring_spans",
    "q_bm25_topk",
    "q_hybrid_rrf",
    "q_sft_prep",
]


def main():
    args = sys.argv[1:]
    trials = 4
    if args and args[0] == "-n":
        trials = int(args[1])
        args = args[2:]
    names = args or DEFAULT

    from volga_spark.session import get_spark
    from volga_spark.workloads import load_all

    spark = get_spark("profile_r13")
    reg = load_all()
    # bench-equivalent warm-up (JVM, parquet footers, python workers)
    reg["q_scalar_exprs"].fn(spark, SF).count()
    reg["q_ml_cate_full"].fn(spark, "/root/testdata/sf0.001").count()
    _cleanup(spark)

    tele = _Telemetry()
    out = {}
    for rnd in range(trials):
        for name in names:
            spark.sparkContext.setJobDescription(f"{name} r{rnd}")
            dt = tele.run(
                name, f"r{rnd}", lambda: materialize(reg[name].fn(spark, SF))
            )
            spark.sparkContext.setJobDescription(None)
            _cleanup(spark)
            out.setdefault(name, []).append(round(dt, 3))
    for name, ts in out.items():
        print(f"{name}: min={min(ts):.3f} trials={ts}")
    print(tele.trials)


if __name__ == "__main__":
    main()
