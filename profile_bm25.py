#!/usr/bin/env python
"""Leg-level A/B profile of q_bm25_topk / q_hybrid_rrf (r13 optimization
round). Interleaved ABAB trials in ONE tuned session (the documented host
bursts hit both sides), bench-identical materialization + cleanup.

Legs:
  - bm25_full: the whole q_bm25_topk query
  - hybrid_full: the whole q_hybrid_rrf query
  - index: the bm25_index postings build alone (materialized)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import _Telemetry, _cleanup, materialize  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    from volga_spark.session import get_spark
    from volga_spark.workloads import load_all

    spark = get_spark("profile_bm25")
    reg = load_all()
    reg["q_scalar_exprs"].fn(spark, SF).count()
    reg["q_bm25_topk"].fn(spark, "/root/testdata/sf0.001").count()
    _cleanup(spark)

    tele = _Telemetry()
    legs = {
        "bm25_full": lambda: reg["q_bm25_topk"].fn(spark, SF),
        "hybrid_full": lambda: reg["q_hybrid_rrf"].fn(spark, SF),
    }
    out = {}
    for rnd in range(4):
        for name, fn in legs.items():
            dt = tele.run(name, f"r{rnd}", lambda: materialize(fn()))
            _cleanup(spark)
            out.setdefault(name, []).append(round(dt, 3))
    for name, ts in out.items():
        print(f"{name}: min={min(ts):.3f} trials={ts}")
    print(tele.trials)


if __name__ == "__main__":
    main()
