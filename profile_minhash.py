#!/usr/bin/env python
"""Leg-level profile of q_dedup_approx_pairs (r09 verdict item #1).

Measures, in a bench-identical tuned session with bench-identical warm-up
and per-trial cleanup:
  - sigs: the add_minhash mapInPandas signature pass alone
  - cands: signature pass + LSH banding join
  - full: the whole query (sigs + banding + exact-Jaccard verify)
  - full_inseq: the whole query run immediately after the 10 queries that
    precede it in bench.py's sequence (its slot is #11), to expose any
    warm-sequence/cold-sequence gap vs the standalone trials above

Per-trial host telemetry (loadavg, /proc/stat steal delta) rides along so
the numbers are adjudicable against ambient load.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import BENCH_QUERIES, _Telemetry, _cleanup, materialize  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    from volga_spark.operators.dedup import add_minhash, lsh_candidate_pairs
    from volga_spark.session import get_spark
    from volga_spark.tables import load_table
    from volga_spark.workloads import load_all

    spark = get_spark("profile_minhash")
    reg = load_all()
    # bench-identical warm-up
    reg["q_scalar_exprs"].fn(spark, SF).count()
    reg["q_ml_cate_full"].fn(spark, "/root/testdata/sf0.001").count()
    _cleanup(spark)

    tele = _Telemetry()

    def sigs_df():
        d = load_table(spark, SF, "documents")
        return add_minhash(d, "text", "doc_id", k=64, n=3).select(
            "doc_id", "signature"
        )

    def cands_df():
        d = load_table(spark, SF, "documents")
        sigs = add_minhash(d, "text", "doc_id", k=64, n=3)
        return lsh_candidate_pairs(
            sigs.select("doc_id", "signature"), "doc_id", bands=16, rows=4
        )

    legs = {
        "sigs": sigs_df,
        "cands": cands_df,
        "full": lambda: reg["q_dedup_approx_pairs"].fn(spark, SF),
    }
    out = {}
    for name, fn in legs.items():
        ts = []
        for _ in range(4):
            dt = tele.run(name, "standalone", lambda: materialize(fn()))
            _cleanup(spark)
            ts.append(round(dt, 3))
        out[name] = ts

    # in-sequence replica: run the 10 preceding bench queries (1 trial
    # each — enough to populate whatever state their slots leave), then
    # the target twice, mirroring its bench slot
    idx = BENCH_QUERIES.index("q_dedup_approx_pairs")
    for prev in BENCH_QUERIES[:idx]:
        tele.run(prev, "preceding", lambda: materialize(reg[prev].fn(spark, SF)))
        _cleanup(spark)
    ts = []
    for _ in range(2):
        dt = tele.run(
            "full_inseq",
            "inseq",
            lambda: materialize(reg["q_dedup_approx_pairs"].fn(spark, SF)),
        )
        _cleanup(spark)
        ts.append(round(dt, 3))
    out["full_inseq"] = ts

    print(json.dumps({"legs": out, "trials": tele.trials}, indent=1))


if __name__ == "__main__":
    main()
