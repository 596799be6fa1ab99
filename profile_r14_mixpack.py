#!/usr/bin/env python
"""r14 — q_mix_pack shared-scan A/B (r13 verdict item #5).

Variant 'shared' pins ONE (doc_id, text, source) projection of the corpus
(lazy localCheckpoint) and feeds all six legs from it; 'base' is the
registry query as-is. Interleaved ABAB, bench-identical materialize +
cleanup, plus a result-hash equality check between the variants.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from volga_spark.session import get_spark
from volga_spark.tables import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = int(os.environ.get("AB_ROUNDS", "4"))


def result_hash(df):
    rows = df.select(
        F.bit_xor(
            F.xxhash64(*[F.col(c).cast("string") for c in df.columns])
        ).alias("h"),
        F.count("*").alias("n"),
    ).collect()
    return (rows[0]["h"], rows[0]["n"])


def _cleanup(spark):
    import gc

    from volga_spark.caching import release_cached_blocks

    release_cached_blocks(spark)
    gc.collect()


def build(spark, variant):
    from volga_spark.workloads.packing import q_mix_pack
    import volga_spark.workloads.packing as pk

    if variant == "base":
        return q_mix_pack.fn(spark, SF_DIR) if hasattr(q_mix_pack, "fn") else q_mix_pack(spark, SF_DIR)
    # shared: monkey-load docs once, pinned
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "text", "source"
    ).localCheckpoint(eager=False)
    orig = pk.load_table
    try:
        pk.load_table = lambda s, sd, name: docs if name == "documents" else orig(s, sd, name)
        out = q_mix_pack.fn(spark, SF_DIR) if hasattr(q_mix_pack, "fn") else q_mix_pack(spark, SF_DIR)
    finally:
        pk.load_table = orig
    return out


def main():
    spark = get_spark("profile_r14_mixpack")
    print("warmups", flush=True)
    h0 = result_hash(build(spark, "base"))
    _cleanup(spark)
    h1 = result_hash(build(spark, "shared"))
    _cleanup(spark)
    print(f"hash base={h0} shared={h1} equal={h0 == h1}", flush=True)
    res = {"base": [], "shared": []}
    for r in range(ROUNDS):
        for v in ("base", "shared"):
            t0 = time.perf_counter()
            result_hash(build(spark, v))
            dt = time.perf_counter() - t0
            _cleanup(spark)
            res[v].append(dt)
            print(f"r{r} {v}: {dt:.3f}s", flush=True)
    for v, ts in res.items():
        print(
            f"{v}: med {statistics.median(ts):.3f} min {min(ts):.3f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
