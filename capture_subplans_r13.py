#!/usr/bin/env python
"""Capture the banding-operator SUBPLANS (they hide behind the verify
stage's pairs checkpoint in the full-query plans) for the r13 grouped-
pair-expansion rewrite. Usage: python capture_subplans_r13.py <suffix>
— writes plans/r13/subplan_<name>_<suffix>.txt next to THIS script's
repo (run it from the old worktree to get the old shapes).
"""
import io
import os
import sys
from contextlib import redirect_stdout

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    suffix = sys.argv[1]
    outdir = sys.argv[2] if len(sys.argv) > 2 else os.path.join(HERE, "plans", "r13")
    from pyspark.sql import functions as F

    from volga_spark.operators.dedup import (
        add_minhash,
        add_signatures,
        lsh_candidate_pairs,
        simhash_candidates,
        winnow_candidate_pairs,
    )
    from volga_spark.session import get_spark
    from volga_spark.tables import load_table

    spark = get_spark("capture_subplans_r13")
    d = load_table(spark, SF, "documents")

    sigs = add_signatures(d, "text", "doc_id", k=64, n=3).localCheckpoint(
        eager=False
    )
    frames = {
        "lsh_pairs": lsh_candidate_pairs(
            add_minhash(d, "text", "doc_id", k=64, n=3).select(
                "doc_id", "signature"
            ),
            "doc_id",
            bands=16,
            rows=4,
        ),
        "simhash_pairs": simhash_candidates(
            sigs.select("doc_id", "simhash"), "doc_id", bands=4, radius=3
        ),
        "winnow_pairs": winnow_candidate_pairs(
            sigs.select("doc_id", F.explode("winnow_fps").alias("fp")),
            "doc_id",
        )[0],
    }
    os.makedirs(outdir, exist_ok=True)
    for name, df in frames.items():
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"subplan_{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"{name}: {path}")


if __name__ == "__main__":
    main()
