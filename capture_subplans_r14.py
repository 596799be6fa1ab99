#!/usr/bin/env python
"""Capture the r14-touched SUBPLANS that hide behind lazy localCheckpoints
in the full-query plans:

- bm25_postings: the pinned postings build inside the one-shot bm25_topk
  (where the r13 dl window / r14 map-side dl carry lives)
- edges: the all_pairs_jaccard pruned-edge pipeline feeding q_dedup_clusters
  (where the n_sh count window / r14 map-side carry lives)
- winnow_pairs / exact_jaccard: the other window-carry → map-side-carry sites

Usage: python capture_subplans_r14.py <suffix> — writes
plans/r14/subplan_<name>_<suffix>.txt.
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
    outdir = os.path.join(HERE, "plans", "r14")
    from pyspark.sql import functions as F

    from volga_spark.functions.tokenize import explode_terms
    from volga_spark.operators.dedup import (
        add_signatures,
        all_pairs_jaccard,
        exact_jaccard_pairs,
        winnow_candidate_pairs,
    )
    from volga_spark.session import get_spark
    from volga_spark.tables import load_table

    spark = get_spark("capture_subplans_r14")
    d = load_table(spark, SF, "documents")

    # the postings subtree exactly as bm25_topk builds it, WITHOUT the pin
    # (so the full build plan is visible)
    import volga_spark.operators.retrieval as rtr

    # Spark 4: instances are pyspark.sql.classic.dataframe.DataFrame —
    # patch the concrete class, not the abstract base
    DF = type(d)
    orig_ckpt = DF.localCheckpoint
    try:
        DF.localCheckpoint = lambda self, eager=True: self  # type: ignore
        queries = spark.createDataFrame(
            [(1, "spark window agg")], "query_id int, qtext string"
        )
        bm25_full = rtr.bm25_topk(d, queries, k=10)
    finally:
        DF.localCheckpoint = orig_ckpt

    sigs = add_signatures(d, "text", "doc_id", k=64, n=3)
    fps = sigs.select(
        "doc_id",
        F.size("winnow_fps").alias("n_fp"),
        F.explode("winnow_fps").alias("fp"),
    )
    try:
        wpairs = winnow_candidate_pairs(fps, "doc_id")[0]
    except TypeError:
        # pre-r14 signature (before-capture): no n_fp carry support
        wpairs = winnow_candidate_pairs(
            sigs.select("doc_id", F.explode("winnow_fps").alias("fp")),
            "doc_id",
        )[0]

    pairs = d.select(F.col("doc_id").alias("id_a")).withColumn(
        "id_b", F.col("id_a") + 1
    )
    frames = {
        "bm25_nopin": bm25_full,
        "edges": all_pairs_jaccard(
            d, "text", "doc_id", n=3, max_shingle_freq=64
        ).filter(F.col("jaccard") >= 0.7),
        "winnow_pairs": wpairs,
        "exact_jaccard": exact_jaccard_pairs(d, pairs, "text", "doc_id", n=3),
    }
    os.makedirs(outdir, exist_ok=True)
    for name, df in frames.items():
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"subplan_{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"{name}: {path} ({buf.getvalue().count('Exchange')} Exchange mentions)")


if __name__ == "__main__":
    main()
