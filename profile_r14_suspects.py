#!/usr/bin/env python
"""r14 optimization round — adjudicate the r13 touched-path regressions.

VERDICT r13 items #1/#4: q_hybrid_rrf (-38%), q_mix_pack (-26%),
q_approx_sketches. Protocol per the guide §1 + the host-burst discipline:
ONE tuned session, bench-identical materialize + _cleanup, interleaved
ABAB trials (old shape vs new shape of the operators r13 changed), plus a
per-leg decomposition of each query. Never judged from cross-run absolutes.

Old shapes reproduced inline from git 92b95de (the pre-optimization r12
code): bm25 doclen-join build, add_simhash join-back, bucket self-joins
for simhash/winnow candidates.
"""

from __future__ import annotations

import json
import os
import sys
import time
from collections.abc import Iterator

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from volga_spark.session import get_spark
from volga_spark.partitioning import widen_for_python
from volga_spark.operators.dedup import (
    _simhash_batch,
    add_signatures,
    simhash_candidates,
    winnow_candidate_pairs,
)
from volga_spark.operators.packing import (
    _with_tokens,
    context_order,
    int64_rank_expr,
    pack_boundaries,
    pack_sequences,
)
from volga_spark.operators.retrieval import (
    bm25_topk,
    bm25_topk_from_index,
    bm25_topk_oracle_sql,  # noqa: F401
    rrf_fuse,
    tokenize,
)
from volga_spark.operators.similarity import brute_force_topk
from volga_spark.tables import load_table
from volga_spark._pickle import register_by_value
import volga_spark.operators.dedup as _dedup_mod

register_by_value(_dedup_mod)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def materialize(df) -> int:
    row = df.select(
        F.bit_xor(
            F.xxhash64(*[F.col(c).cast("string") for c in df.columns])
        ).alias("h")
    ).collect()
    return len(row)


def _cleanup(spark) -> None:
    import gc

    from volga_spark.caching import release_cached_blocks

    release_cached_blocks(spark)
    gc.collect()


def timed(spark, label, fn):
    t0 = time.perf_counter()
    materialize(fn())
    dt = time.perf_counter() - t0
    _cleanup(spark)
    print(f"    {label}: {dt:.3f}s", flush=True)
    return dt


# --- old (r12 / 92b95de) operator shapes -------------------------------------


def bm25_topk_old(docs, queries, k=10, k1=1.2, b=0.75, id_col="doc_id"):
    """r12 shape: postings pinned, doclen derived+pinned, scorer joins doclen."""
    toks = tokenize(docs, id_col, "text")
    postings = (
        toks.groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=False)
    )
    doclen = (
        postings.groupBy(id_col)
        .agg(F.sum("tf").alias("dl"))
        .localCheckpoint(eager=False)
    )
    stats = doclen.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    return bm25_topk_from_index(
        (postings, doclen, stats), queries, k=k, k1=k1, b=b, id_col=id_col
    )


def add_simhash_old(df, text_col, id_col):
    """r12 shape: slim Python stage + join back onto the caller frame."""
    schema = f"{id_col} bigint, simhash bigint"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tok_bits: dict = {}
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "simhash": _simhash_batch(pdf[text_col], tok_bits),
                }
            )

    hashes = widen_for_python(df.select(id_col, text_col)).mapInPandas(
        gen, schema=schema
    )
    return df.join(hashes, id_col)


def context_order_old(docs, text_col="text", id_col="doc_id", domain_col="source"):
    d = _with_tokens(
        docs.select(id_col, text_col, F.col(domain_col).alias("domain")),
        text_col,
    )
    if "simhash" in d.columns:
        d = d.drop("simhash")
    d = add_simhash_old(d, text_col, id_col)
    d = d.withColumn("rank", int64_rank_expr("simhash"))
    return d.select(id_col, "domain", "n_tokens", "rank", "simhash")


def simhash_candidates_old(sim_df, id_col, bands=4, radius=None):
    """r12 shape (plain branch): banded rows checkpointed, bucket SELF-JOIN."""
    width = 64 // bands
    mask = (1 << width) - 1
    carry = [id_col, "simhash"] if radius is not None else [id_col]
    chunks = sim_df.select(
        *carry,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("simhash"), b * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("chunk"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bc"),
    ).select(*carry, "bc.band", "bc.chunk")
    chunks = chunks.localCheckpoint(eager=False)
    a = chunks.alias("a")
    bb = chunks.alias("b")
    joined = a.join(
        bb,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.chunk") == F.col("b.chunk"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    )
    if radius is None:
        return joined.select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        ).distinct()
    return (
        joined.select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= radius)
        .distinct()
    )


def winnow_candidate_pairs_old(fps, id_col="doc_id"):
    """r12 shape: fp self-join + per-doc counts joined back twice.
    (skew guard omitted: quiescent on this corpus — stats probe skipped to
    keep the A/B focused on the join-vs-group shape)."""
    fps = fps.localCheckpoint(eager=False)
    counts = fps.groupBy(id_col).agg(F.count("*").alias("n_fp"))
    a = fps.alias("a")
    b = fps.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .agg(F.count("*").alias("shared_fps"))
    )
    na = counts.select(
        F.col(id_col).alias("id_a"), F.col("n_fp").alias("n_a")
    )
    nb = counts.select(
        F.col(id_col).alias("id_b"), F.col("n_fp").alias("n_b")
    )
    return pairs.join(na, "id_a").join(nb, "id_b")


# --- query builders -----------------------------------------------------------

from volga_spark.workloads.retrieval import QUERIES, _K  # noqa: E402


def hybrid_query(spark, variant):
    docs = load_table(spark, SF_DIR, "documents")
    emb = load_table(spark, SF_DIR, "embeddings")
    queries = spark.createDataFrame(QUERIES, "query_id int, qtext string")
    fn = bm25_topk if variant == "new" else bm25_topk_old
    sparse = fn(docs, queries, k=_K).select(
        F.col("query_id").cast("bigint").alias("query_id"), "rank", "doc_id"
    )
    dense = brute_force_topk(
        emb, emb.filter("vec_id BETWEEN 1 AND 8"), k=_K
    ).select(
        F.col("query_id").cast("bigint").alias("query_id"),
        "rank",
        F.col("neighbor_id").alias("doc_id"),
    )
    return rrf_fuse([sparse, dense], k=_K)


def bm25_query(spark, variant):
    docs = load_table(spark, SF_DIR, "documents")
    queries = spark.createDataFrame(QUERIES, "query_id int, qtext string")
    fn = bm25_topk if variant == "new" else bm25_topk_old
    out = fn(docs, queries, k=_K)
    return out.select(
        "query_id", F.col("rank").cast("int").alias("rank"),
        "doc_id", "score_micro",
    )


def mix_pack_query(spark, variant):
    from volga_spark.workloads.packing import (
        SEQ_LEN,
        TOKEN_BUDGET,
        UP_BUDGET,
        UP_WEIGHTS,
        WEIGHTS,
    )
    from volga_spark.operators.objectives import fim_transform, span_corruption
    from volga_spark.operators.packing import (
        mixture_select,
        mixture_select_with_repeats,
    )

    docs = load_table(spark, SF_DIR, "documents")
    sel = mixture_select(docs, WEIGHTS, TOKEN_BUDGET)
    packed = pack_sequences(sel, SEQ_LEN).localCheckpoint(eager=False)
    pack_leg = packed.select(
        F.lit("pack").alias("leg"),
        F.col("doc_id").alias("id_a"),
        F.col("domain").alias("s1"),
        F.col("seq_id").cast("long").alias("v1"),
        F.col("seq_offset").cast("long").alias("v2"),
        F.col("doc_offset").cast("long").alias("v3"),
        F.col("span_len").cast("long").alias("v4"),
        F.lit(None).cast("string").alias("s2"),
    )
    bounds = pack_boundaries(packed)

    def bounds_select(b, leg):
        return b.select(
            F.lit(leg).alias("leg"),
            F.col("seq_id").cast("long").alias("id_a"),
            F.concat_ws(
                ",",
                F.transform(
                    "bounds",
                    lambda x: F.concat_ws(
                        ":",
                        x["start"].cast("string"),
                        x["len"].cast("string"),
                        x["doc_id"].cast("string"),
                    ),
                ),
            ).alias("s1"),
            F.col("n_docs").alias("v1"),
            F.col("filled").alias("v2"),
            F.lit(None).cast("long").alias("v3"),
            F.lit(None).cast("long").alias("v4"),
            F.lit(None).cast("string").alias("s2"),
        )

    bounds_leg = bounds_select(bounds, "bounds")
    ctx_fn = context_order if variant == "new" else context_order_old
    ctx_bounds = pack_boundaries(pack_sequences(ctx_fn(docs), SEQ_LEN))
    ctx_leg = bounds_select(ctx_bounds, "ctx")
    up = mixture_select_with_repeats(docs, UP_WEIGHTS, UP_BUDGET)
    up_leg = up.select(
        F.lit("upsample").alias("leg"),
        F.col("doc_id").alias("id_a"),
        F.col("domain").alias("s1"),
        F.col("copy_id").cast("long").alias("v1"),
        F.col("n_tokens").cast("long").alias("v2"),
        F.lit(None).cast("long").alias("v3"),
        F.lit(None).cast("long").alias("v4"),
        F.col("rank").alias("s2"),
    )
    fim = fim_transform(docs)
    fim_leg = fim.select(
        F.lit("fim").alias("leg"),
        F.col("doc_id").alias("id_a"),
        F.md5("fim_text").alias("s1"),
        F.col("n_tokens").alias("v1"),
        F.col("fim_applied").cast("long").alias("v2"),
        F.lit(None).cast("long").alias("v3"),
        F.lit(None).cast("long").alias("v4"),
        F.lit(None).cast("string").alias("s2"),
    )
    corr = span_corruption(docs)
    corr_leg = corr.select(
        F.lit("corrupt").alias("leg"),
        F.col("doc_id").alias("id_a"),
        F.md5("input_text").alias("s1"),
        F.col("n_corrupted").alias("v1"),
        F.col("n_tokens").alias("v2"),
        F.lit(None).cast("long").alias("v3"),
        F.lit(None).cast("long").alias("v4"),
        F.md5("target_text").alias("s2"),
    )
    return (
        pack_leg.unionByName(bounds_leg)
        .unionByName(ctx_leg)
        .unionByName(up_leg)
        .unionByName(fim_leg)
        .unionByName(corr_leg)
    )


def sketches_query(spark, variant):
    li = load_table(spark, SF_DIR, "lineitem")
    sketch = li.groupBy("l_returnflag").agg(
        F.expr("hll_sketch_estimate(hll_sketch_agg(l_partkey, 21))").alias(
            "exact_parts"
        ),
        F.percentile_approx("l_extendedprice", 0.5, 10_000_000).alias("p50"),
        F.percentile_approx("l_extendedprice", 0.99, 10_000_000).alias("p99"),
    ).select(
        F.lit("sketch").alias("leg"),
        F.col("l_returnflag").alias("grp"),
        F.lit(None).cast("long").alias("id_a"),
        F.lit(None).cast("long").alias("id_b"),
        F.col("exact_parts").cast("double").alias("v1"),
        F.col("p50").cast("double").alias("v2"),
        F.col("p99").cast("double").alias("v3"),
    )
    d = load_table(spark, SF_DIR, "documents")
    sigs = add_signatures(d, "text", "doc_id", k=64, n=3).localCheckpoint(
        eager=False
    )
    if variant == "new":
        sim = simhash_candidates(
            sigs.select("doc_id", "simhash"), "doc_id", bands=4, radius=3
        )
    else:
        sim = simhash_candidates_old(
            sigs.select("doc_id", "simhash"), "doc_id", bands=4, radius=3
        )
    simhash = sim.select(
        F.lit("simhash").alias("leg"),
        F.lit(None).cast("string").alias("grp"),
        "id_a",
        "id_b",
        F.col("hamming").cast("double").alias("v1"),
        F.lit(None).cast("double").alias("v2"),
        F.lit(None).cast("double").alias("v3"),
    )
    fps = sigs.select("doc_id", F.explode("winnow_fps").alias("fp"))
    if variant == "new":
        wpairs, _ = winnow_candidate_pairs(fps, "doc_id")
    else:
        wpairs = winnow_candidate_pairs_old(fps, "doc_id")
    winnow = wpairs.filter(
        F.col("shared_fps") * 10 >= F.least("n_a", "n_b") * 6
    ).select(
        F.lit("winnow").alias("leg"),
        F.lit(None).cast("string").alias("grp"),
        "id_a",
        "id_b",
        F.expr("CAST(shared_fps * 1000000 div least(n_a, n_b) AS DOUBLE)").alias(
            "v1"
        ),
        F.lit(None).cast("double").alias("v2"),
        F.lit(None).cast("double").alias("v3"),
    )
    return sketch.unionByName(simhash).unionByName(winnow)


# --- leg decompositions --------------------------------------------------------


def hybrid_legs(spark):
    docs = load_table(spark, SF_DIR, "documents")
    emb = load_table(spark, SF_DIR, "embeddings")
    queries = spark.createDataFrame(QUERIES, "query_id int, qtext string")
    out = {}
    out["sparse_new"] = timed(
        spark, "sparse leg (new bm25)", lambda: bm25_topk(docs, queries, k=_K)
    )
    out["sparse_old"] = timed(
        spark, "sparse leg (old bm25)",
        lambda: bm25_topk_old(docs, queries, k=_K),
    )
    out["dense"] = timed(
        spark,
        "dense leg",
        lambda: brute_force_topk(emb, emb.filter("vec_id BETWEEN 1 AND 8"), k=_K),
    )
    return out


def mix_pack_legs(spark):
    from volga_spark.workloads.packing import (
        SEQ_LEN,
        TOKEN_BUDGET,
        UP_BUDGET,
        UP_WEIGHTS,
        WEIGHTS,
    )
    from volga_spark.operators.objectives import fim_transform, span_corruption
    from volga_spark.operators.packing import (
        mixture_select,
        mixture_select_with_repeats,
    )

    docs = load_table(spark, SF_DIR, "documents")
    out = {}

    def pack_and_bounds():
        sel = mixture_select(docs, WEIGHTS, TOKEN_BUDGET)
        packed = pack_sequences(sel, SEQ_LEN).localCheckpoint(eager=False)
        return packed.select("doc_id", "seq_id").unionByName(
            pack_boundaries(packed).select(
                F.col("seq_id").alias("doc_id"), F.col("n_docs").alias("seq_id")
            )
        )

    out["pack+bounds"] = timed(spark, "pack+bounds", pack_and_bounds)
    out["ctx_new"] = timed(
        spark,
        "ctx leg (new add_simhash)",
        lambda: pack_boundaries(pack_sequences(context_order(docs), SEQ_LEN)),
    )
    out["ctx_old"] = timed(
        spark,
        "ctx leg (old add_simhash)",
        lambda: pack_boundaries(
            pack_sequences(context_order_old(docs), SEQ_LEN)
        ),
    )
    out["upsample"] = timed(
        spark,
        "upsample",
        lambda: mixture_select_with_repeats(docs, UP_WEIGHTS, UP_BUDGET),
    )
    out["fim"] = timed(spark, "fim", lambda: fim_transform(docs))
    out["corrupt"] = timed(spark, "corrupt", lambda: span_corruption(docs))
    return out


def main():
    rounds = int(os.environ.get("AB_ROUNDS", "4"))
    spark = get_spark("profile_r14")
    results: dict = {"legs": {}, "ab": {}}

    print("== warmup ==", flush=True)
    timed(spark, "warm hybrid", lambda: hybrid_query(spark, "new"))
    timed(spark, "warm mix_pack", lambda: mix_pack_query(spark, "new"))
    timed(spark, "warm sketches", lambda: sketches_query(spark, "new"))

    print("== leg decomposition: q_hybrid_rrf ==", flush=True)
    results["legs"]["hybrid"] = hybrid_legs(spark)
    print("== leg decomposition: q_mix_pack ==", flush=True)
    results["legs"]["mix_pack"] = mix_pack_legs(spark)

    for qname, builder in (
        ("hybrid", hybrid_query),
        ("bm25", bm25_query),
        ("mix_pack", mix_pack_query),
        ("sketches", sketches_query),
    ):
        print(f"== ABAB: {qname} (old vs new, {rounds} rounds) ==", flush=True)
        olds, news = [], []
        for r in range(rounds):
            olds.append(
                timed(spark, f"{qname} old r{r}", lambda: builder(spark, "old"))
            )
            news.append(
                timed(spark, f"{qname} new r{r}", lambda: builder(spark, "new"))
            )
        results["ab"][qname] = {"old": olds, "new": news}
        import statistics

        print(
            f"  {qname}: old med {statistics.median(olds):.3f} "
            f"min {min(olds):.3f} | new med {statistics.median(news):.3f} "
            f"min {min(news):.3f}",
            flush=True,
        )

    with open("/tmp/profile_r14_suspects.json", "w") as fh:
        json.dump(results, fh, indent=1)
    print("-> /tmp/profile_r14_suspects.json", flush=True)


if __name__ == "__main__":
    main()
