"""Similarity-search workloads over `embeddings` (array<float>, 64-dim).

Cosine arithmetic runs in double precision via sequential left-fold on both
engines (Spark F.aggregate ≡ DuckDB list_dot_product over DOUBLE[]), so
scores are bit-identical and rankings compare exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from volga_spark.operators.similarity import (
    blocked_neardup_pairs,
    brute_force_topk,
    lsh_topk,
)
from volga_spark.tables import load_table
from volga_spark.workloads import workload

_DUCK_COS = (
    "list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))"
    " / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))"
    " * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))))"
)


@workload(
    "q_ann_brute_topk",
    oracle=f"""
        WITH scored AS (
            SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                   {_DUCK_COS} AS score
            FROM embeddings a JOIN embeddings b ON b.vec_id != a.vec_id
            WHERE a.vec_id < 10
        ),
        ranked AS (
            SELECT query_id, neighbor_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY score DESC, neighbor_id) AS rank
            FROM scored
        )
        SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank
        FROM ranked WHERE rank <= 5
    """,
    tags=("similarity",),
)
def q_ann_brute_topk(spark, sf_dir):
    """Exact brute-force cosine top-5 for 10 query vectors (the ANN
    correctness baseline; broadcast queries, map-side scoring)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return brute_force_topk(emb, queries, k=5).select(
        "query_id", "neighbor_id", "rank"
    )


@workload(
    "q_embed_neardup",
    oracle=f"""
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM embeddings a JOIN embeddings b
          ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE {_DUCK_COS} >= 0.3
    """,
    tags=("similarity", "dedup"),
)
def q_embed_neardup(spark, sf_dir):
    """Embedding near-duplicate pairs, blocked by label (cosine ≥ 0.3 — the
    synthetic embeddings are near-orthogonal, so 0.3 is the `related pair`
    band and yields a non-trivial result set at every SF).
    At scale the block key becomes an LSH band — identical join shape."""
    emb = load_table(spark, sf_dir, "embeddings")
    return blocked_neardup_pairs(emb, "label", 0.3)


_DUCK_BRUTE_TOPK = f"""
        WITH scored AS (
            SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                   {_DUCK_COS} AS score
            FROM embeddings a JOIN embeddings b ON b.vec_id != a.vec_id
            WHERE a.vec_id < 10
        ),
        ranked AS (
            SELECT query_id, neighbor_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY score DESC, neighbor_id) AS rank
            FROM scored
        ),
        top5 AS (
            SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank
            FROM ranked WHERE rank <= 5
        )
        SELECT 'lsh' AS method, * FROM top5
        UNION ALL
        SELECT 'ivf' AS method, * FROM top5
"""


@workload(
    "q_ann_lsh_topk",
    oracle=_DUCK_BRUTE_TOPK,
    tags=("similarity", "approx"),
)
def q_ann_lsh_topk(spark, sf_dir):
    """Both index-accelerated ANN paths, DRIVER-ORACLED against the exact
    brute-force top-5 (r06 verdict item #2) — each leg is configured at a
    recall-1 operating point so the full index machinery (signatures,
    banding join, quantizer training, list assignment, pruned probing,
    ranking) must reproduce the exact answer:

    - ``lsh``: random-hyperplane bucketing at 16 bands × 1 plane —
      OR-amplified until the candidate-miss probability is ≤ (θ/π)^16
      (≈ 1.5e-5 even for orthogonal pairs, ~1e-6 at this corpus's top-5
      cosines), i.e. recall 1 on any realizable draw of this corpus.
    - ``ivf``: inverted-file with n_probe = n_lists — exhaustive probing is
      exact BY CONSTRUCTION (every vector lives in exactly one list), so
      this pins the train→assign→probe→score pipeline losing nothing.

    The recall/pruning trade-off at REAL operating points (n_probe < lists,
    wider bands, PQ compression) is measured in tests/test_similarity.py;
    the genuinely approximate IVF-PQ path is the 'ivfpq' rows-only leg of
    q_approx_sketches."""
    from volga_spark.operators.similarity import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    lsh = lsh_topk(emb, queries, k=5, n_planes=16, bands=16, dim=64).select(
        F.lit("lsh").alias("method"), "query_id", "neighbor_id", "rank"
    )
    ivf = ivf_topk(emb, queries, k=5, n_lists=16, n_probe=16).select(
        F.lit("ivf").alias("method"), "query_id", "neighbor_id", "rank"
    )
    return lsh.unionAll(ivf)
