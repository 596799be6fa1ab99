"""BM25 retrieval workload (driver-oracled).

Fixed literal query set (vocabulary words from the synthetic corpus, one
rare term among them) → top-10 per query. Output (query_id, rank, doc_id,
score_micro) is exact-integer (quantized per-term contributions summed as
BIGINT — operators/retrieval module doc) so the DuckDB hash-compare is
bit-stable despite ln() in the scoring formula.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from volga_spark.operators.retrieval import bm25_topk, bm25_topk_oracle_sql
from volga_spark.tables import load_table
from volga_spark.workloads import workload

# (query_id, qtext): mixed common terms + the rare 'dup' term; fixed
# literals so Spark and DuckDB score the identical workload.
QUERIES = [
    (1, "spark window agg"),
    (2, "hash join merge sort"),
    (3, "dup line"),
    (4, "fast scan filter column"),
    (5, "stream batch value"),
    (6, "customer order table"),
    (7, "dup merge batch"),
    (8, "key value part row group"),
]
_K = 10

_QUERY_VALUES = ", ".join(f"({i}, '{t}')" for i, t in QUERIES)


@workload(
    "q_bm25_topk",
    oracle=bm25_topk_oracle_sql(_QUERY_VALUES, k=_K),
    tags=("retrieval", "text"),
)
def q_bm25_topk(spark, sf_dir):
    """Distributed BM25 top-k over documents: inverted-index build
    (map-side-combinable postings/doclen shuffles), broadcast query-term
    prune before df aggregation, window top-k per query."""
    docs = load_table(spark, sf_dir, "documents")
    queries = spark.createDataFrame(QUERIES, "query_id int, qtext string")
    out = bm25_topk(docs, queries, k=_K)
    return out.select(
        "query_id", F.col("rank").cast("int").alias("rank"),
        "doc_id", "score_micro",
    )


# --- hybrid retrieval --------------------------------------------------------

from volga_spark.operators.retrieval import rrf_fuse, rrf_fuse_oracle_sql  # noqa: E402
from volga_spark.operators.similarity import brute_force_topk  # noqa: E402

# query ids 1..8 double as embedding ids: text query i pairs with
# embeddings.vec_id == i (the bi-encoder serving shape, fixed literals)
_ANN_ORACLE = """
    WITH scored AS (
        SELECT a.vec_id AS query_id, b.vec_id AS doc_id,
               list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
               / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
                  * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))) AS score
        FROM embeddings a JOIN embeddings b ON b.vec_id != a.vec_id
        WHERE a.vec_id BETWEEN 1 AND 8
    )
    SELECT CAST(query_id AS BIGINT) AS query_id,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY score DESC, doc_id) AS INT) AS rank,
           doc_id
    FROM scored
    QUALIFY rank <= 10
"""

_BM25_LEG = f"""
    SELECT CAST(query_id AS BIGINT) AS query_id, rank, doc_id
    FROM ({bm25_topk_oracle_sql(_QUERY_VALUES, k=_K)})
"""


@workload(
    "q_hybrid_rrf",
    oracle=rrf_fuse_oracle_sql([_BM25_LEG, _ANN_ORACLE], k=_K),
    tags=("retrieval", "hybrid"),
)
def q_hybrid_rrf(spark, sf_dir):
    """Hybrid retrieval, fully oracled end to end: the BM25 sparse ranking
    (integer micro-unit scores) fused with the exact-cosine dense ranking
    (rank-only surface, the q_ann_brute_topk discipline) via pure-integer
    reciprocal-rank fusion — every stage deterministic, the whole
    composition hash-compared against DuckDB."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    queries = spark.createDataFrame(QUERIES, "query_id int, qtext string")
    sparse = bm25_topk(docs, queries, k=_K).select(
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
