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
