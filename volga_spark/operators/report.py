"""Corpus statistics report — the dataset-card numbers in one pass.

Every curation run ends with the same questions: how many documents and
tokens per source/language, how much exact duplication, what fraction
passes the quality gate. This operator answers them with ONE aggregation
over one scan (all inputs are native per-doc expressions from
`operators/text.py`), grouped by the report dimensions.

Determinism discipline: every reported statistic is either an exact
integer (counts, token sums, distinct fingerprints) or a single IEEE
division of two exact integers (rates, means) — so the report is
hash-comparable against the DuckDB oracle, like every other exact
surface here. Quantile-style stats belong to `approxQuantile`/sketch
territory and are deliberately not in the hash-checked report.

Scale: one shuffle on the grouping keys with map-side partials;
`count_distinct` of 16-byte fingerprints rides the same exchange
(Spark plans distinct-agg via expand — still one pass over the scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from volga_spark.operators.text import (
    fingerprint,
    gopher_quality_flags,
    normalized_fingerprint,
    token_count,
)


def corpus_report(
    docs: DataFrame,
    text_col: str = "text",
    group_by: list[str] | None = None,
) -> DataFrame:
    """Per-group dataset-card statistics.

    Columns: n_docs, n_tokens, avg_tokens, distinct_docs (exact-content
    dedup groups), distinct_norm_docs (whitespace/case-normalized),
    exact_dup_rate (1 − distinct/docs), gopher_pass_rate.
    """
    group_by = group_by or []
    flags = gopher_quality_flags(text_col)
    per_doc = docs.select(
        *group_by,
        token_count(text_col).cast("bigint").alias("__n_tok"),
        fingerprint(text_col).alias("__fp"),
        normalized_fingerprint(text_col).alias("__nfp"),
        flags["gopher_pass"].cast("bigint").alias("__gp"),
    )
    agg = per_doc.groupBy(*group_by).agg(
        F.count("*").alias("n_docs"),
        F.sum("__n_tok").alias("n_tokens"),
        F.count_distinct("__fp").alias("distinct_docs"),
        F.count_distinct("__nfp").alias("distinct_norm_docs"),
        F.sum("__gp").alias("gopher_pass"),
    )
    return agg.select(
        *group_by,
        "n_docs",
        "n_tokens",
        (F.col("n_tokens") / F.col("n_docs")).alias("avg_tokens"),
        "distinct_docs",
        "distinct_norm_docs",
        (
            F.lit(1.0) - F.col("distinct_docs") / F.col("n_docs")
        ).alias("exact_dup_rate"),
        (F.col("gopher_pass") / F.col("n_docs")).alias("gopher_pass_rate"),
    )


def skew_report(
    df: DataFrame,
    keys: list[str],
    top_k: int = 20,
) -> DataFrame:
    """Heavy-hitter diagnostic for a prospective shuffle key: the top-k
    key values by row count with their share of the table — the number
    that tells you whether a join/agg on ``keys`` needs AQE skew
    splitting, salting (`partitioning.salted_count_distinct` discipline),
    or a broadcast instead.

    One groupBy + one global count; rates are single IEEE divisions of
    exact integers (hash-comparable vs DuckDB like `corpus_report`).
    Rule of thumb at 1000 executors: a key holding >1/width of the rows
    (share > ~0.1%) stalls its reducer; share > a few % means the plan,
    not the cluster, must change.
    """
    total = df.count()
    counts = df.groupBy(*keys).agg(F.count("*").alias("n"))
    return (
        counts.orderBy(F.col("n").desc(), *[F.col(k).asc() for k in keys])
        .limit(top_k)
        .select(
            *keys,
            "n",
            (F.col("n") / F.lit(total)).alias("share"),
        )
    )
