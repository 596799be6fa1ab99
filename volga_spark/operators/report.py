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
