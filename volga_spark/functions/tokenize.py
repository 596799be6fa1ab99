"""THE whitespace token definition — shared by BM25 retrieval
(`operators/retrieval`), mixture selection / sequence packing
(`operators/packing`), and their DuckDB oracle twins.

It lives in exactly one module because the definition is load-bearing
across tiers: the retrieval index's document lengths and the packing
tier's token budgets must count the same tokens, and each Spark
expression here has a DuckDB twin that must stay textually in lock-step
for the hash-compared oracles. (The `operators/text` analysis column uses
a plain single-space split — the corpus there is single-space separated
by construction; this regex split is the general-whitespace contract.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_SPLIT = r"\s+"


def split_terms(text: str | Column) -> Column:
    """array<string> of non-empty whitespace-separated tokens."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.trim(c), TOKEN_SPLIT), lambda x: x != "")


def explode_terms(text: str | Column) -> Column:
    """One row per token (pair with select/explode). Equivalent to
    exploding :func:`split_terms`."""
    return F.explode(split_terms(text))


def n_tokens(text: str | Column) -> Column:
    """BIGINT token count; 0 for empty/whitespace-only text."""
    return F.size(split_terms(text)).cast("bigint")


def terms_sql(text_sql: str) -> str:
    """DuckDB twin of :func:`split_terms` (a LIST expression)."""
    return (
        f"list_filter(string_split_regex(trim({text_sql}), '\\s+'),"
        f" x -> x <> '')"
    )


def n_tokens_sql(text_sql: str) -> str:
    """DuckDB twin of :func:`n_tokens`."""
    return f"CAST(len({terms_sql(text_sql)}) AS BIGINT)"
