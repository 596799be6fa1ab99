"""Document chunking + sequence packing for training-data pipelines.

Two pre-training ops every LLM data pipeline runs after curation:

- ``chunk_documents``: split each document into fixed-size token windows
  with overlap (the context-window splitter). Fully NATIVE — split /
  sequence / slice / posexplode, zero Python — so at 100 TB it is one
  map-side pass fused into the scan, and Catalyst prunes it to the two
  input columns. Exactly SQL-expressible, so it is DuckDB-oracle-checked.

- ``pack_sequences``: greedily pack curated documents into fixed
  token-budget training sequences (first-fit in deterministic ``id_col``
  order — the classic "concat then split" packing, except documents never
  straddle bins). The greedy reset-on-threshold scan is inherently
  sequential, so it runs per (source, shard) group via ``applyInPandas``:
  each group packs independently in one numpy pass, and parallelism comes
  from sharding (``n_shards`` × sources groups), not from breaking the
  scan's determinism. Per-group state is O(rows in group); no driver
  collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Explode each document into overlapping token windows.

    Window starts step by ``stride = chunk_tokens - overlap``; a start is
    generated only while more than ``overlap`` tokens remain (a final
    window that would sit entirely inside the previous one is redundant).
    The last window may be short. Output: ``id_col``, ``chunk_id`` (0-based
    per doc), ``chunk_text``, ``tok_start`` (0-based), ``chunk_n_tokens``.
    """
    if overlap >= chunk_tokens:
        raise ValueError(f"overlap={overlap} must be < chunk_tokens={chunk_tokens}")
    stride = chunk_tokens - overlap
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    # last valid start: the largest stride multiple < n - overlap (for docs
    # with n <= overlap tokens, just the single start 0)
    last_start = F.greatest(n - F.lit(overlap) - 1, F.lit(0))
    starts = F.sequence(F.lit(0), last_start, F.lit(stride))
    chunks: Column = F.transform(
        starts,
        lambda s: F.struct(
            s.alias("tok_start"),
            F.slice(toks, s + 1, chunk_tokens).alias("w"),
        ),
    )
    return (
        df.select(id_col, F.posexplode(chunks).alias("chunk_id", "c"))
        .select(
            id_col,
            "chunk_id",
            F.concat_ws(" ", F.col("c.w")).alias("chunk_text"),
            F.col("c.tok_start").cast("bigint").alias("tok_start"),
            F.size("c.w").cast("bigint").alias("chunk_n_tokens"),
        )
    )


def chunk_oracle_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> str:
    """DuckDB mirror of ``chunk_documents`` (list comprehension over stride
    multiples; same start rule, same short-tail behavior)."""
    stride = chunk_tokens - overlap
    return f"""
        WITH t AS (
            SELECT {id_col}, string_split({text_col}, ' ') AS tk
            FROM {table}
        ),
        s AS (
            SELECT {id_col}, tk,
                   [i * {stride} for i in
                    range(0, CAST(ceil(CAST(greatest(len(tk) - {overlap} - 1, 0) + 1
                                             AS DOUBLE) / {stride}) AS BIGINT))] AS starts
            FROM t
        )
        SELECT {id_col},
               CAST(u // {stride} AS INT) AS chunk_id,
               array_to_string(tk[u + 1 : u + {chunk_tokens}], ' ') AS chunk_text,
               CAST(u AS BIGINT) AS tok_start,
               CAST(least({chunk_tokens}, len(tk) - u) AS BIGINT) AS chunk_n_tokens
        FROM (SELECT {id_col}, tk, unnest(starts) AS u FROM s)
    """


def pack_sequences(
    df: DataFrame,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    group_cols: tuple[str, ...] = ("source",),
    budget: int = 2048,
    n_shards: int = 16,
) -> DataFrame:
    """Assign each document a packing bin: greedy first-fit in ``id_col``
    order within each (group_cols…, shard) partition, opening a new bin
    whenever adding the document would exceed ``budget`` tokens. A single
    document larger than the budget gets a bin of its own.

    Output: input columns + ``shard``, ``bin_id`` (dense 0-based per
    (group, shard)), ``bin_tokens`` (running total within the bin). Bins
    are locally optimal per shard; cross-shard merging is deliberately NOT
    done — at scale the point is that every shard packs independently, so
    the op is embarrassingly parallel and deterministic.
    """
    import pandas as pd

    out_fields = df.schema.fields
    schema = (
        ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in out_fields)
        + ", shard int, bin_id bigint, bin_tokens bigint"
    )
    with_shard = df.withColumn(
        "shard", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards)).cast("int")
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        bins, totals = [], []
        cur_bin, cur_total = 0, 0
        for t in pdf[token_col].astype("int64"):
            if cur_total > 0 and cur_total + t > budget:
                cur_bin += 1
                cur_total = 0
            cur_total += int(t)
            bins.append(cur_bin)
            totals.append(cur_total)
        pdf["bin_id"] = pd.Series(bins, dtype="int64")
        pdf["bin_tokens"] = pd.Series(totals, dtype="int64")
        return pdf

    return with_shard.groupBy(*group_cols, "shard").applyInPandas(pack, schema)
