"""Length-bucketed batch assembly for VARIABLE-length (non-packed) training.

Packed pre-training (operators/packing) eliminates padding by construction;
SFT and other variable-length fine-tuning usually cannot pack (each example
must stay intact, attention must not cross examples without masks), so the
padding bill is set by how examples group into batches: a batch pads every
example to its longest member. Grouping similar lengths together — HF's
``group_by_length`` / LengthGroupedSampler discipline — cuts that waste.

This is the deterministic distributed version:

- bucket = ``floor(log2(length))`` band — a FIXED, data-independent rule
  (no quantile pass over the corpus), so bucketing is a pure per-row
  expression that needs no global statistics, survives any scale, and is
  trivially SQL-twinnable. Within a band, lengths differ by < 2×, which
  bounds per-batch padding waste below 50% and in practice lands ~10-15%.
- within each bucket, examples order by the engine-portable md5(seed:id)
  rank (the repo's determinism rule) and chunk into fixed ``batch_size``
  batches: ``batch_id = row_index_in_bucket div batch_size``. ONE
  partitioned window per bucket — never a global window.
- batch ids are (bucket, batch_id) pairs; trainers shuffle BATCHES at
  load time (the standard trick: batch composition is length-homogeneous,
  batch ORDER is random), so no global batch numbering is needed — and
  none is computed, keeping the operator one-shuffle.

Output: ``(id_col, n_tokens, bucket, batch_id, pos_in_batch)``.
Deterministic: a pure function of (seed, corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

from volga_spark.functions.tokenize import n_tokens, n_tokens_sql
from volga_spark.operators.sampling import _rank, _rank_sql


def length_bucketed_batches(
    docs: DataFrame,
    batch_size: int,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    length_col: str | None = None,
    seed: str = "volga-batch",
) -> DataFrame:
    """Assign every example to a length-homogeneous training batch (see
    module doc). ``length_col`` supplies a precomputed length (e.g. BPE
    token counts); otherwise the shared whitespace ``n_tokens`` is used.
    Zero-length examples are dropped (nothing to train on).

    One exchange (the per-bucket rank window); everything else is per-row
    arithmetic. All batches within a bucket are exactly ``batch_size``
    except the bucket's last.
    """
    if int(batch_size) < 1:
        raise ValueError(f"batch_size must be >= 1 (got {batch_size})")
    if length_col is None:
        d = docs.withColumn("n_tokens", n_tokens(text_col))
    else:
        d = docs.withColumn("n_tokens", F.col(length_col).cast("bigint"))
    d = d.filter(F.col("n_tokens") > 0)
    # floor(log2(n)) in exact INTEGER arithmetic (both engines): length of
    # the binary representation minus one — no float log, so the twin is
    # trivially identical at any magnitude
    bucket = (F.length(F.conv(F.col("n_tokens"), 10, 2)) - 1).cast("int")
    d = d.withColumn("bucket", bucket).withColumn(
        "__rank", _rank(id_col, seed)
    )
    w = Window.partitionBy("bucket").orderBy("__rank", id_col)
    idx = F.row_number().over(w) - 1
    return d.select(
        id_col,
        "n_tokens",
        "bucket",
        F.floor(idx / F.lit(int(batch_size))).cast("int").alias("batch_id"),
        (idx % F.lit(int(batch_size))).cast("int").alias("pos_in_batch"),
    )


def length_bucketed_batches_oracle_sql(
    docs_sql: str,
    batch_size: int,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: str = "volga-batch",
) -> str:
    """DuckDB twin of :func:`length_bucketed_batches` (whitespace-length
    path) — identical (bucket, batch_id, pos_in_batch) assignment."""
    nt = n_tokens_sql(text_col)
    return f"""
        WITH d AS (
            SELECT {id_col}, {nt} AS n_tokens,
                   {_rank_sql(id_col, seed)} AS __rank
            FROM ({docs_sql})
            WHERE {nt} > 0
        ),
        b AS (
            SELECT {id_col}, n_tokens,
                   CAST(length(bin(n_tokens)) - 1 AS INT) AS bucket,
                   CAST(row_number() OVER (
                       PARTITION BY CAST(length(bin(n_tokens)) - 1 AS INT)
                       ORDER BY __rank, {id_col}) - 1 AS BIGINT) AS idx
            FROM d
        )
        SELECT {id_col}, n_tokens, bucket,
               CAST(idx // {int(batch_size)} AS INT) AS batch_id,
               CAST(idx % {int(batch_size)} AS INT) AS pos_in_batch
        FROM b
    """


def padding_efficiency(batched: DataFrame) -> DataFrame:
    """One row: (real_tokens, padded_tokens, efficiency) — the fraction of
    the padded token grid that is real data when every batch pads to its
    longest member. The observable the bucketing exists to maximize."""
    per_batch = batched.groupBy("bucket", "batch_id").agg(
        F.sum("n_tokens").alias("real"),
        (F.max("n_tokens") * F.count("*")).alias("padded"),
    )
    return per_batch.agg(
        F.sum("real").alias("real_tokens"),
        F.sum("padded").alias("padded_tokens"),
        (F.sum("real") / F.sum("padded")).alias("efficiency"),
    )
