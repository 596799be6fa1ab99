"""Training-shard export — the last mile from curated corpus to trainer
input.

Composes the existing tiers into the artifact a pretraining dataloader
actually reads: BPE token ids, domain-mixture selected, packed into
fixed-length sequences, written as sharded parquet with a manifest.

  docs ──encode_bpe──► bpe_ids ──budget_select──► selected
       ──pack_sequences──► spans ──slice+assemble──► sequences
       ──write──► <root>/shards/shard=<i>/…  +  <root>/_manifest.json

Every step is exact and deterministic (md5 ranks, integer token
accounting, two-phase prefix-sum packing), so re-running the export on
the same corpus reproduces byte-identical sequences — the property a
training run's data provenance needs. Sequence assembly is native:
spans join back to the id arrays, `slice()` cuts each span's tokens,
and per-sequence order is restored with `array_sort` over
(seq_offset, chunk) structs before `flatten` — no Python in the
assembly path.

The manifest (written through the Hadoop FS, `operators/publish`
discipline) records per-shard sequence/token counts plus the packing
parameters — the dataset card numbers a trainer's sanity checks read.

Scale: encode is map-side; selection is the per-domain window; packing
moves each row once; assembly shuffles (seq_id, span) rows — bytes ∝
token ids, the unavoidable payload; shard writes are hive-partitioned.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from volga_spark.operators.bpe import BpeModel, encode_bpe
from volga_spark.operators.packing import budget_select, pack_sequences
from volga_spark.operators.publish import _HadoopFs
from volga_spark.operators.sampling import _rank


def build_sequences(
    docs: DataFrame,
    model: BpeModel,
    seq_len: int,
    weights: dict[str, float] | None = None,
    token_budget: int = 0,
    domain_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: str = "volga-export",
) -> DataFrame:
    """(seq_id, token_ids, n_tokens) fixed-length training sequences.
    Token accounting is over BPE ids (not whitespace words); with
    `weights` the per-domain token budgets apply, otherwise the whole
    corpus packs."""
    enc = encode_bpe(docs, model, text_col=text_col)
    base = (
        enc.withColumn("n_tokens", F.size("bpe_ids").cast("bigint"))
        .filter(F.col("n_tokens") > 0)
        .withColumn("rank", _rank(id_col, seed))
    )
    if weights:
        selected = budget_select(
            base, weights, token_budget, domain_col, id_col
        )
    else:
        selected = base.select(
            id_col, F.col(domain_col).alias("domain"), "n_tokens", "rank"
        )
    spans = pack_sequences(selected, seq_len, id_col=id_col)
    ids = base.select(id_col, "bpe_ids")
    chunks = spans.join(ids, id_col).select(
        "seq_id",
        "seq_offset",
        F.slice(
            F.col("bpe_ids"),
            (F.col("doc_offset") + 1).cast("int"),
            F.col("span_len").cast("int"),
        ).alias("chunk"),
    )
    return (
        chunks.groupBy("seq_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("seq_offset", "chunk"))
                    ),
                    lambda s: s["chunk"],
                )
            ).alias("token_ids")
        )
        .select(
            "seq_id",
            "token_ids",
            F.size("token_ids").cast("bigint").alias("n_tokens"),
        )
    )


def export_training_shards(
    docs: DataFrame,
    model: BpeModel,
    root: str,
    seq_len: int,
    n_shards: int = 8,
    **kwargs,
) -> dict:
    """Write `build_sequences` output as hive-sharded parquet plus a
    manifest; returns the manifest dict."""
    spark = docs.sparkSession
    seqs = build_sequences(docs, model, seq_len, **kwargs).withColumn(
        "shard", F.pmod(F.col("seq_id"), F.lit(n_shards)).cast("int")
    )
    data_root = f"{root.rstrip('/')}/shards"
    seqs.write.mode("overwrite").partitionBy("shard").parquet(data_root)

    written = spark.read.parquet(data_root)
    # string keys: the manifest must round-trip through JSON unchanged
    per_shard = {
        str(r["shard"]): {"n_seqs": r["n_seqs"], "n_tokens": r["n_tokens"]}
        for r in written.groupBy("shard")
        .agg(
            F.count("*").alias("n_seqs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
        .collect()
    }
    manifest = {
        "seq_len": seq_len,
        "n_shards": n_shards,
        "shards": per_shard,
        "total_seqs": int(sum(s["n_seqs"] for s in per_shard.values())),
        "total_tokens": int(sum(s["n_tokens"] for s in per_shard.values())),
        "vocab_size": len(model.vocab),
    }
    fs = _HadoopFs(spark, root)
    fs.mkdirs(root)
    fs.write_text(f"{root.rstrip('/')}/_manifest.json", json.dumps(manifest))
    return manifest


def read_manifest(spark: SparkSession, root: str) -> dict:
    fs = _HadoopFs(spark, root)
    return json.loads(fs.read_text(f"{root.rstrip('/')}/_manifest.json"))
