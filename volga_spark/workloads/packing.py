"""Mixture-selection + sequence-packing workload (driver-oracled).

End-to-end training-batch assembly, one leg-tagged union:

- ``pack``: weighted domain mixture over the documents corpus (8 of the
  20 sources, fixed weights, absolute token budget) feeding GPT-style
  concat-then-chunk sequence packing at a fixed sequence length. Every
  number is integer arithmetic over md5-ranked rows, so Spark (two-phase
  distributed prefix sum) and DuckDB (plain global window) hash-match
  exactly.
- ``upsample`` (late r07): repeat-factor mixture selection — a recipe
  whose domain budgets EXCEED the domain corpora, met by full passes
  (copy_id 0..k-1) plus a budget-windowed remainder pass on a fresh
  per-copy md5 shuffle. The oracle derives the same pass plan from the
  corpus inside SQL, so the leg is exact at every scale factor.
- ``ctx`` (r09): in-context-pretraining packing (Shi et al. 2023, ICLM) —
  the same packer fed by the SEMANTIC-LOCALITY corpus order (simhash
  sort: similar docs chain adjacently, so sequences hold related docs)
  instead of the md5 shuffle; pinned via the per-sequence boundary CSV,
  with the DuckDB twin recomputing the simhash signature from scratch.
- ``fim`` / ``corrupt`` (r08): the training OBJECTIVE transforms applied
  at this assembly stage — fill-in-the-middle PSM reorder (Bavarian 2022)
  and T5 span corruption with numbered sentinels (Raffel 2020). Both
  zero-shuffle md5-deterministic rewrites; the legs carry the md5 of the
  exact rewritten bytes, matched against DuckDB's independent
  window-function formulation.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from volga_spark.operators.objectives import (
    fim_oracle_sql,
    fim_transform,
    span_corruption,
    span_corruption_oracle_sql,
)
from volga_spark.operators.packing import (
    context_order,
    context_order_oracle_sql,
    mixture_repeats_oracle_sql,
    mixture_select,
    mixture_select_oracle_sql,
    mixture_select_with_repeats,
    pack_boundaries,
    pack_boundaries_oracle_sql,
    pack_sequences,
    pack_sequences_oracle_sql,
)
from volga_spark.tables import load_table
from volga_spark.workloads import workload

WEIGHTS = {
    "src0": 0.25,
    "src1": 0.20,
    "src2": 0.15,
    "src3": 0.12,
    "src4": 0.10,
    "src5": 0.08,
    "src6": 0.06,
    "src7": 0.04,
}
TOKEN_BUDGET = 4000  # absolute budget: partial per-domain selection at every SF

# upsample leg: at sf0.01 src0's ~1.4k-token corpus meets a 3.6k budget via
# 2 full passes + remainder (real upsampling under the driver gate); at
# larger SFs the same recipe degrades gracefully to a partial selection
UP_WEIGHTS = {"src0": 0.6, "src1": 0.3, "src2": 0.1}
UP_BUDGET = 6000
SEQ_LEN = 512

_PACK_ORACLE = pack_sequences_oracle_sql(
    mixture_select_oracle_sql(
        "SELECT * FROM documents", WEIGHTS, TOKEN_BUDGET
    ),
    SEQ_LEN,
)
_UP_ORACLE = mixture_repeats_oracle_sql(
    "SELECT * FROM documents", UP_WEIGHTS, UP_BUDGET
)
_BOUNDS_ORACLE = pack_boundaries_oracle_sql(_PACK_ORACLE)

_CTX_ORACLE = pack_boundaries_oracle_sql(
    pack_sequences_oracle_sql(
        context_order_oracle_sql("SELECT doc_id, text, source FROM documents"),
        SEQ_LEN,
    )
)

_FIM_ORACLE = fim_oracle_sql("SELECT doc_id, text FROM documents")
_CORR_ORACLE = span_corruption_oracle_sql("SELECT doc_id, text FROM documents")

_ORACLE = f"""
    SELECT 'pack' AS leg, doc_id AS id_a, domain AS s1,
           CAST(seq_id AS BIGINT) AS v1, CAST(seq_offset AS BIGINT) AS v2,
           CAST(doc_offset AS BIGINT) AS v3, CAST(span_len AS BIGINT) AS v4,
           CAST(NULL AS VARCHAR) AS s2
    FROM ({_PACK_ORACLE})
    UNION ALL
    SELECT 'bounds', seq_id, bounds_csv,
           n_docs, filled, NULL, NULL,
           CAST(NULL AS VARCHAR)
    FROM ({_BOUNDS_ORACLE})
    UNION ALL
    SELECT 'ctx', seq_id, bounds_csv,
           n_docs, filled, NULL, NULL,
           CAST(NULL AS VARCHAR)
    FROM ({_CTX_ORACLE})
    UNION ALL
    SELECT 'upsample', doc_id, domain,
           CAST(copy_id AS BIGINT), CAST(n_tokens AS BIGINT), NULL, NULL,
           rank
    FROM ({_UP_ORACLE})
    UNION ALL
    SELECT 'fim', doc_id, md5(fim_text),
           n_tokens, CAST(fim_applied AS BIGINT), NULL, NULL,
           CAST(NULL AS VARCHAR)
    FROM ({_FIM_ORACLE})
    UNION ALL
    SELECT 'corrupt', doc_id, md5(input_text),
           n_corrupted, n_tokens, NULL, NULL,
           md5(target_text)
    FROM ({_CORR_ORACLE})
"""


@workload(
    "q_mix_pack",
    oracle=_ORACLE,
    tags=("packing", "training"),
)
def q_mix_pack(spark, sf_dir):
    """Domain-weighted doc selection (per-domain windowed token budgets)
    piped into fixed-length sequence packing (two-phase md5-bucket prefix
    sum — no single-partition global window), plus the repeat-factor
    upsampling leg (full passes map-side exploded; only the remainder
    pass pays a budget window, over ONE copy of the corpus)."""
    # r14 (r13 verdict #5 — leg breadth): SIX legs each scanned the corpus
    # separately; one pinned (doc_id, text, source) projection now feeds
    # them all (lazy localCheckpoint — materialized once inside the query's
    # own job, never across runs). Interleaved A/B: −8% with identical
    # result hash. Scale note: every leg consumes the full text column, so
    # the pin trades five re-decodes of the corpus for one materialization;
    # at petabyte scale with executor-memory pressure, prefer re-scans
    # (drop the checkpoint) or stage the projection as a table.
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    ).localCheckpoint(eager=False)
    sel = mixture_select(docs, WEIGHTS, TOKEN_BUDGET)
    # packed feeds two legs (spans + boundaries) — pin the branch point so
    # the span pipeline runs once (the repo's branch discipline)
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
    # boundary-export leg (r08 verdict #5): per sequence, the ordered
    # (start, len, doc_id) boundary array trainers turn into block-diagonal
    # attention masks / position-id resets — carried as a canonical CSV so
    # the hash gate pins the structure itself
    bounds = pack_boundaries(packed)
    bounds_leg = bounds.select(
        F.lit("bounds").alias("leg"),
        F.col("seq_id").cast("long").alias("id_a"),
        F.concat_ws(
            ",",
            F.transform(
                "bounds",
                lambda b: F.concat_ws(
                    ":",
                    b["start"].cast("string"),
                    b["len"].cast("string"),
                    b["doc_id"].cast("string"),
                ),
            ),
        ).alias("s1"),
        F.col("n_docs").alias("v1"),
        F.col("filled").alias("v2"),
        F.lit(None).cast("long").alias("v3"),
        F.lit(None).cast("long").alias("v4"),
        F.lit(None).cast("string").alias("s2"),
    )

    # in-context-pretraining leg (r09): the SAME packer fed by the
    # semantic-locality order (simhash sort — ICLM, Shi et al. 2023)
    # instead of the md5 shuffle; the bounds CSV pins ordering, chaining,
    # and span arithmetic in one hashed value per sequence.
    ctx_bounds = pack_boundaries(pack_sequences(context_order(docs), SEQ_LEN))
    ctx_leg = ctx_bounds.select(
        F.lit("ctx").alias("leg"),
        F.col("seq_id").cast("long").alias("id_a"),
        F.concat_ws(
            ",",
            F.transform(
                "bounds",
                lambda b: F.concat_ws(
                    ":",
                    b["start"].cast("string"),
                    b["len"].cast("string"),
                    b["doc_id"].cast("string"),
                ),
            ),
        ).alias("s1"),
        F.col("n_docs").alias("v1"),
        F.col("filled").alias("v2"),
        F.lit(None).cast("long").alias("v3"),
        F.lit(None).cast("long").alias("v4"),
        F.lit(None).cast("string").alias("s2"),
    )

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

    # objective-prep legs (r08): the transforms a pre-training pipeline
    # applies right at this assembly stage — FIM reorder and T5 span
    # corruption. Both zero-shuffle per-row rewrites; the md5 of the exact
    # rewritten bytes is the driver-gated value, so the deterministic
    # sentinel arithmetic must match DuckDB's independent window-function
    # formulation byte-for-byte.
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
