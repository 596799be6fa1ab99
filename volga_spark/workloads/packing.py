"""Mixture-selection + sequence-packing workload (driver-oracled).

End-to-end training-batch assembly: weighted domain mixture over the
documents corpus (8 of the 20 sources, fixed weights, absolute token
budget) feeding GPT-style concat-then-chunk sequence packing at a fixed
sequence length. Every number is integer arithmetic over md5-ranked rows,
so Spark (two-phase distributed prefix sum) and DuckDB (plain global
window) hash-match exactly.
"""

from __future__ import annotations

from volga_spark.operators.packing import (
    mixture_select,
    mixture_select_oracle_sql,
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
SEQ_LEN = 512

_ORACLE = pack_sequences_oracle_sql(
    mixture_select_oracle_sql(
        "SELECT * FROM documents", WEIGHTS, TOKEN_BUDGET
    ),
    SEQ_LEN,
)


@workload(
    "q_mix_pack",
    oracle=_ORACLE,
    tags=("packing", "training"),
)
def q_mix_pack(spark, sf_dir):
    """Domain-weighted doc selection (per-domain windowed token budgets)
    piped into fixed-length sequence packing (two-phase md5-bucket prefix
    sum — no single-partition global window). Output: span rows
    (doc_id, domain, seq_id, seq_offset, doc_offset, span_len)."""
    docs = load_table(spark, sf_dir, "documents")
    sel = mixture_select(docs, WEIGHTS, TOKEN_BUDGET)
    return pack_sequences(sel, SEQ_LEN)
