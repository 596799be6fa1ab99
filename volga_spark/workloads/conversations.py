"""Post-training conversation-prep workload (SFT render + loss masks +
preference pairs) — the driver-oracled surface of
``operators/conversations.py``.

One leg-tagged union so the whole tier fits one registry row:

- ``render``: each document becomes a multi-turn conversation (system +
  alternating user/assistant word-chunk turns) rendered through the
  deterministic chat template; the leg carries the md5 of the EXACT
  rendered string, so the oracle must reproduce the template byte-for-byte.
- ``span``: assistant-content loss-mask char spans into that rendered
  string (what an SFT trainer unmasks), computed Spark-side by a
  shuffle-free array fold and oracle-side by the classic explode +
  window-prefix-sum — two independent formulations, same offsets.
- ``pair``: DPO-style chosen/rejected preference pairs per prompt group
  (deterministic (score, id) total order; score = integer distinct-word
  ratio), via one map-side-combinable max_by/min_by aggregation.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from volga_spark.operators.conversations import (
    loss_spans,
    preference_pairs,
    render_conversations,
    turns_from_documents,
)
from volga_spark.tables import load_table
from volga_spark.workloads import workload

_SYS = "You are a helpful assistant."
_W = 12  # words per turn
_MAX_TURNS = 8
_GROUP = 4  # docs per preference prompt

_ORACLE = f"""
    WITH w AS (
        SELECT doc_id, string_split(coalesce(text, ''), ' ') AS ws
        FROM documents
    ),
    tok AS (
        SELECT doc_id, unnest(ws) AS word, generate_subscripts(ws, 1) AS i
        FROM w
    ),
    chunk AS (
        SELECT doc_id, CAST((i - 1) // {_W} AS INT) AS ci,
               string_agg(word, ' ' ORDER BY i) AS content
        FROM tok WHERE (i - 1) // {_W} < {_MAX_TURNS}
        GROUP BY doc_id, CAST((i - 1) // {_W} AS INT)
    ),
    turns AS (
        SELECT doc_id, 0 AS idx, 'system' AS role, '{_SYS}' AS content FROM w
        UNION ALL
        SELECT doc_id, ci + 1 AS idx,
               CASE WHEN ci % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
               content
        FROM chunk
    ),
    off AS (
        SELECT doc_id, idx, role, content,
               coalesce(sum(2 + length(role) + 2 + length(content) + 7)
                   OVER (PARTITION BY doc_id ORDER BY idx
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS pos
        FROM turns
    ),
    rendered AS (
        SELECT doc_id,
               string_agg('<|' || role || '|>' || content || '<|end|>',
                          '' ORDER BY idx) AS r,
               count(*) AS n_turns
        FROM turns GROUP BY doc_id
    ),
    scored AS (
        SELECT doc_id // {_GROUP} AS prompt_id, doc_id AS cand,
               (1000 * len(list_distinct(ws))) // len(ws) AS score
        FROM w
    ),
    ranked AS (
        SELECT *,
               row_number() OVER (PARTITION BY prompt_id
                                  ORDER BY score DESC, cand DESC) AS rn_top,
               row_number() OVER (PARTITION BY prompt_id
                                  ORDER BY score ASC, cand ASC) AS rn_bot,
               count(*) OVER (PARTITION BY prompt_id) AS n_cand
        FROM scored
    ),
    pairs AS (
        SELECT prompt_id,
               max(CASE WHEN rn_top = 1 THEN cand END) AS chosen_id,
               max(CASE WHEN rn_bot = 1 THEN cand END) AS rejected_id,
               max(CASE WHEN rn_top = 1 THEN score END)
                 - max(CASE WHEN rn_bot = 1 THEN score END) AS margin,
               max(n_cand) AS n_cand
        FROM ranked GROUP BY prompt_id
    )
    SELECT 'render' AS leg, doc_id AS id_a, CAST(n_turns AS BIGINT) AS id_b,
           CAST(length(r) AS BIGINT) AS v1, CAST(NULL AS BIGINT) AS v2,
           md5(r) AS s1
    FROM rendered
    UNION ALL
    SELECT 'span', doc_id, CAST(idx AS BIGINT),
           CAST(pos + 2 + length(role) + 2 AS BIGINT),
           CAST(pos + 2 + length(role) + 2 + length(content) AS BIGINT),
           NULL
    FROM off WHERE role = 'assistant'
    UNION ALL
    SELECT 'pair', prompt_id, chosen_id, rejected_id, CAST(margin AS BIGINT),
           NULL
    FROM pairs
    WHERE n_cand >= 2 AND chosen_id != rejected_id
"""


@workload("q_sft_prep", oracle=_ORACLE, tags=("llm", "sft", "conversations"))
def q_sft_prep(spark, sf_dir):
    """SFT/preference data prep in one leg-tagged union (see module doc).

    The render and span legs are shuffle-free per-document array
    expressions; the pair leg is one combinable exchange on the prompt key.
    At 100 TB the whole query is scan-bound except one small aggregation.
    """
    docs = load_table(spark, sf_dir, "documents")
    conv = turns_from_documents(
        docs, words_per_turn=_W, max_turns=_MAX_TURNS, system_prompt=_SYS
    )
    rendered = render_conversations(conv)

    render_leg = rendered.select(
        F.lit("render").alias("leg"),
        F.col("doc_id").alias("id_a"),
        F.size("turns").cast("long").alias("id_b"),
        F.length("rendered").cast("long").alias("v1"),
        F.lit(None).cast("long").alias("v2"),
        F.md5("rendered").alias("s1"),
    )

    span_leg = loss_spans(conv).select(
        F.lit("span").alias("leg"),
        F.col("doc_id").alias("id_a"),
        F.col("turn_idx").cast("long").alias("id_b"),
        F.col("span_start").alias("v1"),
        F.col("span_end").alias("v2"),
        F.lit(None).cast("string").alias("s1"),
    )

    cands = docs.select(
        F.expr(f"doc_id DIV {_GROUP}").alias("prompt_id"),
        F.col("doc_id").alias("cand"),
        # widen BEFORE the multiply: 1000 * size() in 32-bit INT wraps on a
        # >2.1M-distinct-token document while the DuckDB twin's BIGINT stays
        # exact — the cast keeps both engines in 64-bit arithmetic throughout
        F.expr(
            "1000 * CAST(size(array_distinct(split(coalesce(text, ''), ' ')))"
            " AS BIGINT) DIV size(split(coalesce(text, ''), ' '))"
        ).alias("score"),
    )
    pair_leg = preference_pairs(
        cands, prompt_col="prompt_id", cand_col="cand", score_col="score"
    ).select(
        F.lit("pair").alias("leg"),
        F.col("prompt_id").alias("id_a"),
        F.col("chosen_id").alias("id_b"),
        F.col("rejected_id").alias("v1"),
        F.col("margin").alias("v2"),
        F.lit(None).cast("string").alias("s1"),
    )

    return render_leg.unionByName(span_leg).unionByName(pair_leg)
