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
- ``grpo`` (r09): GRPO-style per-prompt-group advantage normalization
  (Shao et al. 2024) — each candidate's reward z-scored within its prompt
  group, carried as EXACT integer sufficient statistics (n·r − Σr,
  n·Σr² − (Σr)²) plus floor(adv·1e9), so the hash gate pins the
  normalization bit-for-bit; zero-variance groups dropped (no signal).
- ``tool_render`` / ``tool_span`` (r08): the AGENTIC trace tier — flat
  per-step rows (user / assistant / tool_call / tool_result cycling, with
  deterministic ERROR injection into some tool results) are assembled into
  trajectories (one collect_list exchange), gated on outcome (traces with a
  failed or missing tool loop are dropped — the standard agentic-SFT
  curation filter), rendered through the same template, and masked with the
  tool policy: assistant text AND tool-call args trainable, tool RESULTS
  (environment-produced) masked. ``tool_span`` carries the role so the
  driver hash pins the masking policy itself, not just the offsets.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from volga_spark.operators.conversations import (
    TOOL_TRAINABLE_ROLES,
    assemble_trajectories,
    bt_margin_pairs,
    bt_win_counts,
    group_advantages,
    loss_spans,
    preference_pairs,
    render_conversations,
    trace_outcome_ok,
    turns_from_documents,
)
from volga_spark.tables import load_table
from volga_spark.workloads import workload

_SYS = "You are a helpful assistant."
_W = 12  # words per turn
_MAX_TURNS = 8
_GROUP = 4  # docs per preference prompt
# agentic-trace bootstrap: 4-word steps so the ~30-word synthetic documents
# yield >= 4 steps and the user→assistant→tool_call→tool_result cycle
# completes at least one tool loop (12-word chunks would leave most docs
# with no tool_result and the outcome gate would drop everything)
_TW = 4  # words per trace step
_TMAX = 8  # max steps per trace
_ERR = "ERROR: "  # injected failure prefix; (doc_id + step) % 5 == 0 fails
# BT leg: margin bins of 100 score points (scores are 0-1000 integer
# distinct-word ratios), <= 60 stratified pairs kept per bin
_BT_BIN = 100
_BT_PER_BIN = 60

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
    ),
    btw AS (
        -- BT win count = rank-1 under the (score, id) total order
        SELECT prompt_id, cand, score,
               row_number() OVER (PARTITION BY prompt_id
                                  ORDER BY score, cand) - 1 AS wins
        FROM scored
    ),
    btpairs AS (
        SELECT a.prompt_id, a.cand AS chosen_id, b.cand AS rejected_id,
               a.score - b.score AS margin,
               (a.score - b.score) // {_BT_BIN} AS margin_bin,
               a.wins AS w_c, b.wins AS w_r
        FROM btw a JOIN btw b USING (prompt_id)
        WHERE (a.score, a.cand) > (b.score, b.cand)
    ),
    btsamp AS (
        SELECT *, row_number() OVER (
                   PARTITION BY margin_bin
                   ORDER BY md5('volga-bt:' || prompt_id || ':'
                                || chosen_id || ':' || rejected_id)
               ) AS __rn
        FROM btpairs
    ),
    grpo AS (
        -- GRPO advantage normalization as exact integer sufficient
        -- statistics: adv_num = n*r - sum, var_n2 = n*sumsq - sum^2.
        -- BIGINT before squaring mirrors the hardened library twin
        -- (group_advantages_oracle_sql): an INT32 score column would
        -- overflow score*score in DuckDB at |score| > 46340 while the
        -- Spark side (cast to bigint) would not.
        SELECT prompt_id, cand, CAST(score AS BIGINT) AS score,
               count(*) OVER (PARTITION BY prompt_id) AS n,
               CAST(sum(score) OVER (PARTITION BY prompt_id)
                    AS BIGINT) AS s,
               sum(CAST(score AS BIGINT) * CAST(score AS BIGINT))
                   OVER (PARTITION BY prompt_id) AS ss
        FROM scored
    ),
    tchunk AS (
        SELECT doc_id, CAST((i - 1) // {_TW} AS INT) AS ci,
               string_agg(word, ' ' ORDER BY i) AS content
        FROM tok WHERE (i - 1) // {_TW} < {_TMAX}
        GROUP BY doc_id, CAST((i - 1) // {_TW} AS INT)
    ),
    tturns AS (
        SELECT doc_id, ci AS idx,
               CASE ci % 4 WHEN 0 THEN 'user' WHEN 1 THEN 'assistant'
                    WHEN 2 THEN 'tool_call' ELSE 'tool_result' END AS role,
               CASE WHEN ci % 4 = 3 AND (doc_id + ci) % 5 = 0
                    THEN '{_ERR}' || content ELSE content END AS content
        FROM tchunk
    ),
    tgate AS (
        SELECT doc_id FROM tturns GROUP BY doc_id
        HAVING count(*) FILTER (WHERE role = 'tool_result') >= 1
           AND count(*) FILTER (WHERE role = 'tool_result'
                                AND content LIKE '{_ERR}%') = 0
    ),
    toff AS (
        SELECT doc_id, idx, role, content,
               coalesce(sum(2 + length(role) + 2 + length(content) + 7)
                   OVER (PARTITION BY doc_id ORDER BY idx
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS pos
        FROM tturns WHERE doc_id IN (SELECT doc_id FROM tgate)
    ),
    trendered AS (
        SELECT doc_id,
               string_agg('<|' || role || '|>' || content || '<|end|>',
                          '' ORDER BY idx) AS r,
               count(*) AS n_turns
        FROM tturns WHERE doc_id IN (SELECT doc_id FROM tgate)
        GROUP BY doc_id
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
    UNION ALL
    SELECT 'bt', prompt_id, chosen_id, rejected_id, CAST(margin AS BIGINT),
           margin_bin || ':' || w_c || ':' || w_r
    FROM btsamp WHERE __rn <= {_BT_PER_BIN}
    UNION ALL
    SELECT 'grpo', prompt_id, cand,
           CAST(n * score - s AS BIGINT),
           CAST(n * ss - s * s AS BIGINT),
           CAST(CAST(floor((CAST(n * score - s AS BIGINT)
                            / sqrt(CAST(n * ss - s * s AS BIGINT)))
                           * 1000000000.0) AS BIGINT) AS VARCHAR)
    FROM grpo WHERE n >= 2 AND n * ss - s * s > 0
    UNION ALL
    SELECT 'tool_render', doc_id, CAST(n_turns AS BIGINT),
           CAST(length(r) AS BIGINT), NULL, md5(r)
    FROM trendered
    UNION ALL
    SELECT 'tool_span', doc_id, CAST(idx AS BIGINT),
           CAST(pos + 2 + length(role) + 2 AS BIGINT),
           CAST(pos + 2 + length(role) + 2 + length(content) AS BIGINT),
           role
    FROM toff WHERE role IN ('assistant', 'tool_call')
"""


@workload("q_sft_prep", oracle=_ORACLE, tags=("llm", "sft", "conversations"))
def q_sft_prep(spark, sf_dir):
    """SFT/preference data prep in one leg-tagged union (see module doc).

    The render and span legs are shuffle-free per-document array
    expressions; the pair leg is one combinable exchange on the prompt key.
    At 100 TB the whole query is scan-bound except one small aggregation.
    """
    docs = load_table(spark, sf_dir, "documents")
    # branch point: conv feeds the render AND span legs — pin it so the
    # text→turns split runs once, not per consumer (r13 optimization
    # round; same discipline as the `gated` pin below)
    conv = turns_from_documents(
        docs, words_per_turn=_W, max_turns=_MAX_TURNS, system_prompt=_SYS
    ).localCheckpoint(eager=False)
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
        # r13 optimization round: cands feeds SIX plan branches (pair leg,
        # the two win-count join sides, both bt_margin_pairs join sides,
        # grpo) — unpinned, each branch re-ran the corpus scan plus the
        # double text split above. Pin the tiny reduced frame (3 numeric
        # columns) so the text is split once; the branch discipline used
        # throughout the repo.
    ).localCheckpoint(eager=False)
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

    # Bradley-Terry reward-model prep (r08 verdict #7): ALL ordered pairs
    # per prompt with margin bins, stratified to <= _BT_PER_BIN hard/easy
    # pairs per bin by the md5 rank discipline, each side carrying its BT
    # win count (rank-1 under the same (score, id) total order). s1 pins
    # bin + both win counts so the hash gate checks the BT statistics, not
    # just pair identity.
    # wins feeds BOTH bt_leg join sides — pin it so the rank window runs
    # once (it reads the pinned cands, so this pin costs one tiny job)
    wins = (
        bt_win_counts(
            cands, prompt_col="prompt_id", cand_col="cand", score_col="score"
        )
        .select("prompt_id", "cand", "wins")
        .localCheckpoint(eager=False)
    )
    btp = bt_margin_pairs(
        cands,
        prompt_col="prompt_id",
        cand_col="cand",
        score_col="score",
        bin_width=_BT_BIN,
        per_bin=_BT_PER_BIN,
    )
    bt_leg = (
        btp.join(
            wins.select(
                "prompt_id",
                F.col("cand").alias("chosen_id"),
                F.col("wins").alias("w_c"),
            ),
            ["prompt_id", "chosen_id"],
        )
        .join(
            wins.select(
                "prompt_id",
                F.col("cand").alias("rejected_id"),
                F.col("wins").alias("w_r"),
            ),
            ["prompt_id", "rejected_id"],
        )
        .select(
            F.lit("bt").alias("leg"),
            F.col("prompt_id").alias("id_a"),
            F.col("chosen_id").alias("id_b"),
            F.col("rejected_id").alias("v1"),
            F.col("margin").alias("v2"),
            F.concat_ws(":", "margin_bin", "w_c", "w_r").alias("s1"),
        )
    )

    # GRPO advantage normalization (r09): per-prompt-group reward z-scores
    # carried as EXACT integer sufficient statistics (adv_num, var_n2) —
    # they fully determine the double advantage, so the hash gate pins the
    # normalization itself; s1 additionally pins floor(adv * 1e9), one
    # correctly-rounded div/sqrt over exact integers on both engines.
    grpo_leg = group_advantages(
        cands, prompt_col="prompt_id", cand_col="cand", score_col="score"
    ).select(
        F.lit("grpo").alias("leg"),
        F.col("prompt_id").alias("id_a"),
        F.col("cand").alias("id_b"),
        F.col("adv_num").alias("v1"),
        F.col("var_n2").alias("v2"),
        F.floor(F.col("advantage") * F.lit(1000000000.0))
        .cast("long")
        .cast("string")
        .alias("s1"),
    )

    # --- agentic trace tier: flat steps → assembly → outcome gate → render
    # + tool-policy masking. The bootstrap explodes each doc into per-step
    # ROWS first (the shape real agent logs arrive in) precisely so the
    # collect_list assembly operator is exercised, not bypassed.
    words = F.split(F.coalesce(F.col("text"), F.lit("")), " ")
    n_steps = F.least(
        F.floor((F.size(words) + F.lit(_TW - 1)) / F.lit(_TW)).cast("int"),
        F.lit(_TMAX),
    )
    role = (
        F.when(F.col("step_idx") % 4 == 0, F.lit("user"))
        .when(F.col("step_idx") % 4 == 1, F.lit("assistant"))
        .when(F.col("step_idx") % 4 == 2, F.lit("tool_call"))
        .otherwise(F.lit("tool_result"))
    )
    chunk = F.array_join(
        F.slice(F.col("__ws"), F.col("step_idx") * _TW + F.lit(1), F.lit(_TW)),
        " ",
    )
    steps = (
        docs.select(
            "doc_id",
            words.alias("__ws"),
            F.explode(F.sequence(F.lit(0), n_steps - F.lit(1))).alias(
                "step_idx"
            ),
        )
        .select(
            "doc_id",
            "step_idx",
            role.alias("role"),
            F.when(
                (F.col("step_idx") % 4 == 3)
                & ((F.col("doc_id") + F.col("step_idx")) % 5 == 0),
                F.concat(F.lit(_ERR), chunk),
            )
            .otherwise(chunk)
            .alias("content"),
        )
    )
    traces = assemble_trajectories(steps, trace_col="doc_id")
    gated = traces.filter(trace_outcome_ok(F.col("turns")))
    # branch point: gated feeds the render AND span legs — pin it so the
    # assembly exchange runs once, not per consumer
    gated = gated.localCheckpoint(eager=False)
    t_rendered = render_conversations(gated)

    tool_render_leg = t_rendered.select(
        F.lit("tool_render").alias("leg"),
        F.col("doc_id").alias("id_a"),
        F.size("turns").cast("long").alias("id_b"),
        F.length("rendered").cast("long").alias("v1"),
        F.lit(None).cast("long").alias("v2"),
        F.md5("rendered").alias("s1"),
    )
    tool_span_leg = loss_spans(gated, roles=TOOL_TRAINABLE_ROLES).select(
        F.lit("tool_span").alias("leg"),
        F.col("doc_id").alias("id_a"),
        F.col("turn_idx").cast("long").alias("id_b"),
        F.col("span_start").alias("v1"),
        F.col("span_end").alias("v2"),
        F.col("role").alias("s1"),
    )

    return (
        render_leg.unionByName(span_leg)
        .unionByName(pair_leg)
        .unionByName(bt_leg)
        .unionByName(grpo_leg)
        .unionByName(tool_render_leg)
        .unionByName(tool_span_leg)
    )
