"""Post-training (SFT / preference) conversation data preparation.

The pre-training tier (dedup, quality, packing, export) covers raw
documents; this module covers the other half of a training-data pipeline:
multi-turn conversation assembly, deterministic chat-template rendering,
loss-mask span computation, and preference-pair (chosen/rejected)
construction for DPO/RLHF-style datasets.

Scale design (the whole point of doing this on Spark):

- Turn assembly, template rendering, and loss-span computation are pure
  per-document array expressions (``transform`` / ``aggregate`` higher-order
  functions) — ZERO shuffles, whole-stage-codegen'd, embarrassingly
  parallel. A 100 TB conversation corpus renders at scan speed; there is no
  Python in the path.
- Loss spans use a running-offset fold over the turns array (``aggregate``
  with a (position, spans) struct accumulator) instead of the classic
  explode → window-prefix-sum formulation, which would shuffle every turn
  row on conversation id. The fold keeps each conversation's arithmetic
  inside its row.
- Preference pairs are a single map-side-combinable aggregation per prompt
  (one exchange on the prompt key); chosen/rejected selection is a
  deterministic (score, id) total order so results are stable under any
  partitioning or retry.

Reference scope note: the reference engine (volga-project/volga) stops at
feature pipelines; this tier is part of the "operations a large-scale
training-data pipeline would need" surface this repo adds beyond it.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class ChatTemplate:
    """Deterministic chat-template markers.

    ``render_conversations`` emits, per turn,
    ``role_open + role + role_close + content + turn_end`` and wraps the
    whole conversation in ``bos``/``eos``. All markers are plain strings so
    both the Spark render and any SQL oracle can reproduce the exact bytes
    (and therefore the exact hash) of the rendered text.
    """

    role_open: str = "<|"
    role_close: str = "|>"
    turn_end: str = "<|end|>"
    bos: str = ""
    eos: str = ""


DEFAULT_TEMPLATE = ChatTemplate()


def turns_from_documents(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    words_per_turn: int = 12,
    max_turns: int = 8,
    system_prompt: str | None = None,
    out_col: str = "turns",
) -> DataFrame:
    """Deterministically derive a multi-turn conversation from each document.

    The document's whitespace-token stream is chunked into turns of
    ``words_per_turn`` words (capped at ``max_turns``); even chunks speak as
    ``user``, odd as ``assistant``; an optional ``system`` turn is prepended
    at idx 0. Output: ``(id_col, out_col: array<struct<idx,role,content>>)``.

    This is the corpus→conversation bootstrap used by tests and the driver
    workload; real SFT corpora that already carry an
    ``array<struct<role,content>>`` column skip it and feed
    :func:`render_conversations` directly.

    Entirely native array expressions — no shuffle, no Python.
    """
    if int(words_per_turn) < 1 or int(max_turns) < 1:
        # max_turns=0 would make sequence(0, n_chunks-1) count DOWN (the
        # sequence() trap) and words_per_turn=0 would slice with length 0.
        raise ValueError(
            "words_per_turn and max_turns must be >= 1 "
            f"(got {words_per_turn}, {max_turns})"
        )
    w = int(words_per_turn)
    words = F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
    # ceil(n/w) via integer arithmetic (matches SQL (n + w - 1) // w); the
    # empty string still splits to [''] so n_chunks >= 1 for non-null rows
    # and the sequence() below never sees a start > stop (which would count
    # DOWN, not produce an empty array).
    n_chunks = F.least(
        F.floor((F.size(words) + F.lit(w - 1)) / F.lit(w)).cast("int"),
        F.lit(int(max_turns)),
    )
    off = 1 if system_prompt is not None else 0
    base = F.transform(
        F.sequence(F.lit(0), n_chunks - F.lit(1)),
        lambda i: F.struct(
            (i + F.lit(off)).cast("int").alias("idx"),
            F.when(i % 2 == 0, F.lit("user"))
            .otherwise(F.lit("assistant"))
            .alias("role"),
            F.array_join(F.slice(words, i * w + F.lit(1), F.lit(w)), " ").alias(
                "content"
            ),
        ),
    )
    if system_prompt is not None:
        sys_turn = F.array(
            F.struct(
                F.lit(0).cast("int").alias("idx"),
                F.lit("system").alias("role"),
                F.lit(system_prompt).alias("content"),
            )
        )
        base = F.concat(sys_turn, base)
    return docs.select(F.col(id_col), base.alias(out_col))


def _nn(c: Column) -> Column:
    """NULL-safe turn field: render and loss_spans must agree on the bytes a
    NULL role/content contributes (zero), or a single bad turn silently
    desyncs every later span offset (concat returns NULL, concat_ws drops
    the turn, the fold keeps counting). Coalescing to '' in BOTH paths keeps
    them aligned; caller-supplied SFT corpora with nullable fields are the
    documented entry point (see turns_from_documents docstring)."""
    return F.coalesce(c, F.lit(""))


def _turn_render_len(t: Column, tmpl: ChatTemplate) -> Column:
    fixed = len(tmpl.role_open) + len(tmpl.role_close) + len(tmpl.turn_end)
    return F.length(_nn(t["role"])) + F.length(_nn(t["content"])) + F.lit(fixed)


def render_conversations(
    conv: DataFrame,
    *,
    turns_col: str = "turns",
    out_col: str = "rendered",
    template: ChatTemplate = DEFAULT_TEMPLATE,
) -> DataFrame:
    """Render each conversation to its training string (one shuffle-free
    per-row ``transform`` + ``concat_ws``). Appends ``out_col``."""
    body = F.concat_ws(
        "",
        F.transform(
            F.col(turns_col),
            lambda t: F.concat(
                F.lit(template.role_open),
                _nn(t["role"]),
                F.lit(template.role_close),
                _nn(t["content"]),
                F.lit(template.turn_end),
            ),
        ),
    )
    return conv.withColumn(
        out_col, F.concat(F.lit(template.bos), body, F.lit(template.eos))
    )


def loss_spans(
    conv: DataFrame,
    *,
    id_col: str = "doc_id",
    turns_col: str = "turns",
    roles: tuple[str, ...] | None = ("assistant",),
    template: ChatTemplate = DEFAULT_TEMPLATE,
) -> DataFrame:
    """Char-offset loss-mask spans into the rendered conversation string.

    For every turn whose role is in ``roles`` (``None`` = every role; an
    empty tuple unmasks NOTHING and returns zero rows — a dynamically-built
    empty filter must not silently unmask user/system text), emits one row
    ``(id_col, turn_idx, role, span_start, span_end)`` where
    ``rendered[span_start:span_end]`` (0-based, half-open) is exactly that
    turn's CONTENT — the region a trainer unmasks; role markers and turn
    terminators stay masked.

    Offsets are computed by folding the turns array with an
    ``aggregate`` accumulator carrying (running position, spans so far) —
    the prefix sum never leaves the row, so the operator is shuffle-free
    (the alternative explode + window-prefix-sum shuffles every turn row on
    the conversation key; at 100 TB that exchange would dominate).
    """
    open_len = len(template.role_open)
    close_len = len(template.role_close)
    span_t = "array<struct<idx:int,role:string,span_start:bigint,span_end:bigint>>"
    init = F.struct(
        F.lit(len(template.bos)).cast("bigint").alias("pos"),
        F.expr(f"CAST(array() AS {span_t})").alias("spans"),
    )

    def merge(acc: Column, t: Column) -> Column:
        content_start = acc["pos"] + F.lit(open_len) + F.length(
            _nn(t["role"])
        ) + F.lit(close_len)
        span = F.struct(
            t["idx"].alias("idx"),
            _nn(t["role"]).alias("role"),
            content_start.alias("span_start"),
            (content_start + F.length(_nn(t["content"]))).alias("span_end"),
        )
        return F.struct(
            (acc["pos"] + _turn_render_len(t, template)).alias("pos"),
            F.concat(acc["spans"], F.array(span)).alias("spans"),
        )

    spans = F.aggregate(F.col(turns_col), init, merge, lambda acc: acc["spans"])
    out = conv.select(F.col(id_col), F.explode(spans).alias("s")).select(
        id_col,
        F.col("s.idx").alias("turn_idx"),
        F.col("s.role").alias("role"),
        F.col("s.span_start").alias("span_start"),
        F.col("s.span_end").alias("span_end"),
    )
    if roles is not None:
        out = out.filter(
            F.col("role").isin(*roles) if roles else F.lit(False)
        )
    return out


def preference_pairs(
    cands: DataFrame,
    *,
    prompt_col: str,
    cand_col: str,
    score_col: str,
    min_candidates: int = 2,
) -> DataFrame:
    """Chosen/rejected preference pairs per prompt.

    ``chosen`` is the candidate maximizing ``(score, cand_id)``; ``rejected``
    minimizes it — a TOTAL order, so the pair is deterministic under any
    partitioning, retry, or input order (ties on score break on the id).
    Prompts with fewer than ``min_candidates`` candidates, or where every
    candidate scores identically AND chosen == rejected would collide, are
    kept only when the ids differ (a one-candidate prompt has no pair).

    One map-side-combinable exchange on ``prompt_col`` (max_by/min_by
    partials); no window, no second shuffle.
    Output: ``(prompt_col, chosen_id, rejected_id, chosen_score,
    rejected_score, margin, n_candidates)``.
    """
    key = F.struct(F.col(score_col), F.col(cand_col))
    # Struct ordering sorts NULL score FIRST, so an unscored candidate would
    # be preferentially picked as `rejected` and emit NULL margin rows; drop
    # null-scored candidates before aggregating (they also don't count
    # toward min_candidates — an unscored candidate is not a usable pair leg).
    cands = cands.filter(F.col(score_col).isNotNull())
    # max(key)/min(key) already carry the winning cand id inside the struct
    # (the struct order IS the (score, id) total order), so three aggregate
    # buffers suffice — no separate max_by/min_by duplicating the id.
    agg = cands.groupBy(prompt_col).agg(
        F.max(key).alias("_maxk"),
        F.min(key).alias("_mink"),
        F.count(F.lit(1)).alias("n_candidates"),
    )
    return (
        agg.select(
            F.col(prompt_col),
            F.col(f"_maxk.{cand_col}").alias("chosen_id"),
            F.col(f"_mink.{cand_col}").alias("rejected_id"),
            "_maxk",
            "_mink",
            "n_candidates",
        )
        .filter(
            (F.col("n_candidates") >= F.lit(int(min_candidates)))
            & (F.col("chosen_id") != F.col("rejected_id"))
        )
        .select(
            prompt_col,
            "chosen_id",
            "rejected_id",
            F.col(f"_maxk.{score_col}").alias("chosen_score"),
            F.col(f"_mink.{score_col}").alias("rejected_score"),
            (F.col(f"_maxk.{score_col}") - F.col(f"_mink.{score_col}")).alias(
                "margin"
            ),
            "n_candidates",
        )
    )


def bt_win_counts(
    cands: DataFrame,
    *,
    prompt_col: str,
    cand_col: str,
    score_col: str,
) -> DataFrame:
    """Bradley-Terry-style per-prompt win counts: candidate ``c`` beats
    every candidate below it in the SAME deterministic ``(score, cand_id)``
    total order :func:`preference_pairs` uses, so ``wins`` = rank−1 and
    ``losses`` = n−rank — the sufficient statistics a BT/reward-model fit
    consumes per prompt group. Null-scored candidates drop (not a usable
    comparison leg, same rule as preference_pairs).

    One shuffle on the prompt key (rank window); rows out = rows in.
    Output: ``(prompt, cand, score, wins, losses, n_candidates)``.
    """
    cands = cands.filter(F.col(score_col).isNotNull())
    from pyspark.sql import Window

    w = Window.partitionBy(prompt_col).orderBy(
        F.col(score_col), F.col(cand_col)
    )
    wn = Window.partitionBy(prompt_col)
    return cands.select(
        prompt_col,
        cand_col,
        score_col,
        (F.row_number().over(w) - 1).cast("bigint").alias("wins"),
        (F.count(F.lit(1)).over(wn) - F.row_number().over(w))
        .cast("bigint")
        .alias("losses"),
        F.count(F.lit(1)).over(wn).cast("bigint").alias("n_candidates"),
    )


def bt_margin_pairs(
    cands: DataFrame,
    *,
    prompt_col: str,
    cand_col: str,
    score_col: str,
    bin_width: int = 1,
    per_bin: int | None = None,
    seed: str = "volga-bt",
) -> DataFrame:
    """ALL ordered preference pairs per prompt (chosen strictly above
    rejected in the ``(score, cand_id)`` total order) with integer score
    margins and margin bins — the stratification a reward-model pipeline
    samples hard pairs from (small margin = hard). With ``per_bin`` set,
    each margin bin keeps its ``per_bin`` pairs by the md5 rank discipline
    of ``operators/sampling`` (deterministic under any partitioning).

    Scale: the within-prompt self-join is bounded by the candidate-group
    size G the RECIPE sets (pairs/prompt = G·(G−1)/2 — G is 4-16 in
    practice, never corpus-sized), co-partitioned on the prompt key: one
    exchange, no global blowup. Output: ``(prompt, chosen_id, rejected_id,
    chosen_score, rejected_score, margin, margin_bin)``.
    """
    if int(bin_width) < 1:
        raise ValueError(f"bin_width must be >= 1 (got {bin_width})")
    cands = cands.filter(F.col(score_col).isNotNull())
    a = cands.select(
        F.col(prompt_col),
        F.col(cand_col).alias("chosen_id"),
        F.col(score_col).alias("chosen_score"),
    )
    b = cands.select(
        F.col(prompt_col),
        F.col(cand_col).alias("rejected_id"),
        F.col(score_col).alias("rejected_score"),
    )
    key = lambda s, c: F.struct(F.col(s), F.col(c))  # noqa: E731
    pairs = a.join(b, prompt_col).filter(
        key("chosen_score", "chosen_id") > key("rejected_score", "rejected_id")
    )
    pairs = pairs.select(
        prompt_col,
        "chosen_id",
        "rejected_id",
        "chosen_score",
        "rejected_score",
        (F.col("chosen_score") - F.col("rejected_score")).alias("margin"),
        F.expr(f"(chosen_score - rejected_score) div {int(bin_width)}")
        .alias("margin_bin"),
    )
    if per_bin is not None:
        from pyspark.sql import Window

        from volga_spark.operators.sampling import _rank

        rk = _rank(
            F.concat_ws(":", prompt_col, "chosen_id", "rejected_id"), seed
        )
        w = Window.partitionBy("margin_bin").orderBy(rk)
        pairs = (
            pairs.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= int(per_bin))
            .drop("__rn")
        )
    return pairs


def bt_margin_pairs_oracle_sql(
    cands_sql: str,
    *,
    prompt_col: str = "prompt_id",
    cand_col: str = "cand",
    score_col: str = "score",
    bin_width: int = 1,
    per_bin: int | None = None,
    seed: str = "volga-bt",
) -> str:
    """DuckDB twin of :func:`bt_margin_pairs` (+ win counts via the same
    rank identity), for driver-oracled legs."""
    base = f"""
        WITH cands AS (
            SELECT * FROM ({cands_sql}) WHERE {score_col} IS NOT NULL
        ),
        pairs AS (
            SELECT a.{prompt_col},
                   a.{cand_col} AS chosen_id, b.{cand_col} AS rejected_id,
                   a.{score_col} AS chosen_score,
                   b.{score_col} AS rejected_score,
                   a.{score_col} - b.{score_col} AS margin,
                   (a.{score_col} - b.{score_col}) // {int(bin_width)}
                       AS margin_bin
            FROM cands a JOIN cands b USING ({prompt_col})
            WHERE (a.{score_col}, a.{cand_col})
                > (b.{score_col}, b.{cand_col})
        )"""
    if per_bin is None:
        return base + "\n        SELECT * FROM pairs"
    from volga_spark.operators.sampling import sql_quote

    seed_esc = sql_quote(seed)
    return base + f""",
        sampled AS (
            SELECT *, row_number() OVER (
                       PARTITION BY margin_bin
                       ORDER BY md5('{seed_esc}:' || {prompt_col} || ':'
                                    || chosen_id || ':' || rejected_id)
                   ) AS __rn
            FROM pairs
        )
        SELECT * EXCLUDE (__rn) FROM sampled WHERE __rn <= {int(per_bin)}
    """


def group_advantages(
    cands: DataFrame,
    *,
    prompt_col: str,
    cand_col: str,
    score_col: str,
    min_group: int = 2,
) -> DataFrame:
    """GRPO-style per-prompt-group advantage normalization (Shao et al.
    2024, DeepSeekMath §4.1): each rollout's advantage is its reward
    z-scored WITHIN its prompt group, ``adv = (r − mean) / stddev_pop`` —
    the critic-free baseline RL post-training pipelines feed the policy
    update.

    Exactness discipline: with INTEGER scores the normalization is carried
    as exact integer sufficient statistics —

        adv_num  = n·r − Σr          (exact BIGINT)
        var_n2   = n·Σr² − (Σr)²     (exact BIGINT, = n²·variance_pop ≥ 0)
        adv      = adv_num / sqrt(var_n2)

    so the double ``adv`` is ONE correctly-rounded IEEE division of a
    correctly-rounded sqrt of exact integers — bit-identical on any engine
    computing from the same integers (the repo's float-determinism rule).
    ``(adv_num, var_n2)`` fully determine ``adv`` and are what a driver
    hash gate should pin. Integer inputs must keep ``n·Σr²`` inside
    BIGINT (|score| ≤ ~3·10⁶ at n ≤ 10⁶ rollouts — any real recipe).

    Degenerate groups follow the GRPO rule: zero-variance groups (all
    rollouts scored identically) carry no learning signal and are DROPPED,
    as are groups below ``min_group`` and null-scored rollouts (same rule
    as :func:`preference_pairs`).

    Scale: one exchange on the prompt key; the three window aggregates
    share a single partitioned WindowExec (no join, no broadcast). Rows
    out ≤ rows in. Output: ``(prompt, cand, score, n_candidates, adv_num,
    var_n2, advantage)``.
    """
    from pyspark.sql import Window

    # The exactness contract above only holds for integer rewards; a
    # silent cast('bigint') would TRUNCATE float scores (0.9 and 0.1 both
    # → 0, the group silently dropped as zero-variance) and diverge from
    # the oracle twin. Refuse rather than guess — quantize float rewards
    # upstream (e.g. floor(r * 1e6)) and pass the integers.
    dtype = dict(cands.dtypes).get(score_col)
    if dtype not in ("tinyint", "smallint", "int", "bigint"):
        raise ValueError(
            f"group_advantages requires an integer score column; "
            f"{score_col!r} is {dtype!r} — quantize float rewards upstream "
            "(e.g. floor(score * 1e6)) so the sufficient statistics stay "
            "exact"
        )
    cands = cands.filter(F.col(score_col).isNotNull())
    w = Window.partitionBy(prompt_col)
    s = F.col(score_col).cast("bigint")
    d = cands.select(
        prompt_col,
        cand_col,
        score_col,
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_candidates"),
        F.sum(s).over(w).alias("_sum"),
        F.sum(s * s).over(w).alias("_sumsq"),
    )
    d = d.select(
        prompt_col,
        cand_col,
        score_col,
        "n_candidates",
        (F.col("n_candidates") * s - F.col("_sum")).alias("adv_num"),
        (
            F.col("n_candidates") * F.col("_sumsq")
            - F.col("_sum") * F.col("_sum")
        ).alias("var_n2"),
    )
    return d.filter(
        (F.col("n_candidates") >= F.lit(int(min_group)))
        & (F.col("var_n2") > 0)
    ).withColumn(
        "advantage", F.col("adv_num") / F.sqrt(F.col("var_n2"))
    )


def group_advantages_oracle_sql(
    cands_sql: str,
    *,
    prompt_col: str = "prompt_id",
    cand_col: str = "cand",
    score_col: str = "score",
    min_group: int = 2,
) -> str:
    """DuckDB twin of :func:`group_advantages` — same exact-integer
    sufficient statistics through an independent window formulation."""
    return f"""
        WITH cands AS (
            SELECT * FROM ({cands_sql}) WHERE {score_col} IS NOT NULL
        ),
        stats AS (
            -- "__"-prefixed aliases: the caller's column names (e.g. a
            -- score column literally named "s") must not shadow them.
            -- __sc mirrors the Spark side's cast('bigint'): an INT32
            -- score column would overflow the square at |r| > 46340.
            SELECT {prompt_col}, {cand_col}, {score_col},
                   CAST({score_col} AS BIGINT) AS __sc,
                   count(*) OVER (PARTITION BY {prompt_col}) AS __n,
                   CAST(sum({score_col})
                        OVER (PARTITION BY {prompt_col}) AS BIGINT) AS __s,
                   sum(CAST({score_col} AS BIGINT)
                       * CAST({score_col} AS BIGINT))
                       OVER (PARTITION BY {prompt_col}) AS __ss
            FROM cands
        )
        SELECT {prompt_col}, {cand_col}, {score_col},
               CAST(__n AS BIGINT) AS n_candidates,
               CAST(__n * __sc - __s AS BIGINT) AS adv_num,
               CAST(__n * __ss - __s * __s AS BIGINT) AS var_n2,
               CAST(__n * __sc - __s AS BIGINT)
                 / sqrt(CAST(__n * __ss - __s * __s AS BIGINT)) AS advantage
        FROM stats
        WHERE __n >= {int(min_group)}
          AND __n * __ss - __s * __s > 0
    """


def best_of_n(
    cands: DataFrame,
    *,
    prompt_col: str,
    cand_col: str,
    score_col: str,
    n: int = 1,
) -> DataFrame:
    """Rejection-sampling keep set: the top ``n`` candidates per prompt by
    the same deterministic ``(score, cand_id)`` total order
    :func:`preference_pairs` uses (ties break on the id, so the keep set is
    stable under any partitioning/retry). ``n=1`` is the classic
    best-of-n distillation pick. Adds ``pick_rank`` (1 = best).

    One shuffle on the prompt key (rank window); rows out ≤ n per prompt.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(prompt_col).orderBy(
        F.col(score_col).desc(), F.col(cand_col).desc()
    )
    return (
        cands.withColumn("pick_rank", F.row_number().over(w))
        .filter(F.col("pick_rank") <= F.lit(int(n)))
    )


def pack_sft_spans(
    conv: DataFrame,
    *,
    seq_len: int,
    id_col: str = "doc_id",
    turns_col: str = "turns",
    roles: tuple[str, ...] | None = ("assistant",),
    template: ChatTemplate = DEFAULT_TEMPLATE,
    seed: str = "volga-sft-pack",
) -> tuple[DataFrame, DataFrame]:
    """Pack rendered conversations into fixed-length unit sequences and
    RE-BASE the loss-mask spans into sequence coordinates.

    The step trainers actually consume: packed-SFT batches concatenate many
    conversations into one ``seq_len`` training sequence, and every loss
    span must move with its conversation — including spans split across a
    sequence boundary. Returns ``(packed_spans, segments)``:

    - ``segments``: ``(id_col, domain, seq_id, seq_offset, doc_offset,
      span_len)`` — where each conversation's rendered stream landed
      (straight from :func:`packing.pack_sequences`, the two-phase
      256-bucket prefix sum; order is the engine-portable md5(seed:id)
      rank, so packing is a pure function of (seed, corpus)).
    - ``packed_spans``: ``(seq_id, id_col, turn_idx, role, seq_start,
      seq_end)`` — each loss span intersected with each sequence segment
      it overlaps, offsets relative to the sequence. A span straddling a
      boundary emits one clipped row per sequence; total unmasked length
      is conserved exactly.

    Units are whatever the span offsets count — chars here (the rendered
    string IS the unit stream); the arithmetic is unit-blind, so swapping
    in a tokenizer's token counts + token spans changes nothing.

    Scale: the packing shuffle is the two-phase prefix sum (no global
    window); the re-base is one co-partitioned equi-join on ``id_col``
    between two frames that are each a small multiple of the doc count.
    """
    from volga_spark.operators.packing import pack_sequences
    from volga_spark.operators.sampling import _rank

    rendered = render_conversations(conv, turns_col=turns_col, template=template)
    # n_tokens = 0 (empty turns array under an empty bos/eos template) must
    # not reach pack_sequences: a zero-length stream starting exactly on a
    # sequence boundary k*L makes its seq-id sequence() count DOWN and emit
    # a bogus (seq_offset == seq_len, span_len = 0) segment. Same guard the
    # mixture_select path applies.
    selected = rendered.select(
        F.col(id_col),
        F.lit("sft").alias("domain"),
        F.length("rendered").cast("bigint").alias("n_tokens"),
        _rank(id_col, seed).alias("rank"),
    ).filter(F.col("n_tokens") > 0)
    segments = pack_sequences(selected, seq_len, id_col=id_col)

    spans = loss_spans(
        conv, id_col=id_col, turns_col=turns_col, roles=roles, template=template
    )
    j = segments.join(spans, id_col)
    ov_start = F.greatest(F.col("doc_offset"), F.col("span_start"))
    ov_end = F.least(F.col("doc_offset") + F.col("span_len"), F.col("span_end"))
    packed = (
        j.filter(ov_end > ov_start)
        .select(
            "seq_id",
            id_col,
            "turn_idx",
            "role",
            (F.col("seq_offset") + ov_start - F.col("doc_offset")).alias(
                "seq_start"
            ),
            (F.col("seq_offset") + ov_end - F.col("doc_offset")).alias("seq_end"),
        )
    )
    return packed, segments


# Agentic-trace loss-mask policy: the model trains on its OWN tokens — the
# assistant's text and the tool-call arguments it emitted — while prompts,
# system text, and tool RESULTS (environment-produced) stay masked.
TOOL_TRAINABLE_ROLES: tuple[str, ...] = ("assistant", "tool_call")


def assemble_trajectories(
    steps: DataFrame,
    *,
    trace_col: str = "trace_id",
    step_col: str = "step_idx",
    role_col: str = "role",
    content_col: str = "content",
    out_col: str = "turns",
) -> DataFrame:
    """Assemble flat per-step rows (the shape agent logs actually arrive in:
    one row per logged step) into one turns-array row per trajectory,
    ordered by ``step_col`` — the multi-step twin of
    :func:`turns_from_documents`'s single-document bootstrap.

    Output: ``(trace_col, out_col: array<struct<idx,role,content>>)`` —
    directly consumable by :func:`render_conversations` /
    :func:`loss_spans` (pass ``roles=TOOL_TRAINABLE_ROLES`` there for the
    agentic masking policy).

    ONE exchange on the trace key (collect_list partials combine map-side);
    ordering is done inside each row by ``sort_array`` on the
    (step, role, content) struct — (step, …) is a total order per trace when
    steps are unique, so assembly is deterministic under any partitioning.
    At 100 TB this is the one unavoidable shuffle (steps of a trace must
    meet); everything downstream (render/spans/gate) is zero-shuffle.
    """
    packed = F.sort_array(
        F.collect_list(
            F.struct(
                F.col(step_col).cast("int").alias("idx"),
                F.col(role_col).alias("role"),
                F.col(content_col).alias("content"),
            )
        )
    )
    return steps.groupBy(trace_col).agg(packed.alias(out_col))


def assemble_trajectories_stream(
    steps: DataFrame,
    *,
    trace_col: str = "trace_id",
    step_col: str = "step_idx",
    role_col: str = "role",
    content_col: str = "content",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    lateness: str = "0 seconds",
    out_col: str = "turns",
) -> DataFrame:
    """Structured-Streaming twin of :func:`assemble_trajectories` — agent
    logs arrive as STREAMS of step rows, and a trajectory is only usable
    once it stops growing. Emission is watermark-driven via a NATIVE
    session window on the step event time: a trace is considered complete
    (and its turns array emitted, exactly once, in append mode) when no
    step arrives for ``gap``; a trace idle longer than ``gap`` mid-run
    splits into per-session partial trajectories — the standard
    session-window semantics, and usually the right curation call for an
    agent that stalled.

    Entirely JVM-native (``session_window`` + ``collect_list`` + in-row
    ``sort_array``): no Python handler, no custom state codec; state per
    in-flight trace is its buffered steps, GC'd by the watermark. Output:
    ``(trace_col, trace_start, out_col)`` — downstream render/spans/gate
    are stateless and run unchanged on the result (one-config-N-modes).

    This is a WATERMARK-ONLY-FLUSH pipeline (append mode, no punctuation
    rows): the last open sessions only emit once a later batch advances
    the watermark past them. Drive it with
    ``run_available_now_to_memory(..., no_data_batches=True)`` so the
    availableNow trigger keeps its trailing empty batch (the harness
    disables no-data batches by default — see streaming/runner).
    """
    s = steps.withWatermark(ts_col, lateness)
    packed = F.sort_array(
        F.collect_list(
            F.struct(
                F.col(step_col).cast("int").alias("idx"),
                F.col(role_col).alias("role"),
                F.col(content_col).alias("content"),
            )
        )
    )
    return (
        s.groupBy(F.session_window(F.col(ts_col), gap), F.col(trace_col))
        .agg(packed.alias(out_col))
        .select(
            trace_col,
            F.col("session_window.start").alias("trace_start"),
            out_col,
        )
    )


def trace_outcome_ok(
    turns: Column,
    *,
    result_role: str = "tool_result",
    error_prefix: str = "ERROR: ",
) -> Column:
    """Boolean trajectory-outcome gate (zero-shuffle array predicate): a
    trace is keepable when it COMPLETED the tool loop (has at least one
    ``result_role`` turn) and no tool result reports an error
    (``error_prefix``). Failed/truncated trajectories are the standard
    drop class in agentic SFT curation; apply as
    ``conv.filter(trace_outcome_ok(F.col("turns")))``."""
    is_res = lambda t: _nn(t["role"]) == F.lit(result_role)  # noqa: E731
    return F.exists(turns, is_res) & ~F.exists(
        turns,
        lambda t: is_res(t) & _nn(t["content"]).startswith(error_prefix),
    )


def conversation_fingerprint(
    conv: DataFrame,
    *,
    turns_col: str = "turns",
    out_col: str = "conv_digest",
) -> DataFrame:
    """Content-identity digest for conversation-level exact dedup: md5 over
    the role/content stream with field separators (template-independent —
    two conversations that differ only in rendering markers collide, which
    is the dedup semantics we want). Feeds the existing exact-dedup tier
    (digest groupBy; only the 16-byte digest ever shuffles)."""
    # _nn keeps the digest aligned with the NULL-safe render semantics:
    # without it, a NULL field collapses its separator (concat_ws skips
    # NULLs), so [(role, NULL)] and [(NULL, role)] would collide while two
    # conversations that RENDER identically could digest differently.
    joined = F.concat_ws(
        "\x1e",
        F.transform(
            F.col(turns_col),
            lambda t: F.concat_ws("\x1f", _nn(t["role"]), _nn(t["content"])),
        ),
    )
    return conv.withColumn(out_col, F.md5(joined))
