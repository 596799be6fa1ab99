"""Pre-training OBJECTIVE preparation: span corruption (T5) and
fill-in-the-middle (FIM) document transforms.

The last transform a pre-training pipeline applies before packing is the
objective itself: denoising corpora rewrite each document into an
(input, target) pair with sentinel tokens (Raffel et al. 2020, T5), and
code corpora reorder documents into prefix/suffix/middle form so the model
learns infilling (Bavarian et al. 2022, "Efficient Training of Language
Models to Fill in the Middle"). Both are pure per-document rewrites —
ZERO shuffles, all native array expressions — so at 100 TB they run at
scan speed; the only state is the deterministic md5-derived randomness,
which makes every output an exact pure function of (seed, corpus) that a
DuckDB oracle reproduces byte-for-byte (the repo's engine-portable
determinism rule, same construction as ``sampling._rank``).

Word-level units throughout (the corpus' whitespace tokens); the
arithmetic is unit-blind — swapping in BPE ids changes the split, not the
operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 60-bit md5 prefix as BIGINT — same fixed-point construction as
# operators/overlap and sampling._rank; DuckDB twin:
# CAST('0x' || substr(md5(expr), 1, 15) AS BIGINT)
def _h60(parts: list[Column]) -> Column:
    return F.conv(
        F.substring(F.md5(F.concat_ws(":", *parts)), 1, 15), 16, 10
    ).cast("long")


# --- fill-in-the-middle ------------------------------------------------------


def fim_transform(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: str = "volga-fim",
    min_tokens: int = 4,
    prefix_tok: str = "<fim_prefix>",
    suffix_tok: str = "<fim_suffix>",
    middle_tok: str = "<fim_middle>",
    keep_cols: bool = False,
    replace_text: bool = False,
) -> DataFrame:
    """PSM-mode FIM rewrite: two deterministic md5-derived cut points split
    the token stream into prefix / middle / suffix, rendered as
    ``<fim_prefix> P <fim_suffix> S <fim_middle> M`` — the
    prefix-suffix-middle ordering, so the trainable middle sits at the
    end of the sequence (causal LM learns infilling for free).

    Documents under ``min_tokens`` pass through unchanged
    (``fim_applied = false``) — cutting a 2-token doc teaches nothing.
    Cut points: ``c = 1 + h60(seed:id:i) % (n - 1)`` for i ∈ {1, 2},
    sorted — both in [1, n-1], so prefix and the (middle+suffix) remainder
    are always non-empty; middle may be empty when the cuts collide
    (the FIM paper keeps those: an empty infill is a valid task).

    Output: ``(id_col, fim_text, fim_applied, n_tokens)``; with
    ``keep_cols=True`` the three new columns append to the FULL input frame
    (refused with ValueError if the input already carries any of those
    names — appending must never silently overwrite caller data); with
    ``replace_text=True`` the rewrite lands IN ``text_col`` and no other
    column is touched (the curation-stage shape). All zero-shuffle, no join.
    """
    if int(min_tokens) < 2:
        raise ValueError(f"min_tokens must be >= 2 (got {min_tokens})")
    if replace_text and keep_cols:
        # replace_text used to silently win; the caller asked for two
        # mutually-exclusive output shapes — refuse rather than guess
        raise ValueError("replace_text and keep_cols are mutually exclusive")
    ws = F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
    n = F.size(ws)
    idc = F.col(id_col)
    # greatest(1, n-1): CASE already guards the applied branch, but under
    # ANSI a 1-token row would still die at % 0 if an engine ever evaluated
    # eagerly — clamp identically here and in the oracle (no-op when applied)
    den = F.greatest(F.lit(1), n - 1)
    c1 = (_h60([F.lit(seed), idc, F.lit("1")]) % den + 1).cast("int")
    c2 = (_h60([F.lit(seed), idc, F.lit("2")]) % den + 1).cast("int")
    lo, hi = F.least(c1, c2), F.greatest(c1, c2)
    join_ = lambda a: F.array_join(a, " ")  # noqa: E731
    rendered = F.concat_ws(
        " ",
        F.lit(prefix_tok),
        join_(F.slice(ws, 1, lo)),
        F.lit(suffix_tok),
        join_(F.slice(ws, hi + 1, n - hi)),
        F.lit(middle_tok),
        join_(F.slice(ws, lo + 1, hi - lo)),
    )
    applied = n >= F.lit(int(min_tokens))
    fim_text = F.when(applied, rendered).otherwise(
        F.coalesce(F.col(text_col), F.lit(""))
    )
    if replace_text:
        return docs.withColumn(text_col, fim_text)
    if keep_cols:
        clash = {"fim_text", "fim_applied", "n_tokens"} & set(docs.columns)
        if clash:
            raise ValueError(
                f"keep_cols=True would overwrite existing columns {sorted(clash)}"
                " — rename them first, or use replace_text=True"
            )
        return (
            docs.withColumn("fim_text", fim_text)
            .withColumn("fim_applied", applied)
            .withColumn("n_tokens", n.cast("bigint"))
        )
    return docs.select(
        idc,
        fim_text.alias("fim_text"),
        applied.alias("fim_applied"),
        n.cast("bigint").alias("n_tokens"),
    )


def fim_oracle_sql(
    docs_sql: str,
    *,
    id_col: str = "doc_id",
    seed: str = "volga-fim",
    min_tokens: int = 4,
    prefix_tok: str = "<fim_prefix>",
    suffix_tok: str = "<fim_suffix>",
    middle_tok: str = "<fim_middle>",
) -> str:
    """DuckDB twin of :func:`fim_transform` — byte-identical fim_text."""
    from volga_spark.operators.sampling import sql_quote as esc

    seed = esc(seed)
    prefix_tok, suffix_tok, middle_tok = (
        esc(prefix_tok), esc(suffix_tok), esc(middle_tok),
    )
    h = (
        lambda tag: f"CAST(('0x' || substr(md5('{seed}:' || {id_col} "
        f"|| ':{tag}'), 1, 15)) AS BIGINT)"
    )
    return f"""
        WITH d AS (
            SELECT {id_col},
                   string_split(coalesce(text, ''), ' ') AS ws
            FROM ({docs_sql})
        ),
        cuts AS (
            SELECT {id_col}, ws, len(ws) AS n,
                   1 + {h('1')} % greatest(1, len(ws) - 1) AS a,
                   1 + {h('2')} % greatest(1, len(ws) - 1) AS b
            FROM d
        ),
        c AS (
            SELECT {id_col}, ws, n,
                   least(a, b) AS lo, greatest(a, b) AS hi
            FROM cuts
        )
        SELECT {id_col},
               -- coalesce: DuckDB array_to_string([]) is NULL (Spark's
               -- array_join gives ''), and concat_ws SKIPS NULLs — an empty
               -- middle would silently drop its separator byte
               CASE WHEN n >= {int(min_tokens)} THEN
                   concat_ws(' ',
                       '{prefix_tok}',
                       coalesce(array_to_string(ws[1:lo], ' '), ''),
                       '{suffix_tok}',
                       coalesce(array_to_string(ws[hi+1:n], ' '), ''),
                       '{middle_tok}',
                       coalesce(array_to_string(ws[lo+1:hi], ' '), ''))
               ELSE coalesce(array_to_string(ws, ' '), '') END AS fim_text,
               n >= {int(min_tokens)} AS fim_applied,
               CAST(n AS BIGINT) AS n_tokens
        FROM c
    """


# --- T5 span corruption ------------------------------------------------------


def span_corruption(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_len: int = 3,
    corrupt_one_in: int = 5,
    seed: str = "volga-t5",
    sentinel: str = "<extra_id_{}>",
) -> DataFrame:
    """T5-style span-corruption rewrite: the token stream splits into
    fixed ``span_len`` windows; window ``w`` of document ``id`` is
    corrupted iff ``h60(seed:id:w) % corrupt_one_in == 0`` (≈1/r of
    text masked — T5's 15% at r≈7/span_len·…; the knobs are explicit).
    The INPUT keeps uncorrupted text and replaces each corrupted window
    with one numbered sentinel; the TARGET lists each sentinel followed
    by the window it replaced, closed by a final sentinel — exactly the
    T5 objective encoding.

    Implementation is ONE ``aggregate`` fold over the window sequence
    carrying (sentinel counter, input parts, target parts) — zero
    shuffles, scan-parallel. Cost note: the fold's accumulator concat
    copies the parts array per step, so per-document work is O(W²) in the
    WINDOW count (like every fold-built array in this repo, e.g.
    loss_spans' span list) — irrelevant at typical window counts (a
    30-token doc has 10 windows) and bounded by max doc length; corpora
    with 100k-token documents should chunk first (operators/chunking).
    Output: ``(id_col, input_text, target_text, n_corrupted, n_tokens)``.
    """
    L = int(span_len)
    r = int(corrupt_one_in)
    if L < 1 or r < 1:
        raise ValueError(f"span_len/corrupt_one_in must be >= 1 (got {L}, {r})")
    if sentinel.count("{}") != 1:
        # a '{}'-less sentinel would IndexError deep in expression
        # construction; two placeholders would silently drop a fragment
        raise ValueError(
            f"sentinel must contain exactly one '{{}}' (got {sentinel!r})"
        )
    ws = F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
    n = F.size(ws)
    idc = F.col(id_col)
    n_win = F.floor((n + F.lit(L - 1)) / F.lit(L)).cast("int")  # >= 1
    wins = F.sequence(F.lit(0), n_win - F.lit(1))

    acc_t = "struct<k:int,inp:array<string>,tgt:array<string>>"
    init = F.expr(f"CAST(struct(0, array(), array()) AS {acc_t})")

    def step(acc: Column, w: Column) -> Column:
        wtext = F.array_join(F.slice(ws, w * L + F.lit(1), F.lit(L)), " ")
        corrupted = _h60([F.lit(seed), idc, w.cast("string")]) % r == 0
        sent = F.concat(
            F.lit(sentinel.split("{}")[0]),
            acc["k"].cast("string"),
            F.lit(sentinel.split("{}")[1]),
        )
        return F.when(
            corrupted,
            F.struct(
                (acc["k"] + 1).alias("k"),
                F.concat(acc["inp"], F.array(sent)).alias("inp"),
                F.concat(acc["tgt"], F.array(sent, wtext)).alias("tgt"),
            ),
        ).otherwise(
            F.struct(
                acc["k"].alias("k"),
                F.concat(acc["inp"], F.array(wtext)).alias("inp"),
                acc["tgt"].alias("tgt"),
            )
        )

    folded = F.aggregate(wins, init, step)
    final_sent = F.concat(
        F.lit(sentinel.split("{}")[0]),
        folded["k"].cast("string"),
        F.lit(sentinel.split("{}")[1]),
    )
    target = F.when(
        folded["k"] > 0,
        F.concat_ws(" ", F.array_join(folded["tgt"], " "), final_sent),
    ).otherwise(F.lit(""))
    return docs.select(
        idc,
        F.array_join(folded["inp"], " ").alias("input_text"),
        target.alias("target_text"),
        folded["k"].cast("bigint").alias("n_corrupted"),
        n.cast("bigint").alias("n_tokens"),
    )


def span_corruption_oracle_sql(
    docs_sql: str,
    *,
    id_col: str = "doc_id",
    span_len: int = 3,
    corrupt_one_in: int = 5,
    seed: str = "volga-t5",
    sentinel: str = "<extra_id_{}>",
) -> str:
    """DuckDB twin of :func:`span_corruption` — byte-identical input/target
    (the SQL formulation is the INDEPENDENT one: explode windows, window
    functions for the sentinel numbering, ordered string_agg re-assembly —
    vs Spark's in-row fold)."""
    L, r = int(span_len), int(corrupt_one_in)
    from volga_spark.operators.sampling import sql_quote as esc

    pre, post = (esc(p) for p in sentinel.split("{}"))
    seed = esc(seed)
    h = (
        f"CAST(('0x' || substr(md5('{seed}:' || {id_col} || ':' || w), 1, 15))"
        f" AS BIGINT)"
    )
    return f"""
        WITH d AS (
            SELECT {id_col}, string_split(coalesce(text, ''), ' ') AS ws
            FROM ({docs_sql})
        ),
        tok AS (
            SELECT {id_col}, unnest(ws) AS word,
                   generate_subscripts(ws, 1) AS i
            FROM d
        ),
        win AS (
            SELECT {id_col}, CAST((i - 1) // {L} AS INT) AS w,
                   string_agg(word, ' ' ORDER BY i) AS wtext
            FROM tok GROUP BY {id_col}, CAST((i - 1) // {L} AS INT)
        ),
        marked AS (
            SELECT {id_col}, w, wtext,
                   ({h} % {r} = 0) AS corrupted
            FROM win
        ),
        numbered AS (
            SELECT *,
                   CAST(coalesce(sum(CASE WHEN corrupted THEN 1 ELSE 0 END)
                       OVER (PARTITION BY {id_col} ORDER BY w
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS INT) AS k
            FROM marked
        ),
        agg AS (
            SELECT {id_col},
                   string_agg(CASE WHEN corrupted
                                   THEN '{pre}' || k || '{post}'
                                   ELSE wtext END, ' ' ORDER BY w) AS input_text,
                   string_agg(CASE WHEN corrupted
                                   THEN '{pre}' || k || '{post}' || ' ' || wtext
                              END, ' ' ORDER BY w) AS tgt_body,
                   CAST(sum(CASE WHEN corrupted THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_corrupted
            FROM numbered GROUP BY {id_col}
        )
        SELECT a.{id_col}, a.input_text,
               CASE WHEN a.n_corrupted > 0
                    THEN a.tgt_body || ' ' || '{pre}' || a.n_corrupted || '{post}'
                    ELSE '' END AS target_text,
               a.n_corrupted,
               CAST(len(d.ws) AS BIGINT) AS n_tokens
        FROM agg a JOIN d USING ({id_col})
    """
