"""End-to-end training-data curation pipeline over `documents`.

The composed shape every LLM data pipeline runs before training — quality
gate → exact dedup keep-one → benchmark decontamination → token accounting —
as ONE DataFrame program, fully mirrored by a DuckDB oracle (every stage is
SQL-expressible, so the whole composition is hash-checked end to end, not
just its pieces).

Scale shape: quality flags and token counts are map-side native expressions
fused into the scan; dedup canonical-pick is one shuffle on the 16-byte text
digest; decontamination broadcasts the (tiny) benchmark gram set and probes
map-side (`operators/dedup.py:decontaminate`) — no corpus-side wide shuffle
beyond the digest groupBy. At 100 TB this is two narrow passes + one
digest-keyed exchange.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from volga_spark.operators.dedup import decontaminate
from volga_spark.operators.text import gopher_quality_flags, token_count
from volga_spark.partitioning import widen_for_python
from volga_spark.tables import load_table
from volga_spark.workloads import workload

# deterministic held-out "benchmark" slice: every 31st doc plays the role of
# an eval suite; the rest is the training corpus to curate
_BENCH_MOD = 31
_GRAM_N = 13

_ORACLE = f"""
    WITH corpus AS (
        SELECT doc_id, text, source, string_split(text, ' ') AS t
        FROM documents WHERE doc_id % {_BENCH_MOD} <> 0
    ),
    bench AS (
        SELECT doc_id, string_split(text, ' ') AS t
        FROM documents WHERE doc_id % {_BENCH_MOD} = 0
    ),
    bench_grams AS (
        SELECT DISTINCT unnest([array_to_string(t[i:i+{_GRAM_N - 1}], ' ')
                                for i in range(1, len(t) - {_GRAM_N - 1} + 1)]) AS g
        FROM bench WHERE len(t) >= {_GRAM_N}
    ),
    corpus_grams AS (
        SELECT doc_id,
               unnest(list_distinct([array_to_string(t[i:i+{_GRAM_N - 1}], ' ')
                                     for i in range(1, len(t) - {_GRAM_N - 1} + 1)])) AS g
        FROM corpus WHERE len(t) >= {_GRAM_N}
    ),
    hits AS (
        SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_contaminated_grams
        FROM corpus_grams c JOIN bench_grams b USING (g)
        GROUP BY c.doc_id
    ),
    flags AS (
        SELECT doc_id, text, source,
               CAST(len(t) AS BIGINT) AS n_tokens,
               CAST(len(t) AS DOUBLE) AS n,
               (length(text) - (len(t) - 1)) / len(t) AS mean_len,
               (length(text) - length(replace(text, '#', ''))) AS hash_count,
               (length(text) - length(replace(text, '...', ''))) / 3.0 AS ellipsis_count,
               CAST(len(string_split(text, chr(10))) AS DOUBLE) AS n_lines,
               CAST(len(list_filter(string_split(text, chr(10)),
                    l -> l LIKE '-%' OR l LIKE '*%' OR l LIKE '•%')) AS DOUBLE)
                   AS bullet_lines,
               CAST(len(list_filter(string_split(text, chr(10)),
                    l -> l LIKE '%...')) AS DOUBLE) AS ellipsis_lines,
               CAST(len(list_filter(string_split(text, ' '),
                    w -> regexp_matches(w, '[A-Za-z]'))) AS DOUBLE) AS alpha_words,
               len(list_filter(['the','be','to','of','and','that','have','with'],
                   w -> list_contains(string_split(text, ' '), w))) AS req_present
        FROM corpus
    ),
    gated AS (
        SELECT doc_id, text, source, n_tokens,
               (n >= 50 AND n <= 100000)
               AND (mean_len >= 3 AND mean_len <= 10)
               AND ((hash_count + ellipsis_count) / n <= 0.1)
               AND (bullet_lines / n_lines <= 0.9)
               AND (ellipsis_lines / n_lines <= 0.3)
               AND (alpha_words / n >= 0.8) AS quality_ok,
               (n >= 50 AND n <= 100000)
               AND (mean_len >= 3 AND mean_len <= 10)
               AND ((hash_count + ellipsis_count) / n <= 0.1)
               AND (bullet_lines / n_lines <= 0.9)
               AND (ellipsis_lines / n_lines <= 0.3)
               AND (alpha_words / n >= 0.8)
               AND (req_present >= 2) AS gopher_pass
        FROM flags
    ),
    canon AS (
        SELECT doc_id, source, n_tokens, quality_ok, gopher_pass,
               doc_id = min(doc_id) OVER (PARTITION BY md5(text)) AS is_canonical
        FROM gated
    ),
    final AS (
        SELECT c.doc_id, c.source, c.n_tokens, c.quality_ok, c.gopher_pass,
               c.is_canonical,
               COALESCE(h.n_contaminated_grams, 0) AS n_contaminated_grams,
               COALESCE(h.n_contaminated_grams, 0) > 0 AS contaminated,
               c.quality_ok AND c.is_canonical
                   AND COALESCE(h.n_contaminated_grams, 0) = 0 AS keep
        FROM canon c LEFT JOIN hits h USING (doc_id)
    ),
    src AS (
        SELECT source, sum(n_tokens) AS tok_s FROM final WHERE keep GROUP BY source
    ),
    zt AS (
        SELECT sum(CAST(floor(sqrt(tok_s)) AS BIGINT)) AS z,
               sum(tok_s) AS total_tok
        FROM src
    ),
    rates AS (
        SELECT source,
               least(1.0, 0.5 * total_tok * floor(sqrt(tok_s)) / z / tok_s)
                   AS mix_rate
        FROM src, zt
    )
    SELECT f.doc_id, f.source, f.n_tokens, f.quality_ok, f.gopher_pass,
           f.is_canonical, f.n_contaminated_grams, f.contaminated, f.keep,
           COALESCE(r.mix_rate, 0.0) AS mix_rate,
           f.keep AND ((f.doc_id * 2654435761) % 4294967296) / 4294967296.0
               < COALESCE(r.mix_rate, 0.0) AS sampled
    FROM final f LEFT JOIN rates r USING (source)
"""


@workload("q_training_pipeline", oracle=_ORACLE, tags=("text", "dedup", "pipeline"))
def q_training_pipeline(spark, sf_dir):
    """Composed curation pipeline, one row per corpus document:

    1. **Quality gate** — the Gopher rule set as native expressions. The
       verdict uses the LANGUAGE-AGNOSTIC subset (``quality_ok``: word
       count, mean word length, symbol ratio, bullet/ellipsis line
       fractions, alpha-word ratio); the English-only required-stop-words
       rule is reported in the full ``gopher_pass`` column but excluded
       from ``keep`` — in a real multilingual pipeline it gates on
       predicted language, and this synthetic corpus has no English
       function words at all (the rule would reject 100% and make the
       composed verdict degenerate).
    2. **Exact dedup** — canonical = smallest doc_id per text digest; only
       the 16-byte digest shuffles.
    3. **Decontamination** — GPT-3-style 13-gram overlap against the
       held-out benchmark slice (doc_id % {mod} == 0), benchmark grams
       broadcast, corpus probe map-side.
    4. **Verdict** — ``keep`` = passes quality AND canonical AND clean,
       with per-document token counts for downstream budget accounting.
    5. **Domain mixing + budget sampling** — temperature-weighted per-source
       rates (w_s ∝ tok_s^0.5, the Pile/LLaMA-style α=0.5 rebalance toward
       small domains) scaled to a 50%-of-kept-tokens budget, then a
       DETERMINISTIC per-document draw (Knuth multiplicative hash of
       doc_id) — ``sampled`` is the final training-set membership, and the
       identical arithmetic runs on both engines so even the float mixing
       rates hash-match. Per-source totals are a tiny aggregate (sources
       are O(100) at any scale) broadcast back onto the corpus.
    """.format(mod=_BENCH_MOD)
    d = load_table(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % _BENCH_MOD == 0)
    # the gram explode + regex rules are native but CPU-heavy — widen the
    # under-split local scan (no-op shape at real corpus scale)
    corpus = widen_for_python(
        d.filter(F.col("doc_id") % _BENCH_MOD != 0).select("doc_id", "text", "source")
    )

    dec = decontaminate(corpus, bench, "text", "doc_id", n=_GRAM_N)
    flags = gopher_quality_flags("text")
    quality_ok = (
        flags["g_word_count_ok"]
        & flags["g_mean_word_len_ok"]
        & flags["g_symbol_ratio_ok"]
        & flags["g_bullet_lines_ok"]
        & flags["g_ellipsis_lines_ok"]
        & flags["g_alpha_word_ratio_ok"]
    )
    # evaluate every text-derived metric MAP-SIDE and reduce the row to
    # (ids, digest, flags) before the canonical-pick exchange: the shuffle
    # carries a 16-byte digest + booleans, never document text — at 100 TB
    # the window exchange is the only wide move in this pipeline and must
    # not ship the corpus
    per_doc = dec.select(
        "doc_id",
        "source",
        token_count("text").cast("bigint").alias("n_tokens"),
        quality_ok.alias("quality_ok"),
        flags["gopher_pass"].alias("gopher_pass"),
        F.md5("text").alias("__fp"),
        "n_contaminated_grams",
        "contaminated",
    )
    w = Window.partitionBy("__fp")
    # `final` feeds THREE plan branches (per-source token totals, the Z
    # normalizer via src, and the output join); without materialization the
    # gram-explode + quality-flag upstream executes once per branch (~3 full
    # corpus passes, 9 scans / 26 exchanges measured at sf0.1).
    # localCheckpoint pins the small reduced frame (ids + booleans, no text)
    # so the expensive subtree runs exactly once — blocks are released by
    # `caching.release_cached_blocks` (bench does this per trial).
    final = per_doc.withColumn(
        "is_canonical", F.col("doc_id") == F.min("doc_id").over(w)
    ).select(
        "doc_id",
        "source",
        "n_tokens",
        "quality_ok",
        "gopher_pass",
        "is_canonical",
        "n_contaminated_grams",
        "contaminated",
        (
            F.col("quality_ok")
            & F.col("is_canonical")
            & ~F.col("contaminated")
        ).alias("keep"),
    ).localCheckpoint(eager=False)

    # domain mixing: per-source kept-token totals → α=0.5 temperature
    # weights → rates for a 0.5×total budget (identical expression order on
    # both engines so the double-typed rates are bit-identical)
    src = final.filter("keep").groupBy("source").agg(
        F.sum("n_tokens").alias("tok_s")
    )
    # weights integer-quantized (floor of an IEEE-exact sqrt) so the
    # cross-source normalizer Z is an exact INTEGER sum — float sums are
    # accumulation-order-sensitive and would drift ulps between engines
    zt = src.agg(
        F.sum(F.floor(F.sqrt("tok_s")).cast("bigint")).alias("z"),
        F.sum("tok_s").alias("total_tok"),
    )
    rates = src.crossJoin(F.broadcast(zt)).select(
        "source",
        F.least(
            F.lit(1.0),
            F.lit(0.5)
            * F.col("total_tok")
            * F.floor(F.sqrt("tok_s"))
            / F.col("z")
            / F.col("tok_s"),
        ).alias("mix_rate"),
    )
    u = (F.col("doc_id") * F.lit(2654435761)) % F.lit(4294967296) / F.lit(4294967296.0)
    return (
        final.join(F.broadcast(rates), "source", "left")
        .withColumn("mix_rate", F.coalesce("mix_rate", F.lit(0.0)))
        .withColumn("sampled", F.col("keep") & (u < F.col("mix_rate")))
        .select(
            "doc_id",
            "source",
            "n_tokens",
            "quality_ok",
            "gopher_pass",
            "is_canonical",
            "n_contaminated_grams",
            "contaminated",
            "keep",
            "mix_rate",
            "sampled",
        )
    )
