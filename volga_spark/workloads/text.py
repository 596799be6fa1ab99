"""Text-analysis workloads over `documents` (training-data pipeline ops).

All-native column expressions; the single consolidated query (r03) carries
every text-analysis capability as a column — token stats, quality score,
language-ID, content fingerprints, BPE-ish tokenization — at one row per
document, so one scan verifies the whole surface. Every column has the
identical arithmetic in the DuckDB oracle (integer-derived doubles →
bit-identical)."""

from __future__ import annotations

from pyspark.sql import functions as F

from volga_spark.operators.text import (
    gopher_quality_flags,
    LANG_STOPWORDS,
    avg_token_len,
    digit_ratio,
    fingerprint,
    lang_scores,
    normalized_fingerprint,
    predicted_lang,
    quality_score,
    stopword_ratio,
    token_count,
)
from volga_spark.partitioning import widen_for_python
from volga_spark.tables import load_table
from volga_spark.workloads import workload


def _duck_hits(words) -> str:
    lst = ", ".join(f"'{w}'" for w in words)
    return f"CAST(len(list_filter(string_split(text, ' '), t -> t IN ({lst}))) AS BIGINT)"


_LANG_CASE = """
               CASE
                 WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
                 WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
                 WHEN s_es >= s_en AND s_es >= s_de AND s_es >= s_fr AND s_es >= s_zh THEN 'es'
                 WHEN s_fr >= s_en AND s_fr >= s_de AND s_fr >= s_es AND s_fr >= s_zh THEN 'fr'
                 ELSE 'zh'
               END
"""


@workload(
    "q_text_analysis",
    oracle=f"""
        WITH base AS (
            SELECT doc_id, lang, text,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
                   {_duck_hits(LANG_STOPWORDS["en"])} AS hits,
                   (length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))
                       / length(text) AS dr,
                   {", ".join(f'{_duck_hits(w)} AS s_{lang}' for lang, w in LANG_STOPWORDS.items())}
            FROM documents
        )
        SELECT doc_id,
               n AS n_tokens,
               (length(text) - (n - 1)) / n AS avg_tok_len,
               hits / n AS stop_ratio,
               dr AS digit_ratio,
               (CASE WHEN n >= 20 AND n <= 1000 THEN 1.0 ELSE 0.5 END)
               * (0.5 + 0.5 * (hits / n)) - dr AS quality,
               lang AS labeled_lang,
               {_LANG_CASE} AS pred_lang,
               s_en, s_de, s_es, s_fr, s_zh,
               md5(text) AS fp,
               md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm_fp,
               CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS BIGINT)
                   AS n_bpe_tokens,
               CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_number_tokens,
               (n >= 50 AND n <= 100000) AS g_word_count_ok,
               ((length(text) - (n - 1)) / n >= 3
                AND (length(text) - (n - 1)) / n <= 10) AS g_mean_word_len_ok,
               (((length(text) - length(replace(text, '#', '')))
                 + (length(text) - length(replace(text, '...', ''))) / 3.0)
                / n <= 0.1) AS g_symbol_ratio_ok,
               (len(list_filter(string_split(text, ' '),
                                t -> regexp_matches(t, '[A-Za-z]'))) / n >= 0.8)
                   AS g_alpha_word_ratio_ok,
               (len(list_filter(['the','be','to','of','and','that','have','with'],
                                w -> list_contains(string_split(text, ' '), w))) >= 2)
                   AS g_required_words_ok
        FROM base
    """,
    tags=("text",),
)
def q_text_analysis(spark, sf_dir):
    """Full text-analysis surface in one scan: token counting + quality-signal
    ratios (whitespace tokenizer), composite quality score (length band ×
    stopword signal − digits), stopword-hit language-ID heuristic with
    deterministic tie-break, content + normalized md5 fingerprints, and
    BPE-ish pre-tokenization counts (word / number / punctuation runs — the
    GPT-2 pre-tokenizer shape) via regexp_extract_all on both engines."""
    # every output column below is a regex / higher-order expr over `text` —
    # JVM-native but CPU-heavy, and a single-row-group local scan would run
    # it all on one core; widen first (no-op cost at scale: one round-robin
    # pass over the 3-column projection, and a real corpus scan is already
    # wide so the guard exists for under-split inputs)
    d = widen_for_python(load_table(spark, sf_dir, "documents"))
    scores = lang_scores("text")
    # explicit space class: Spark SQL string literals consume backslash
    # escapes, so a '\s' pattern silently differs between engines
    pat = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"
    return d.select(
        "doc_id",
        token_count("text").cast("bigint").alias("n_tokens"),
        avg_token_len("text").alias("avg_tok_len"),
        stopword_ratio("text").alias("stop_ratio"),
        digit_ratio("text").alias("digit_ratio"),
        quality_score("text").alias("quality"),
        F.col("lang").alias("labeled_lang"),
        predicted_lang("text").alias("pred_lang"),
        *[scores[lang].cast("bigint").alias(f"s_{lang}") for lang in LANG_STOPWORDS],
        fingerprint("text").alias("fp"),
        normalized_fingerprint("text").alias("norm_fp"),
        F.size(F.expr(f"regexp_extract_all(text, '{pat}', 0)")).cast("bigint").alias("n_bpe_tokens"),
        F.size(F.expr("regexp_extract_all(text, '[0-9]+', 0)")).cast("bigint").alias("n_number_tokens"),
        # Gopher rule subset with exact SQL mirrors (line-based rules are
        # operator-only, pytest-covered)
        *[
            gopher_quality_flags("text")[k].alias(k)
            for k in (
                "g_word_count_ok",
                "g_mean_word_len_ok",
                "g_symbol_ratio_ok",
                "g_alpha_word_ratio_ok",
                "g_required_words_ok",
            )
        ],
    )
