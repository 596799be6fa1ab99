"""Text-analysis workloads over `documents` (training-data pipeline ops).

All-native column expressions; every query has a DuckDB oracle with the
identical arithmetic (integer-derived doubles → bit-identical)."""

from __future__ import annotations

from pyspark.sql import functions as F

from volga_spark.operators.text import (
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
from volga_spark.tables import load_table
from volga_spark.workloads import workload


def _duck_hits(words) -> str:
    lst = ", ".join(f"'{w}'" for w in words)
    return f"CAST(len(list_filter(string_split(text, ' '), t -> t IN ({lst}))) AS BIGINT)"


@workload(
    "q_text_stats",
    oracle=f"""
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               (length(text) - (CAST(len(string_split(text, ' ')) AS BIGINT) - 1))
                   / CAST(len(string_split(text, ' ')) AS BIGINT) AS avg_tok_len,
               {_duck_hits(LANG_STOPWORDS["en"])}
                   / CAST(len(string_split(text, ' ')) AS BIGINT) AS stop_ratio,
               (length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))
                   / length(text) AS digit_ratio
        FROM documents
    """,
    tags=("text",),
)
def q_text_stats(spark, sf_dir):
    """Token counting + quality-signal ratios (whitespace tokenizer)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        token_count("text").cast("bigint").alias("n_tokens"),
        avg_token_len("text").alias("avg_tok_len"),
        stopword_ratio("text").alias("stop_ratio"),
        digit_ratio("text").alias("digit_ratio"),
    )


@workload(
    "q_text_quality",
    oracle=f"""
        WITH t AS (
            SELECT doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
                   {_duck_hits(LANG_STOPWORDS["en"])} AS hits,
                   (length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))
                       / length(text) AS dr
            FROM documents
        )
        SELECT doc_id,
               (CASE WHEN n >= 20 AND n <= 1000 THEN 1.0 ELSE 0.5 END)
               * (0.5 + 0.5 * (hits / n)) - dr AS quality
        FROM t
    """,
    tags=("text",),
)
def q_text_quality(spark, sf_dir):
    """Composite quality score (length band × stopword signal − digits)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", quality_score("text").alias("quality"))


@workload(
    "q_text_lang_id",
    oracle=(
        lambda hits=_duck_hits: f"""
        WITH s AS (
            SELECT doc_id, lang AS labeled_lang,
                   {", ".join(f'{hits(w)} AS s_{lang}' for lang, w in LANG_STOPWORDS.items())}
            FROM documents
        )
        SELECT doc_id, labeled_lang,
               CASE
                 WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
                 WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
                 WHEN s_es >= s_en AND s_es >= s_de AND s_es >= s_fr AND s_es >= s_zh THEN 'es'
                 WHEN s_fr >= s_en AND s_fr >= s_de AND s_fr >= s_es AND s_fr >= s_zh THEN 'fr'
                 ELSE 'zh'
               END AS pred_lang,
               s_en, s_de, s_es, s_fr, s_zh
        FROM s
    """
    )(),
    tags=("text",),
)
def q_text_lang_id(spark, sf_dir):
    """Stopword-hit language-ID heuristic with deterministic tie-break."""
    d = load_table(spark, sf_dir, "documents")
    scores = lang_scores("text")
    return d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        predicted_lang("text").alias("pred_lang"),
        *[scores[lang].cast("bigint").alias(f"s_{lang}") for lang in LANG_STOPWORDS],
    )


@workload(
    "q_text_fingerprint",
    oracle="""
        SELECT doc_id, md5(text) AS fp,
               md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm_fp
        FROM documents
    """,
    tags=("text",),
)
def q_text_fingerprint(spark, sf_dir):
    """Content + normalized fingerprints (md5 — identical across engines)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        fingerprint("text").alias("fp"),
        normalized_fingerprint("text").alias("norm_fp"),
    )


@workload(
    "q_text_tokens_bpe",
    oracle="""
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS BIGINT)
                   AS n_bpe_tokens,
               CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_number_tokens
        FROM documents
    """,
    tags=("text",),
)
def q_text_tokens_bpe(spark, sf_dir):
    """BPE-ish pre-tokenization count (word / number / punctuation runs —
    the GPT-2 pre-tokenizer shape) via regexp_extract_all on both engines."""
    d = load_table(spark, sf_dir, "documents")
    # explicit space class: Spark SQL string literals consume backslash
    # escapes, so a '\s' pattern silently differs between engines
    pat = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"
    return d.select(
        "doc_id",
        F.size(F.expr(f"regexp_extract_all(text, '{pat}', 0)")).cast("bigint").alias("n_bpe_tokens"),
        F.size(F.expr("regexp_extract_all(text, '[0-9]+', 0)")).cast("bigint").alias("n_number_tokens"),
    )
