"""Text-analysis operators for training-data pipelines.

All pure Column expressions (JVM-side, codegen'd — zero Python in the hot
path): token counting, quality scoring, n-gram language-ID heuristic,
document fingerprinting. Designed for 100 TB corpora: every function is a
narrow projection over the `text` column, so scans stay pruned and the ops
pipeline inside one stage.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# language → stopword list for the n-gram/stopword language-ID heuristic.
# Deterministic and tiny by design — swap for fastText/CLD3 offline models in
# production (not available in this image; the *plumbing* is identical).
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "that"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "una"),
    "fr": ("le", "la", "les", "de", "et", "un", "une", "est"),
    "zh": ("de", "shi", "bu", "le", "wo", "ni", "ta", "men"),
}


def tokens(text: str | Column) -> Column:
    """Whitespace tokenization (the corpus is single-space separated)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def token_count(text: str | Column) -> Column:
    return F.size(tokens(text))


def avg_token_len(text: str | Column) -> Column:
    """(chars - separators) / tokens — exact for single-space text."""
    c = F.col(text) if isinstance(text, str) else text
    n = token_count(c)
    return (F.length(c) - (n - F.lit(1))) / n


def stopword_hits(text: str | Column, words: tuple[str, ...]) -> Column:
    lst = ", ".join(f"'{w}'" for w in words)
    col = text if isinstance(text, str) else None
    expr = col if col else "text"
    return F.expr(f"size(filter(split({expr}, ' '), t -> t IN ({lst})))")


def stopword_ratio(text: str, words: tuple[str, ...] | None = None) -> Column:
    words = words or LANG_STOPWORDS["en"]
    return stopword_hits(text, words) / token_count(text)


def digit_ratio(text: str | Column) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return (F.length(c) - F.length(F.regexp_replace(c, "[0-9]", ""))) / F.length(c)


def quality_score(text: str) -> Column:
    """Composite heuristic quality in [0,1]: length band + stopword presence
    - digit pollution. Fixed arithmetic → identical across engines."""
    n = token_count(text)
    len_ok = F.when((n >= 20) & (n <= 1000), F.lit(1.0)).otherwise(F.lit(0.5))
    return len_ok * (F.lit(0.5) + F.lit(0.5) * stopword_ratio(text)) - digit_ratio(text)


def lang_scores(text: str) -> dict[str, Column]:
    return {lang: stopword_hits(text, words) for lang, words in LANG_STOPWORDS.items()}


def predicted_lang(text: str) -> Column:
    """argmax over language stopword hits; ties resolved by the fixed chain
    order en→de→es→fr→zh (mirrored exactly in the DuckDB oracle)."""
    scores = lang_scores(text)
    order = list(LANG_STOPWORDS)
    expr = None
    for lang in order:
        cond = None
        for other in order:
            if other == lang:
                continue
            c = scores[lang] >= scores[other]
            cond = c if cond is None else (cond & c)
        expr = F.when(cond, F.lit(lang)) if expr is None else expr.when(cond, F.lit(lang))
    return expr.otherwise(F.lit(order[0]))


def fingerprint(text: str | Column) -> Column:
    """Exact-content fingerprint."""
    c = F.col(text) if isinstance(text, str) else text
    return F.md5(c)


def normalized_fingerprint(text: str | Column) -> Column:
    """Fingerprint after lowercase + whitespace collapse — catches trivial
    reformatting duplicates."""
    c = F.col(text) if isinstance(text, str) else text
    return F.md5(F.regexp_replace(F.lower(c), "\\s+", " "))


# the Gopher rule set's required "stop words" (Rae et al. 2021, A1.1:
# a document must contain at least two of these)
GOPHER_REQUIRED_WORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_flags(text: str | Column) -> dict[str, Column]:
    """The Gopher quality-filter rule set (Rae et al. 2021, Appendix A1.1 —
    the de-facto standard heuristic filter for LLM training corpora), each
    rule as a named boolean column plus the combined ``gopher_pass``:

    - word count in [50, 100 000]
    - mean word length in [3, 10]
    - symbol-to-word ratio (``#`` or ``...``) ≤ 0.1
    - < 90% of lines starting with a bullet, < 30% ending with ``...``
    - ≥ 80% of words contain at least one alphabetic character
    - ≥ 2 of the required stop words present

    All native expressions over one scan — at 100 TB this is a pure
    map-side pass fused into whatever scan precedes it.
    """
    c = F.col(text) if isinstance(text, str) else text
    col_sql = text if isinstance(text, str) else None
    toks = tokens(c)
    n = F.size(toks).cast("double")
    mean_len = avg_token_len(c)
    hash_count = F.length(c) - F.length(F.regexp_replace(c, "#", ""))
    ellipsis_count = (
        F.length(c) - F.length(F.regexp_replace(c, r"\.\.\.", ""))
    ) / F.lit(3)
    lines = F.split(c, "\n")
    n_lines = F.size(lines).cast("double")
    if col_sql is None:
        raise ValueError("gopher_quality_flags needs a column NAME for the "
                         "higher-order-function rules")
    bullet_lines = F.expr(
        f"size(filter(split({col_sql}, '\\n'), "
        f"l -> l LIKE '-%' OR l LIKE '*%' OR l LIKE '•%'))"
    ).cast("double")
    ellipsis_lines = F.expr(
        f"size(filter(split({col_sql}, '\\n'), l -> l LIKE '%...'))"
    ).cast("double")
    alpha_words = F.expr(
        f"size(filter(split({col_sql}, ' '), t -> t rlike '[A-Za-z]'))"
    ).cast("double")
    req = ", ".join(f"'{w}'" for w in GOPHER_REQUIRED_WORDS)
    required_present = F.expr(
        f"size(filter(array({req}), w -> array_contains(split({col_sql}, ' '), w)))"
    )
    flags = {
        "g_word_count_ok": (n >= 50) & (n <= 100_000),
        "g_mean_word_len_ok": (mean_len >= 3) & (mean_len <= 10),
        "g_symbol_ratio_ok": ((hash_count + ellipsis_count) / n) <= 0.1,
        "g_bullet_lines_ok": (bullet_lines / n_lines) <= 0.9,
        "g_ellipsis_lines_ok": (ellipsis_lines / n_lines) <= 0.3,
        "g_alpha_word_ratio_ok": (alpha_words / n) >= 0.8,
        "g_required_words_ok": required_present >= 2,
    }
    combined = None
    for f in flags.values():
        combined = f if combined is None else (combined & f)
    flags["gopher_pass"] = combined
    return flags
