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
