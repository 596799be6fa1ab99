"""PII detection and redaction as native Column expressions.

A standard stage in training-data curation (scrub personally identifiable
information before a corpus is used for model training). Every function here
is a pure projection over the ``text`` column — JVM-side ``regexp_count`` /
``regexp_replace``, zero Python in the hot path, zero shuffles — so at 100 TB
the stage pipelines inside the scan like the rest of ``operators/text.py``.

Pattern dialect: every regex below is valid AND equivalent in both Java's
``java.util.regex`` (Spark) and RE2 (DuckDB) — no lookaround, no
backreferences, ``\\b`` word boundaries only (supported identically by both).
That is what lets the DuckDB oracle verify redaction byte-for-byte
(`tests/test_pii.py`).

Reference parity note: the reference engine has no PII stage (it is a feature
engine, not a corpus-curation engine); this module is part of the
beyond-reference LLM-data-pipeline tier alongside Gopher/C4 filters
(`operators/text.py`) and dedup (`operators/dedup.py`).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Category → (regex, replacement token). Order matters for redaction: EMAIL
# must run before PHONE/SSN so digit runs inside an already-redacted token are
# not re-matched (the replacement tokens contain no digits, making the chain
# confluent regardless of later order).
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    ("credit_card", r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b", "<CC>"),
)


def _col(text: str | Column) -> Column:
    return F.col(text) if isinstance(text, str) else text


def pii_counts(text: str | Column) -> dict[str, Column]:
    """Per-category match counts, e.g. ``{"pii_email": Column, ...}``.

    ``regexp_count`` is a native Spark expression (whole-stage codegen).
    """
    c = _col(text)
    return {
        f"pii_{name}": F.regexp_count(c, F.lit(pat)).cast("bigint")
        for name, pat, _ in PII_PATTERNS
    }


def pii_total(text: str | Column) -> Column:
    """Total PII hits across all categories (cheap doc-level risk score)."""
    cols = list(pii_counts(text).values())
    out = cols[0]
    for c in cols[1:]:
        out = out + c
    return out.alias("pii_total")


def redact_pii(
    text: str | Column, categories: tuple[str, ...] | None = None
) -> Column:
    """Replace every PII match with its ``<CATEGORY>`` token.

    Chained native ``regexp_replace`` (global, both engines). SSN runs before
    the generic PHONE pattern; since ``\\d{3}-\\d{2}-\\d{4}`` and
    ``\\d{3}[-.]\\d{3}[-.]\\d{4}`` cannot match the same span (group widths
    differ), the chain is order-stable for any category subset.
    """
    out = _col(text)
    for name, pat, token in PII_PATTERNS:
        if categories is not None and name not in categories:
            continue
        out = F.regexp_replace(out, pat, token)
    return out


def pii_oracle_exprs(text_sql: str = "text") -> dict[str, str]:
    """DuckDB SQL fragments computing the same counts + redaction.

    DuckDB's ``regexp_replace`` needs the explicit ``'g'`` flag to match
    Spark's replace-all default; ``len(regexp_extract_all(...))`` mirrors
    ``regexp_count``.
    """
    exprs = {
        f"pii_{name}": (
            f"CAST(len(regexp_extract_all({text_sql}, '{pat}')) AS BIGINT)"
        )
        for name, pat, _ in PII_PATTERNS
    }
    red = text_sql
    for _, pat, token in PII_PATTERNS:
        red = f"regexp_replace({red}, '{pat}', '{token}', 'g')"
    exprs["redacted"] = red
    return exprs
