"""URL extraction, canonicalization, and domain-blocklist filtering.

The standard web-corpus curation stage (C4/RefinedWeb drop documents from
blocklisted domains and dedup by canonical URL). All extraction /
canonicalization is native Column regex (RE2+Java-compatible dialect, same
rule as `operators/pii.py`, so DuckDB can oracle it byte-for-byte); the
blocklist membership check is a broadcast join so a million-domain blocklist
still never shuffles the 100 TB text side.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# One URL: scheme + host + optional path (stops at whitespace). Group 1 = host.
URL_RE = r"https?://([A-Za-z0-9.-]+)[^\s]*"


def _col(text: str | Column) -> Column:
    return F.col(text) if isinstance(text, str) else text


def extract_urls(text: str | Column) -> Column:
    """All URLs in the document, in order (``array<string>``)."""
    return F.regexp_extract_all(_col(text), F.lit(URL_RE), F.lit(0))


def extract_hosts(text: str | Column) -> Column:
    """Hosts of all URLs, lowercased, leading ``www.`` stripped."""
    hosts = F.regexp_extract_all(_col(text), F.lit(URL_RE), F.lit(1))
    return F.transform(
        hosts, lambda h: F.regexp_replace(F.lower(h), r"^www\.", "")
    )


def first_host(text: str | Column) -> Column:
    """Host of the first URL ('' when the document has none)."""
    h = F.regexp_extract(_col(text), URL_RE, 1)
    return F.regexp_replace(F.lower(h), r"^www\.", "")


def canonical_url(url: str | Column) -> Column:
    """Normalize one URL for URL-level dedup: lowercase scheme+host, strip
    ``www.``, drop the fragment and any trailing ``/``.

    Pure regex chain (no ``parse_url``) so the DuckDB oracle runs the exact
    same transformation.
    """
    c = _col(url)
    # lowercase scheme://host prefix only (path stays case-sensitive)
    c = F.regexp_replace(c, r"^HTTPS?://", "https://")
    c = F.regexp_replace(c, r"^Https?://", "https://")
    c = F.regexp_replace(c, r"^http://", "https://")
    c = F.regexp_replace(c, r"^https://www\.", "https://")
    c = F.regexp_replace(c, r"#[^\s]*$", "")
    c = F.regexp_replace(c, r"/+$", "")
    return c


def flag_blocklisted(
    df: DataFrame,
    blocklist: DataFrame | Iterable[str],
    text_col: str = "text",
    flag_col: str = "blocklisted",
) -> DataFrame:
    """Add ``flag_col``: true iff ANY host in the document is blocklisted.

    Scale shape: explode hosts (bounded by URLs-per-doc, not corpus size) →
    left-SEMI broadcast join against the blocklist → semi-join hit set joined
    back on doc identity. The text column itself never enters a shuffle: the
    semi join carries only (surrogate id, host), and the final join is
    id→flag. For a handful of domains, prefer the pure-expression
    ``arrays_overlap`` path below, which keeps everything in one stage.
    """
    spark = df.sparkSession
    if not isinstance(blocklist, DataFrame):
        blocklist = spark.createDataFrame(
            [(d,) for d in blocklist], "host string"
        )
    bl = F.broadcast(blocklist.select(F.lower("host").alias("host")).distinct())
    with_id = df.withColumn("__uid", F.monotonically_increasing_id())
    hits = (
        with_id.select("__uid", F.explode(extract_hosts(text_col)).alias("host"))
        .join(bl, "host", "left_semi")
        .select("__uid")
        .distinct()
        .withColumn(flag_col, F.lit(True))
    )
    return (
        with_id.join(F.broadcast(hits), "__uid", "left")
        .withColumn(flag_col, F.coalesce(flag_col, F.lit(False)))
        .drop("__uid")
    )


def blocklisted_expr(
    text: str | Column, domains: tuple[str, ...]
) -> Column:
    """Single-stage variant for SMALL blocklists: the domain array is a plan
    literal, so the check is `arrays_overlap` inside codegen — zero joins.
    Use `flag_blocklisted` when the blocklist is big enough to bloat the plan
    (rule of thumb: >10k entries)."""
    lit = F.array(*[F.lit(d.lower()) for d in domains])
    return F.arrays_overlap(extract_hosts(text), lit)


def url_oracle_exprs(text_sql: str = "text") -> dict[str, str]:
    """DuckDB fragments mirroring first_host / canonical_url / host list."""
    first = (
        f"regexp_replace(lower(regexp_extract({text_sql}, '{URL_RE}', 1)),"
        " '^www\\.', '')"
    )
    hosts = (
        f"list_transform(regexp_extract_all({text_sql}, '{URL_RE}', 1),"
        " h -> regexp_replace(lower(h), '^www\\.', ''))"
    )
    return {"first_host": first, "hosts": hosts}
