"""Corpus snapshot diff — what changed between two dataset versions.

Incremental pipelines (see `operators/incremental.py` for the near-dup
gate) need exact delta accounting between corpus snapshots: which
documents were added, removed, or modified in place. Diffing 100 TB of
text naively means shipping text; this diff ships (id, 16-byte content
fingerprint) only:

- one narrow projection per side (id + md5),
- one full-outer join on the id (sort-merge, shuffle volume = ids+hashes),
- the change class falls out of null-ness and fingerprint equality.

The same discipline as exact dedup: text never shuffles, verification
rides the digest. Output feeds retraining triggers ("retrain when >x%
changed"), incremental re-indexing (only `added`/`modified` re-embed),
and audit trails.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from volga_spark.operators.text import fingerprint


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, change) for every id present in either snapshot, change ∈
    {'added', 'removed', 'modified', 'unchanged'}. Ids must be unique per
    snapshot (they are primary keys; enforce upstream)."""
    o = old.select(
        F.col(id_col).alias("__id"), fingerprint(text_col).alias("__ofp")
    )
    n = new.select(
        F.col(id_col).alias("__id"), fingerprint(text_col).alias("__nfp")
    )
    j = o.join(n, "__id", "full_outer")
    change = (
        F.when(F.col("__ofp").isNull(), F.lit("added"))
        .when(F.col("__nfp").isNull(), F.lit("removed"))
        .when(F.col("__ofp") != F.col("__nfp"), F.lit("modified"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(F.col("__id").alias(id_col), change.alias("change"))


def diff_summary(diff: DataFrame) -> DataFrame:
    """(change, n) counts — the retrain-trigger numbers."""
    return diff.groupBy("change").agg(F.count("*").alias("n"))


def schema_diff(
    old: DataFrame, new: DataFrame
) -> list[tuple[str, str, str | None, str | None]]:
    """Schema-level delta between two snapshots — the data-contract check
    that runs BEFORE the row-level diff: (column, change, old_type,
    new_type) with change ∈ {'added', 'removed', 'retyped'}. Pure metadata
    (no jobs); unchanged columns are omitted."""
    o = dict(old.dtypes)
    n = dict(new.dtypes)
    out: list[tuple[str, str, str | None, str | None]] = []
    for c in sorted(o.keys() | n.keys()):
        if c not in n:
            out.append((c, "removed", o[c], None))
        elif c not in o:
            out.append((c, "added", None, n[c]))
        elif o[c] != n[c]:
            out.append((c, "retyped", o[c], n[c]))
    return out


def breaking_changes(
    diff: list[tuple[str, str, str | None, str | None]],
    widenings: frozenset[tuple[str, str]] = frozenset(
        {("int", "bigint"), ("float", "double"), ("date", "timestamp")}
    ),
) -> list[tuple[str, str, str | None, str | None]]:
    """The contract gate: additions are always compatible; removals always
    break; retypes break unless they are in the allowed widening set."""
    return [
        (c, ch, ot, nt)
        for (c, ch, ot, nt) in diff
        if ch == "removed" or (ch == "retyped" and (ot, nt) not in widenings)
    ]
