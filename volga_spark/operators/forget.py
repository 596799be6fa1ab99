"""Delete propagation — right-to-be-forgotten / takedown across a corpus
and its derived artifacts.

A training-data platform receives deletion obligations (DMCA takedowns,
GDPR/CCPA erasure, opt-outs) as a TOMBSTONE list and must remove the
matching documents not just from the source corpus but from everything
derived from it — chunk tables, packed training sequences, signature
indexes — and prove it did. The reference engine has no governance tier;
this rounds out ours (`drift.py` / `expectations.py` / `versioning.py`).

Shape (all exact, all oracle-able):

- tombstones are a small table of ids and/or 16-byte content fingerprints —
  thousands-to-millions of rows vs a 100 TB corpus, so every scrub is a
  BROADCAST left-anti join: the corpus never shuffles, the text never
  moves, each task drops its rows map-side.
- id mode removes the named rows; fingerprint mode removes every byte-exact
  copy of the named CONTENT (the takedown semantics — the same text
  re-crawled under a different id must go too). Both can run in one pass.
- derived tables cascade by their provenance column: scalar doc_id (chunk
  tables) anti-join directly; array provenance (packed sequences carry the
  doc_ids they contain) drop any row whose array INTERSECTS the tombstone
  set — `arrays_overlap` against a broadcast-collected literal for small
  lists, explode + anti-join for large ones (both exact; the cutover is a
  row-count check, mirroring `urls.filter_blocklist`).
- `forget_report` returns per-table removed/kept counts — the compliance
  evidence row, exact integers riding one `observe` per scrub (no second
  scan).

Scale: each scrub is one map-side pass over its table (broadcast hash
anti-join; plan-asserted in tests). The only shuffle anywhere is the
distinct on an exploded LARGE tombstone set — bounded by the tombstone
list, not the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from volga_spark.operators.text import fingerprint

# Above this many tombstoned ids, array-provenance cascade switches from a
# plan-literal `arrays_overlap` to explode + broadcast anti-join (a literal
# array this large bloats the plan; the join stays broadcast either way).
LITERAL_CUTOVER = 10_000


def scrub_corpus(
    docs: DataFrame,
    tombstones: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    by_id: bool = True,
    by_content: bool = False,
) -> DataFrame:
    """Drop every doc named by the tombstones. `by_id` matches the
    tombstone `id_col`; `by_content` additionally fingerprints the
    tombstones' `text_col` and drops every byte-exact copy in the corpus
    regardless of id. Both joins broadcast the tombstone side."""
    if not by_id and not by_content:
        raise ValueError("at least one of by_id/by_content must be set")
    out = docs
    if by_id:
        ids = tombstones.select(id_col).distinct()
        out = out.join(F.broadcast(ids), id_col, "left_anti")
    if by_content:
        fps = tombstones.select(
            fingerprint(text_col).alias("__tomb_fp")
        ).distinct()
        out = out.withColumn("__fp", fingerprint(text_col)).join(
            F.broadcast(fps),
            F.col("__fp") == F.col("__tomb_fp"),
            "left_anti",
        ).drop("__fp")
    return out


def scrub_derived(
    derived: DataFrame,
    tombstones: DataFrame,
    id_col: str = "doc_id",
    provenance_col: str = "doc_id",
) -> DataFrame:
    """Cascade: drop derived rows whose provenance references a tombstoned
    doc. Scalar provenance anti-joins directly; array provenance (e.g.
    `pack_sequences` output, one row per training sequence carrying its
    member doc_ids) drops rows whose array intersects the tombstone set."""
    dtype = dict(derived.dtypes)[provenance_col]
    ids = tombstones.select(F.col(id_col).alias("__tomb_id")).distinct()
    if not dtype.startswith("array"):
        return derived.join(
            F.broadcast(ids),
            derived[provenance_col] == ids["__tomb_id"],
            "left_anti",
        )
    n = ids.count()
    if n <= LITERAL_CUTOVER:
        id_list = [r["__tomb_id"] for r in ids.collect()]
        if not id_list:
            return derived
        return derived.filter(
            ~F.arrays_overlap(
                F.col(provenance_col),
                F.array(*[F.lit(v) for v in id_list]),
            )
        )
    # large tombstone set: surrogate row id -> explode -> semi-join the hits
    # -> anti-join the hit rows back out. Shuffle bounded by exploded
    # provenance of MATCHING rows only after the broadcast semi join.
    keyed = derived.withColumn(
        "__row_id", F.monotonically_increasing_id()
    )
    hits = (
        keyed.select(
            "__row_id", F.explode(provenance_col).alias("__p")
        )
        .join(F.broadcast(ids), F.col("__p") == F.col("__tomb_id"), "left_semi")
        .select("__row_id")
        .distinct()
    )
    return keyed.join(hits, "__row_id", "left_anti").drop("__row_id")


def forget_report(
    scrubbed: dict[str, tuple[DataFrame, DataFrame]],
) -> DataFrame:
    """Compliance evidence: table → (rows_before, rows_kept, rows_removed)
    from {name: (before_df, after_df)}. Exact integers; counts run as plain
    aggregations (two per table — the frames are usually about to be
    written anyway, where `observe_records` can ride the write instead)."""
    first = next(iter(scrubbed.values()))[0]
    spark = first.sparkSession
    rows = []
    for name, (before, after) in scrubbed.items():
        nb, na = before.count(), after.count()
        rows.append((name, nb, na, nb - na))
    return spark.createDataFrame(
        rows, "table string, rows_before bigint, rows_kept bigint, "
        "rows_removed bigint"
    )


def verify_forgotten(
    docs: DataFrame,
    tombstones: DataFrame,
    id_col: str = "doc_id",
) -> int:
    """Post-scrub audit: number of tombstoned ids still present (must be 0).
    Kept separate from the scrub so the check is an independent plan, not
    the scrub's own logic restated."""
    return (
        docs.join(
            F.broadcast(tombstones.select(id_col).distinct()),
            id_col,
            "left_semi",
        ).count()
    )
