"""Deterministic dataset splits (train/val/test) for training pipelines.

The split must be a pure function of (seed, id) — never `rand()` — so that
(a) re-running the pipeline on a grown corpus keeps every existing document
in its original split (no eval contamination when data is added), and
(b) any engine can reproduce the assignment. The bucket hash is therefore
md5 (available and identical in Spark and DuckDB) rather than engine-native
hashes (Spark xxhash64 and DuckDB hash() disagree): 32 bits of the digest →
bucket in [0, 10000) → cumulative-fraction thresholds.

Map-side projection, zero shuffles; at 100 TB the split column is free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 10_000


def split_bucket(id_col: str | Column, seed: str = "volga") -> Column:
    """Deterministic bucket in [0, 10000) from (seed, id)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    h = F.md5(F.concat(F.lit(seed + ":"), c.cast("string")))
    # first 8 hex chars → uint32 → bucket; conv returns a string
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % _BUCKETS).alias(
        "bucket"
    )


def assign_split(
    id_col: str | Column,
    fractions: dict[str, float],
    seed: str = "volga",
) -> Column:
    """`split` column: name chosen by cumulative-fraction thresholds over the
    bucket. Fractions must sum to 1 (validated); threshold arithmetic is
    integer (bucket < round(cum * 10000)) so both engines agree exactly."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    b = split_bucket(id_col, seed)
    expr = None
    cum = 0.0
    names = list(fractions)
    for name in names[:-1]:
        cum += fractions[name]
        cond = b < int(round(cum * _BUCKETS))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    out = last if expr is None else expr.otherwise(last)
    return out.alias("split")


def hash_split(
    df: DataFrame,
    id_col: str,
    fractions: dict[str, float] | None = None,
    seed: str = "volga",
) -> DataFrame:
    """Add a deterministic `split` column (default 98/1/1 train/val/test)."""
    fr = fractions or {"train": 0.98, "val": 0.01, "test": 0.01}
    return df.withColumn("split", assign_split(id_col, fr, seed))


def leakage_safe_split(
    df: DataFrame,
    clusters: DataFrame,
    id_col: str,
    fractions: dict[str, float] | None = None,
    seed: str = "volga",
    *,
    cluster_node_col: str = "node",
    cluster_id_col: str = "component",
    keep_cluster_col: str | None = None,
) -> DataFrame:
    """Split assignment where every near-duplicate CLUSTER lands in one
    split — the leakage guard a plain per-document hash split lacks: two
    near-identical documents split train/test by independent hashes leak
    training text into eval verbatim-ish.

    ``clusters`` is a (node, component) frame — the output shape of
    :func:`volga_spark.operators.components.connected_components` over
    verified near-dup edges. Documents absent from it are singletons and
    split by their own id; members split by their cluster representative
    (the component's min id), so the whole cluster moves together.

    Plan: ONE left equi-join of the corpus against the cluster map, then
    the same map-side md5-bucket threshold as :func:`hash_split`. The map
    holds only documents that have a duplicate edge — on a deduped-ish
    corpus it is a small fraction of the corpus, and AQE picks a broadcast
    when it fits; worst case it is one hash join on the id, never a
    shuffle of anything wider than (id, component).

    Stability note: a singleton that LATER gains a duplicate re-keys from
    its own id to the cluster representative's — unavoidable, since the
    guarantee "cluster is atomic" must win; representatives themselves are
    min-ids, so an existing cluster only re-keys if an even-smaller id
    joins it.
    """
    fr = fractions or {"train": 0.98, "val": 0.01, "test": 0.01}
    # fresh internal name — a caller column named '__cluster' must not be
    # shadowed by the working column (nor dropped on the way out)
    tmp = "__cluster"
    while tmp in df.columns:
        tmp += "_"
    cmap = clusters.select(
        F.col(cluster_node_col).alias(id_col),
        F.col(cluster_id_col).alias(tmp),
    )
    joined = df.join(cmap, id_col, "left")
    key = F.coalesce(F.col(tmp), F.col(id_col))
    out = joined.withColumn("split", assign_split(key, fr, seed))
    if keep_cluster_col is not None:
        out = out.withColumn(keep_cluster_col, key)
    return out.drop(tmp)


def split_oracle_expr(
    id_sql: str, fractions: dict[str, float], seed: str = "volga"
) -> str:
    """DuckDB SQL computing the identical `split` column."""
    bucket = (
        f"CAST(('0x' || substr(md5('{str(seed).replace(chr(39), chr(39)*2)}:' || CAST({id_sql} AS VARCHAR)), 1, 8))"
        f" AS BIGINT) % {_BUCKETS}"
    )
    names = list(fractions)
    parts, cum = [], 0.0
    for name in names[:-1]:
        cum += fractions[name]
        parts.append(f"WHEN {bucket} < {int(round(cum * _BUCKETS))} THEN '{name}'")
    return "CASE " + " ".join(parts) + f" ELSE '{names[-1]}' END"
