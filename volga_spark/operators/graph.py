"""PageRank over an edge list — the host-graph quality prior.

Web-corpus curation uses link-graph centrality as a document quality
signal (Common Crawl publishes host-level ranks for exactly this; CCNet
and successors bucket crawls by them). This is the Spark-native iterative
PageRank, built on the same loop discipline as
``operators/components.connected_components``.

**Deterministic integer fixed-point arithmetic.** Ranks are BIGINT
``rank_units`` on a caller-chosen ``scale`` (default 10^12 units = rank
1.0); damping is a rational d_num/100. Every per-edge contribution is
``rank * d_num // (100 * outdeg)`` — pure integer ops, so results are
bit-identical across engines, partitionings, and runs (float PageRank sums
in shuffle order and never is). Floor division leaks ≤1 unit per edge per
iteration into nowhere; at scale=10^12 that is a 10^-12-relative artifact,
and the mass-conservation test bounds it.

Per-iteration plan (the 100 TB shape):
- edges pre-repartitioned ONCE on src and lazily checkpointed — every
  iteration's rank⋈edges join reuses that layout, so only the (small)
  rank side shuffles per round;
- contributions aggregate with map-side partials on dst (shuffle volume
  ~|nodes|, not |edges|);
- dangling mass (nodes without out-edges) is ONE scalar aggregate per
  iteration, redistributed uniformly — the textbook treatment, kept
  integer;
- ``localCheckpoint(eager=False)`` per round caps lineage growth, with the
  next round's action materializing it (one job per iteration).

Iteration count is fixed (default 10): PageRank's standard deployment mode
for ranking (error decays as d^k; 10 rounds at d=0.85 ≈ 20% of a unit of
initial mass unconverged, far below ranking-order noise).

The reference engine has no graph tier; this extends the beyond-reference
training-data surface alongside connected components.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 10,
    damping: float = 0.85,
    scale: int = 10**12,
) -> DataFrame:
    """(node, rank_units, rank) for every node in ``edges``.

    ``rank_units`` is the exact integer fixed-point rank (sums to ≤ scale);
    ``rank`` is the convenience double ``rank_units / scale``. Parallel
    edges are kept (they weight the link, matching a multigraph host
    crawl); self-loops are dropped.
    """
    if not 0 < damping < 1:
        raise ValueError(f"damping must be in (0,1), got {damping}")
    d_num = round(damping * 100)
    spark = edges.sparkSession
    w = min(int(spark.conf.get("spark.sql.shuffle.partitions")), 16)

    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .repartition(w, "src")
        .localCheckpoint(eager=False)
    )
    nodes = (
        e.select("src")
        .union(e.select(F.col("dst").alias("src")))
        .distinct()
        .select(F.col("src").alias("node"))
        .repartition(w, "node")
        .localCheckpoint(eager=False)
    )
    n = nodes.count()
    if n == 0:
        return nodes.select(
            "node",
            F.lit(0).cast("bigint").alias("rank_units"),
            F.lit(0.0).alias("rank"),
        )
    outdeg = (
        e.groupBy("src").agg(F.count("*").alias("outdeg")).localCheckpoint()
    )

    ranks = nodes.select("node", F.lit(scale // n).cast("bigint").alias("r"))
    base = ((100 - d_num) * scale) // (100 * n)
    for _ in range(iterations):
        with_deg = ranks.join(
            outdeg, ranks["node"] == outdeg["src"], "left"
        ).select("node", "r", "outdeg")
        # one scalar action per round: dangling mass + materialize lineage
        dang = (
            with_deg.filter(F.col("outdeg").isNull())
            .agg(F.coalesce(F.sum("r"), F.lit(0)).alias("m"))
            .first()["m"]
        )
        dang_share = (d_num * int(dang)) // (100 * n)
        contribs = (
            with_deg.filter(F.col("outdeg").isNotNull())
            .join(e, with_deg["node"] == e["src"])
            .select(
                F.col("dst").alias("node"),
                # `div` is exact BIGINT division — a double `/` would be
                # correctly-rounded, and a quotient that rounds UP across
                # an integer boundary then floors wrong (breaking the
                # bit-exact Python-reference parity)
                F.expr(f"(r * {d_num}) div (100 * outdeg)").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.coalesce(F.col("inflow"), F.lit(0))
                    + F.lit(base + dang_share)
                )
                .cast("bigint")
                .alias("r"),
            )
            .repartition(w, "node")
            .localCheckpoint(eager=False)
        )
    return ranks.select(
        "node",
        F.col("r").alias("rank_units"),
        (F.col("r") / F.lit(float(scale))).alias("rank"),
    )
