"""Deterministic corpus sampling for training pipelines.

Three primitives a 100 TB curation pipeline needs constantly, all pure
functions of (seed, id) — never ``rand()`` — for the same reasons as
``operators/splits.py``: reproducible across runs, partitionings, and
engines (md5 is bit-identical in Spark and DuckDB; engine-native hashes
disagree), and stable under corpus growth (an existing row's keep/drop
never flips when new rows arrive).

- :func:`bottom_k_sample` — EXACT-size uniform sample: rank every row by
  md5(seed:id), keep the k smallest. Spark plans ``orderBy(h).limit(k)``
  as TakeOrderedAndProject: each partition keeps only its local top-k and
  the driver merges P×k pre-sorted candidates — no global sort, no full
  shuffle. This is the bottom-k sketch from the sampling literature; at
  100 TB it reads everything once and moves only P×k rows.
- :func:`bernoulli_sample` — fraction-keep via md5 bucket, map-side, zero
  shuffles. The per-row twin of splits.py's bucket rule.
- :func:`stratified_sample` — per-stratum Bernoulli fractions (the
  down-weight-the-huge-crawl / keep-all-of-the-small-corpus knob).
- :func:`temperature_rates` — the standard multilingual/multi-source
  temperature-sampling formula (p_i ∝ n_i^alpha, XLM-R/mC4 convention):
  turns observed source sizes + a token budget into the per-source
  fractions to feed :func:`stratified_sample`.

The reference has no sampling operators (its surface is windows/aggs —
this module is part of the training-data tier BASELINE.json's north star
adds on top); the design discipline (deterministic, engine-portable,
oracle-able) matches the rest of the repo.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 1_000_000  # finer than splits.py: sampling fractions can be tiny


def _rank(id_col: str | Column, seed: str) -> Column:
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.md5(F.concat(F.lit(seed + ":"), c.cast("string")))


def sql_quote(s) -> str:
    """SQL-escape a caller string for inlining as a DuckDB single-quoted
    literal (oracle twins only — the Spark side binds literals via F.lit,
    which needs no escaping). THE one implementation: every oracle builder
    that inlines seeds/tokens/phase names should use this rather than
    hand-rolling the replace."""
    return str(s).replace("'", "''")


def _rank_sql(id_sql: str, seed: str) -> str:
    # SQL-escape the seed literal: seeds are caller strings (phase names
    # flow in via phase_schedule's "seed#i:name" convention) and a quote
    # must not break or inject into the DuckDB twin.
    return f"md5('{sql_quote(seed)}:' || CAST({id_sql} AS VARCHAR))"


def _bucket(id_col: str | Column, seed: str) -> Column:
    # first 12 hex chars → 48 bits → bucket in [0, 1e6)
    return F.conv(F.substring(_rank(id_col, seed), 1, 12), 16, 10).cast(
        "bigint"
    ) % _BUCKETS


def _bucket_sql(id_sql: str, seed: str) -> str:
    return (
        f"CAST(('0x' || substr({_rank_sql(id_sql, seed)}, 1, 12)) AS BIGINT)"
        f" % {_BUCKETS}"
    )


def bottom_k_sample(
    df: DataFrame, id_col: str, k: int, seed: str = "volga"
) -> DataFrame:
    """Exactly-k uniform sample (deterministic; assumes unique ids).

    md5 ranks are uniform over ids, so the k smallest are a uniform
    k-subset; the same ORDER BY/LIMIT in any engine returns the same rows.
    """
    return df.orderBy(_rank(id_col, seed)).limit(k)


def bottom_k_oracle_sql(table_sql: str, id_sql: str, k: int, seed: str = "volga") -> str:
    """DuckDB query selecting the identical k rows (append the outer SELECT
    column list yourself; this returns the FROM...ORDER BY...LIMIT tail)."""
    return f"SELECT * FROM {table_sql} ORDER BY {_rank_sql(id_sql, seed)} LIMIT {k}"


def bernoulli_sample(
    df: DataFrame, id_col: str, fraction: float, seed: str = "volga"
) -> DataFrame:
    """Keep each row iff its deterministic bucket < fraction·1e6. Map-side."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    return df.filter(_bucket(id_col, seed) < int(round(fraction * _BUCKETS)))


def bernoulli_oracle_pred(id_sql: str, fraction: float, seed: str = "volga") -> str:
    """DuckDB WHERE predicate matching :func:`bernoulli_sample` exactly."""
    return f"{_bucket_sql(id_sql, seed)} < {int(round(fraction * _BUCKETS))}"


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    fractions: dict[str, float],
    default_fraction: float = 1.0,
    seed: str = "volga",
) -> DataFrame:
    """Per-stratum Bernoulli keep-fractions (unlisted strata get
    ``default_fraction``). Map-side — the stratum never shuffles; this is
    `df.sampleBy` made deterministic and engine-portable."""
    thresh = F.lit(int(round(default_fraction * _BUCKETS)))
    for name, fr in sorted(fractions.items()):
        if not 0.0 <= fr <= 1.0:
            raise ValueError(f"fraction for {name!r} must be in [0,1], got {fr}")
        thresh = (
            F.when(F.col(strata_col) == name, int(round(fr * _BUCKETS)))
            .otherwise(thresh)
        )
    return df.filter(_bucket(id_col, seed) < thresh)


def stratified_oracle_pred(
    strata_sql: str,
    id_sql: str,
    fractions: dict[str, float],
    default_fraction: float = 1.0,
    seed: str = "volga",
) -> str:
    """DuckDB WHERE predicate matching :func:`stratified_sample` exactly."""
    cases = " ".join(
        f"WHEN {strata_sql} = '{name}' THEN {int(round(fr * _BUCKETS))}"
        for name, fr in sorted(fractions.items())
    )
    default = int(round(default_fraction * _BUCKETS))
    return f"{_bucket_sql(id_sql, seed)} < (CASE {cases} ELSE {default} END)"


def temperature_rates(
    sizes: dict[str, int], alpha: float, budget: int
) -> dict[str, float]:
    """Temperature-sampling keep-fractions: target share of source i is
    n_i^alpha / Σ n_j^alpha (alpha=1 → proportional / no reweighting,
    alpha→0 → uniform across sources — the XLM-R/mC4 multilingual rule),
    scaled so expected kept rows total ``budget``. Rates are capped at 1.0
    (can't keep more than exists — without replacement); the residual
    budget is redistributed over the uncapped sources, iterating until
    stable (the standard water-filling fix)."""
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    live = {k: v for k, v in sizes.items() if v > 0}
    rates = {k: 0.0 for k in sizes}
    capped: set[str] = set()
    remaining = float(budget)
    while True:
        free = {k: v for k, v in live.items() if k not in capped}
        if not free or remaining <= 0:
            break
        denom = sum(v**alpha for v in free.values())
        newly_capped = False
        for k, n in free.items():
            want = remaining * (n**alpha) / denom
            if want >= n:  # would need more rows than the source has
                rates[k] = 1.0
                capped.add(k)
                newly_capped = True
        if not newly_capped:
            for k, n in free.items():
                rates[k] = (remaining * (n**alpha) / denom) / n
            break
        remaining = budget - sum(sizes[k] for k in capped)
    return rates


def weighted_bottom_k(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    seed: str = "volga",
) -> DataFrame:
    """EXACT-size weighted sample without replacement — deterministic
    Efraimidis–Spirakis (2006) A-ES: each row gets key u^(1/w) with u
    derived from md5(seed:id) (uniform in (0,1), never rand()), and the k
    LARGEST keys win; inclusion probability is proportional to weight,
    without replacement, in one pass.

    Same plan shape as :func:`bottom_k_sample`: orderBy(key).limit(k)
    compiles to TakeOrderedAndProject — per-partition top-k + a P×k driver
    merge, no global sort. Deterministic across runs, partitionings, and
    engines up to float ULPs in ln (the ORDER is float-valued; crafted
    integer-ratio weights in tests sidestep tie ambiguity, and real
    corpora have measure-zero ties).

    The quality-weighted corpus-selection knob: w = classifier score or
    perplexity-derived weight, k = document budget. Zero-weight rows are
    excluded outright (their key underflows to the minimum)."""
    # u in (0,1): 48 bits of the md5, offset by 0.5 ulp so u > 0
    u = (
        F.conv(F.substring(_rank(id_col, seed), 1, 12), 16, 10).cast("double")
        + F.lit(0.5)
    ) / F.lit(float(2 ** 48))
    # key = ln(u)/w  (monotone transform of u^(1/w); avoids pow overflow
    # for tiny weights). Larger is better: ln(u) < 0, so DIVIDING by a
    # larger w moves the key toward 0. Keep the k LARGEST.
    key = F.log(u) / F.col(weight_col)
    # NaN weights must be dropped explicitly: Spark orders NaN above every
    # number, so `NaN > 0` passes the filter AND ln(u)/NaN = NaN ranks
    # FIRST under desc — k corrupt rows (a failed scorer batch) would
    # silently displace the whole sample.
    w = F.col(weight_col).cast("double")
    return (
        df.filter((~F.isnan(w)) & (w > 0))
        .withColumn("__aes", key)
        .orderBy(F.col("__aes").desc())
        .limit(k)
        .drop("__aes")
    )


def cluster_soft_dedup(
    docs: DataFrame,
    clusters: DataFrame,
    *,
    id_col: str = "doc_id",
    cluster_col: str = "component",
    seed: str = "volga-softdedup",
) -> DataFrame:
    """SOFT near-dup dedup: keep the canonical representative of every
    cluster (smallest id — the hard-dedup survivor) PLUS each other member
    independently with probability 1/cluster_size. Hard dedup erases the
    duplication signal entirely; soft dedup preserves it in expectation
    (a text duplicated 1000× keeps ~2 copies, not 1000 and not exactly 1)
    while still collapsing boilerplate mass — the standard middle ground
    when duplication frequency itself carries quality information.

    ``clusters`` is the (id_col, cluster_col) map from the near-dup tier
    (connected_components output); docs absent from it are singletons and
    always keep. The keep rule is the repo's deterministic md5 bucket with
    an INTEGER threshold (``_BUCKETS div size`` — no float pow, so the
    DuckDB twin is bit-identical). Expected survivors per cluster of size
    s: 1 + (s-1)/s < 2. One join + one size aggregation; the docs text
    never shuffles (the cluster map carries ids only).

    Output: the kept rows of ``docs`` + (cluster_size, is_representative).
    """
    sizes = clusters.groupBy(cluster_col).agg(
        F.count("*").alias("cluster_size"),
        F.min(id_col).alias("__rep"),
    )
    cmap = clusters.join(sizes, cluster_col).select(
        id_col,
        "cluster_size",
        (F.col(id_col) == F.col("__rep")).alias("is_representative"),
    )
    j = docs.join(cmap, id_col, "left")
    size = F.coalesce(F.col("cluster_size"), F.lit(1))
    keep = (
        F.coalesce(F.col("is_representative"), F.lit(True))
        | (_bucket(id_col, seed) < F.expr(f"{_BUCKETS} div cluster_size"))
    )
    return (
        j.filter(keep)
        .withColumn("cluster_size", size.cast("bigint"))
        .withColumn(
            "is_representative",
            F.coalesce(F.col("is_representative"), F.lit(True)),
        )
    )


def cluster_soft_dedup_oracle_sql(
    docs_sql: str,
    clusters_sql: str,
    *,
    id_col: str = "doc_id",
    cluster_col: str = "component",
    seed: str = "volga-softdedup",
) -> str:
    """DuckDB twin of :func:`cluster_soft_dedup` (same integer keep rule)."""
    return f"""
        WITH sizes AS (
            SELECT {cluster_col}, COUNT(*) AS cluster_size,
                   MIN({id_col}) AS __rep
            FROM ({clusters_sql}) GROUP BY {cluster_col}
        ),
        cmap AS (
            SELECT c.{id_col}, s.cluster_size,
                   c.{id_col} = s.__rep AS is_representative
            FROM ({clusters_sql}) c JOIN sizes s USING ({cluster_col})
        )
        SELECT d.*, COALESCE(m.cluster_size, 1) AS cluster_size,
               COALESCE(m.is_representative, TRUE) AS is_representative
        FROM ({docs_sql}) d LEFT JOIN cmap m USING ({id_col})
        WHERE COALESCE(m.is_representative, TRUE)
           OR {_bucket_sql('d.' + id_col, seed)} < {_BUCKETS} // m.cluster_size
    """
