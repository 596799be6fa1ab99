"""Declarative data-quality expectations (the pre-commit corpus gate).

Before a 100 TB ingest run publishes a new corpus version, something has to
assert the invariants the downstream pipeline assumes: keys are present and
unique, fractions of nulls/malformed values are bounded, values sit in
declared ranges, categorical columns only hold known values. This module is
that gate, in the Deequ/Great-Expectations shape (both public), built the
Spark-first way:

- Every check compiles to a NATIVE aggregate expression; the whole suite is
  ONE ``df.agg(...)`` pass — one scan, map-side partial aggregation, a
  single-row result. Adding a check adds a column to the agg, not a pass.
- ``unique`` is the exception that needs a shuffle (count vs count distinct);
  it uses exact ``countDistinct`` inside the same agg — Catalyst plans the
  distinct expansion alongside the other aggregates, still one scan.
- :func:`validate` returns a report row per check (name, passed, observed,
  threshold) as a DataFrame, so the report itself is queryable/writable and
  DuckDB-oracle-able; ``on_fail="raise"`` turns it into a hard gate.
- :func:`observed_checks` rides an EXISTING action via ``df.observe`` for
  row-local checks (no distinct) — the zero-extra-job variant for streaming
  micro-batches or already-running writes (see ``observability.py``).

Checks are plain dicts (name → exprs), so the suite serializes into job
configs the way PipelineSpec sources do.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Check:
    """One expectation: ``metric_expr`` aggregates to the observed value,
    ``predicate`` maps observed → pass. ``sql_metric`` is the DuckDB twin of
    the metric for oracle parity (None = not SQL-expressible)."""

    name: str
    metric: Column
    lo: float | None = None  # observed must be >= lo (if set)
    hi: float | None = None  # observed must be <= hi (if set)
    sql_metric: str | None = field(default=None)
    distinct: bool = False  # needs a distinct expansion (not observe()-able)


def _frac(cond: Column) -> Column:
    # fraction of rows where cond holds; 0/0 → 0.0 for empty frames
    return F.coalesce(
        F.avg(F.when(cond, F.lit(1.0)).otherwise(F.lit(0.0))), F.lit(0.0)
    )


def not_null(col: str, max_null_fraction: float = 0.0) -> Check:
    return Check(
        name=f"not_null({col})",
        metric=_frac(F.col(col).isNull()),
        hi=max_null_fraction,
        sql_metric=f"coalesce(avg(CASE WHEN {col} IS NULL THEN 1.0 ELSE 0.0 END), 0.0)",
    )


def unique(col: str) -> Check:
    """count == countDistinct (null counts as a value via the null-flag trick:
    countDistinct skips nulls, so add 1 if any null exists... simpler: assert
    zero duplicate NON-NULL values and pair with not_null for full key-ness)."""
    return Check(
        name=f"unique({col})",
        metric=(
            F.count(F.col(col)) - F.count_distinct(F.col(col))
        ).cast("double"),
        hi=0.0,
        sql_metric=f"CAST(count({col}) - count(DISTINCT {col}) AS DOUBLE)",
        distinct=True,
    )


def in_range(col: str, lo: float, hi: float, max_violation_fraction: float = 0.0) -> Check:
    cond = ~F.col(col).between(F.lit(lo), F.lit(hi)) & F.col(col).isNotNull()
    return Check(
        name=f"in_range({col},{lo},{hi})",
        metric=_frac(cond),
        hi=max_violation_fraction,
        sql_metric=(
            f"coalesce(avg(CASE WHEN {col} IS NOT NULL AND "
            f"({col} < {lo} OR {col} > {hi}) THEN 1.0 ELSE 0.0 END), 0.0)"
        ),
    )


def accepted_values(col: str, values: list, max_violation_fraction: float = 0.0) -> Check:
    cond = ~F.col(col).isin(values) & F.col(col).isNotNull()
    quoted = ", ".join(f"'{v}'" if isinstance(v, str) else str(v) for v in values)
    return Check(
        name=f"accepted_values({col})",
        metric=_frac(cond),
        hi=max_violation_fraction,
        sql_metric=(
            f"coalesce(avg(CASE WHEN {col} IS NOT NULL AND {col} NOT IN ({quoted})"
            f" THEN 1.0 ELSE 0.0 END), 0.0)"
        ),
    )


def matches_regex(col: str, pattern: str, min_match_fraction: float = 1.0) -> Check:
    """pattern must live in the RE2∩Java subset (same rule as pii.py) so the
    DuckDB twin matches byte-for-byte."""
    cond = F.col(col).rlike(pattern)
    return Check(
        name=f"matches_regex({col})",
        metric=_frac(cond),
        lo=min_match_fraction,
        sql_metric=(
            f"coalesce(avg(CASE WHEN regexp_matches({col}, '{pattern}')"
            f" THEN 1.0 ELSE 0.0 END), 0.0)"
        ),
    )


def min_rows(n: int) -> Check:
    return Check(
        name=f"min_rows({n})",
        metric=F.count(F.lit(1)).cast("double"),
        lo=float(n),
        sql_metric="CAST(count(*) AS DOUBLE)",
    )


def validate(
    df: DataFrame, checks: list[Check], on_fail: str = "report"
) -> DataFrame:
    """Run the suite in ONE aggregation pass; return a report DataFrame
    (check, observed, lo, hi, passed). ``on_fail="raise"`` raises
    ``ValueError`` listing failed checks (the hard-gate mode)."""
    if not checks:
        raise ValueError("no checks given")
    names = [c.name for c in checks]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate check names: {names}")
    agg_row = df.agg(
        *[c.metric.cast("double").alias(f"m{i}") for i, c in enumerate(checks)]
    )
    # one Row → long-format report, built driver-side (|checks| rows, not data)
    vals = agg_row.collect()[0]
    spark = df.sparkSession
    rows = []
    failed = []
    for i, c in enumerate(checks):
        obs = float(vals[i]) if vals[i] is not None else None
        ok = obs is not None
        if ok and c.lo is not None:
            ok = obs >= c.lo
        if ok and c.hi is not None:
            ok = obs <= c.hi
        if not ok:
            failed.append(f"{c.name}: observed={obs} lo={c.lo} hi={c.hi}")
        rows.append((c.name, obs, c.lo, c.hi, bool(ok)))
    if on_fail == "raise" and failed:
        raise ValueError("expectations failed: " + "; ".join(failed))
    return spark.createDataFrame(
        rows, "check_name string, observed double, lo double, hi double, passed boolean"
    )


def report_oracle_sql(table_sql: str, checks: list[Check]) -> str:
    """DuckDB query producing the identical report (checks with a
    ``sql_metric`` only — callers should assert all checks carry one)."""
    selects = []
    for c in checks:
        if c.sql_metric is None:
            raise ValueError(f"check {c.name} has no SQL twin")
        lo = "NULL" if c.lo is None else f"{float(c.lo)}"
        hi = "NULL" if c.hi is None else f"{float(c.hi)}"
        passed_parts = []
        if c.lo is not None:
            passed_parts.append(f"m >= {float(c.lo)}")
        if c.hi is not None:
            passed_parts.append(f"m <= {float(c.hi)}")
        passed = " AND ".join(passed_parts) or "TRUE"
        selects.append(
            f"SELECT '{c.name}' AS check_name, m AS observed, CAST({lo} AS DOUBLE) AS lo,"
            f" CAST({hi} AS DOUBLE) AS hi, ({passed}) AS passed FROM"
            f" (SELECT {c.sql_metric} AS m FROM {table_sql})"
        )
    return " UNION ALL ".join(selects)


def observed_checks(
    df: DataFrame, checks: list[Check], name: str = "volga_expectations"
):
    """Attach row-local checks to an existing plan via ``df.observe`` — the
    metrics are computed by the SAME action that materializes ``df`` (zero
    extra scans; the streaming/write-path variant). Distinct-based checks
    (``unique``) are rejected: CollectMetrics only allows unconditional
    aggregates. Returns (df', Observation); evaluate with
    :func:`evaluate_observed` after the action ran."""
    from pyspark.sql import Observation

    for c in checks:
        if c.distinct:
            raise ValueError(f"check {c.name} needs a distinct — not observable")
    obs = Observation(name)
    out = df.observe(
        obs, *[c.metric.cast("double").alias(f"m{i}") for i, c in enumerate(checks)]
    )
    return out, obs


def evaluate_observed(obs, checks: list[Check]) -> list[tuple[str, float, bool]]:
    """(name, observed, passed) triples from a completed Observation."""
    got = obs.get
    out = []
    for i, c in enumerate(checks):
        v = got[f"m{i}"]
        ok = v is not None
        if ok and c.lo is not None:
            ok = v >= c.lo
        if ok and c.hi is not None:
            ok = v <= c.hi
        out.append((c.name, v, bool(ok)))
    return out
