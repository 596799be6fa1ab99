"""Distribution drift between corpus snapshots — the retrain-trigger monitor.

`versioning.snapshot_diff` answers "which rows changed"; this module answers
"did the DATA change shape": per-column histograms of a reference snapshot
vs a current snapshot, and Population Stability Index (PSI) per column —
the standard production ML drift gate (PSI < 0.1 stable, 0.1–0.25 drifting,
> 0.25 retrain). The reference engine has no monitoring tier; this is part
of the governance surface a 100 TB training-data platform needs around it
(same tier as `operators/expectations.py` and `operators/report.py`).

Determinism discipline (matches `report.corpus_report`):

- histogram COUNTS are exact integers (one groupBy per side over a narrow
  projection — map-side partials, shuffle volume = #bins),
- bin assignment for numeric columns is a plain arithmetic expression
  (floor((x-lo)*nbins/(hi-lo)) with under/overflow bins) built from the
  SAME formula the DuckDB twin uses — engine-exact by construction. Spark's
  `width_bucket` is NOT used because DuckDB has no such function; an
  identical expression on both engines beats two "equivalent" builtins.
- per-bin PSI contributions are one IEEE expression over two exact integer
  counts each; counts and the single-division rates hash-compare exactly,
  while the `psi_bin` column involves ln(), whose JVM (StrictMath-adjacent)
  and DuckDB (libm) implementations differ in the LAST ULP for some inputs
  — so psi_bin is verified to 1e-12 RELATIVE against the twin, not hashed
  (the same reason corpus_report keeps quantiles out of its hashed surface);
- the scalar per-column PSI TOTAL is a float sum whose order Spark does not
  pin, so it is computed by summing the (deterministic) per-bin rows in a
  defined bin order driver-side — `psi_totals` returns a tiny
  #columns-sized local result, which is where a scalar gate belongs.

Scale: one scan + one #bins-wide shuffle per side per call (all columns'
histograms ride ONE aggregation via grouping on (column, bin) after a
stack()); no joins wider than #columns × #bins rows. Bin edges come from
the caller or from `suggest_edges` (approxQuantile on the REFERENCE
snapshot — quantiles of the baseline, the standard PSI binning).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Smoothing for empty bins: rates are (count + EPS) / (total + EPS * nbins),
# the additive-smoothing form that keeps ln() finite and Σrates == 1.
EPS = 0.5


def _bin_expr(col: str, lo: float, hi: float, nbins: int) -> str:
    """SQL text for the bin index of a numeric column — 0 = underflow,
    1..nbins = interior, nbins+1 = overflow, -1 = NULL. The SAME text runs
    on Spark and DuckDB (both evaluate it as double arithmetic + floor),
    so bin assignment cannot diverge between engines.

    Rounding edge: for x just below hi, (x - lo) * nbins / (hi - lo) can
    round UP to exactly nbins, labeling the value as overflow (nbins + 1).
    Engine parity is unaffected — both sides evaluate the identical IEEE
    expression — but the overflow bin may contain a value numerically
    inside [lo, hi); PSI only cares that assignment is consistent."""
    # Interior formula: floor((x - lo) * nbins / (hi - lo)) + 1, clamped so
    # x == hi lands in bin nbins (right-closed last bin, the PSI convention).
    return (
        f"CASE WHEN {col} IS NULL THEN -1 "
        f"WHEN {col} < {lo!r} THEN 0 "
        f"WHEN {col} >= {hi!r} THEN "
        f"  CASE WHEN {col} = {hi!r} THEN {nbins} ELSE {nbins + 1} END "
        f"ELSE CAST(FLOOR(({col} - {lo!r}) * {nbins} / ({hi!r} - {lo!r})) "
        f"AS INT) + 1 END"
    )


def suggest_edges(
    ref: DataFrame, col: str, nbins: int = 10
) -> tuple[float, float]:
    """(lo, hi) spanning the reference snapshot's [p01, p99] — the standard
    PSI practice of binning on the BASELINE so drift shows up as mass in
    the under/overflow bins. ApproxQuantile is deliberately outside the
    hash-checked surface (it is approximate by contract)."""
    lo, hi = ref.approxQuantile(col, [0.01, 0.99], 0.001)
    if lo == hi:  # degenerate column — widen so the interior is non-empty
        hi = lo + 1.0
    return float(lo), float(hi)


def histogram(
    df: DataFrame,
    numeric: dict[str, tuple[float, float, int]] | None = None,
    categorical: list[str] | None = None,
) -> DataFrame:
    """(column, bin, n) exact counts for every requested column in ONE
    aggregation. `numeric` maps column → (lo, hi, nbins); `categorical`
    columns use the value itself as the bin label (NULL → '<null>')."""
    numeric = numeric or {}
    categorical = categorical or []
    if not numeric and not categorical:
        raise ValueError("no columns requested")
    pairs: list[str] = []
    for c, (lo, hi, nb) in numeric.items():
        pairs.append(f"'{c}', CAST(({_bin_expr(c, lo, hi, nb)}) AS STRING)")
    for c in categorical:
        pairs.append(f"'{c}', COALESCE(CAST({c} AS STRING), '<null>')")
    n = len(pairs)
    stacked = df.selectExpr(
        f"stack({n}, {', '.join(pairs)}) AS (column, bin)"
    )
    return stacked.groupBy("column", "bin").agg(F.count("*").alias("n"))


def drift_report(
    ref: DataFrame,
    cur: DataFrame,
    numeric: dict[str, tuple[float, float, int]] | None = None,
    categorical: list[str] | None = None,
) -> DataFrame:
    """Per-(column, bin) drift rows: exact counts on both sides, smoothed
    rates, and the bin's PSI contribution. Bins missing on one side appear
    with n = 0 (full-outer on (column, bin)). Every float column is one
    IEEE expression over exact integers → the whole frame hash-compares
    against a DuckDB twin."""
    numeric = numeric or {}
    categorical = categorical or []

    h_ref = histogram(ref, numeric, categorical).withColumnRenamed(
        "n", "n_ref"
    )
    h_cur = histogram(cur, numeric, categorical).withColumnRenamed(
        "n", "n_cur"
    )
    j = h_ref.join(h_cur, ["column", "bin"], "full_outer").na.fill(
        {"n_ref": 0, "n_cur": 0}
    )

    # Per-column totals and bin cardinality ride a window over the tiny
    # joined frame (#columns × #bins rows) — no second pass over the data.
    from pyspark.sql import Window

    w = Window.partitionBy("column")
    j = (
        j.withColumn("tot_ref", F.sum("n_ref").over(w))
        .withColumn("tot_cur", F.sum("n_cur").over(w))
        .withColumn("k", F.count("*").over(w))
    )
    p = (F.col("n_ref") + F.lit(EPS)) / (
        F.col("tot_ref") + F.lit(EPS) * F.col("k")
    )
    q = (F.col("n_cur") + F.lit(EPS)) / (
        F.col("tot_cur") + F.lit(EPS) * F.col("k")
    )
    return j.select(
        "column",
        "bin",
        "n_ref",
        "n_cur",
        p.alias("rate_ref"),
        q.alias("rate_cur"),
        ((p - q) * (F.log(p) - F.log(q))).alias("psi_bin"),
    )


def psi_totals(report: DataFrame) -> dict[str, float]:
    """column → PSI, summed over bins in (column, bin) order driver-side so
    the float total is reproducible (Spark's distributed float sum is not
    order-stable; #columns × #bins rows is a scalar-gate-sized result)."""
    rows = report.select("column", "bin", "psi_bin").collect()
    acc: dict[str, list[tuple[str, float]]] = {}
    for r in rows:
        acc.setdefault(r["column"], []).append((r["bin"], r["psi_bin"]))
    return {
        c: math.fsum(v for _, v in sorted(bins))
        for c, bins in sorted(acc.items())
    }


def drifted_columns(
    ref: DataFrame,
    cur: DataFrame,
    numeric: dict[str, tuple[float, float, int]] | None = None,
    categorical: list[str] | None = None,
    threshold: float = 0.25,
) -> dict[str, float]:
    """The gate: columns whose PSI exceeds `threshold` (0.25 = the standard
    'retrain' line), with their PSI values."""
    totals = psi_totals(drift_report(ref, cur, numeric, categorical))
    return {c: v for c, v in totals.items() if v > threshold}


def psi_from_counts(
    ref_counts: dict[str, dict[str, int]],
    cur_counts: dict[str, dict[str, int]],
) -> dict[str, float]:
    """Pure-Python PSI from {column: {bin: n}} maps — the same smoothing /
    rank arithmetic as `drift_report`, shared by the streaming monitor and
    usable on any pre-aggregated counts. Bins union per column; order is
    sorted(bin) so the float sum is reproducible."""
    out: dict[str, float] = {}
    for col in sorted(set(ref_counts) | set(cur_counts)):
        r = ref_counts.get(col, {})
        c = cur_counts.get(col, {})
        bins = sorted(set(r) | set(c))
        k = len(bins)
        if k == 0:
            out[col] = 0.0
            continue
        tr = sum(r.values())
        tc = sum(c.values())
        total = 0.0
        terms = []
        for b in bins:
            p = (r.get(b, 0) + EPS) / (tr + EPS * k)
            q = (c.get(b, 0) + EPS) / (tc + EPS * k)
            terms.append((p - q) * (math.log(p) - math.log(q)))
        out[col] = math.fsum(terms)
    return out


class StreamDriftMonitor:
    """Streaming twin of `drift_report`: fold each micro-batch's histogram
    (the SAME `histogram()` pass, so bin assignment is identical to the
    batch/oracle path) into cumulative per-column counts, and read PSI vs a
    pinned reference at any time.

    Use with foreachBatch:

        mon = StreamDriftMonitor(ref_hist, numeric=..., categorical=...)
        q = stream.writeStream.foreachBatch(mon).start()
        ...
        mon.psi()             # {column: PSI so far}
        mon.drifted(0.25)     # the gate

    `ref_hist` is the reference snapshot's `histogram(...)` result,
    collected — #columns × #bins rows, a driver-sized object by
    construction (same as the batch report). Per micro-batch cost: one
    histogram aggregation of the BATCH (batch-sized, not stream-sized) and
    a driver-side dict merge of #bins entries. The monitor state is
    cumulative counts — exact, so stream-fed PSI equals the batch PSI over
    the same rows (pinned by test_drift_stream)."""

    def __init__(
        self,
        ref_hist: DataFrame,
        numeric: dict[str, tuple[float, float, int]] | None = None,
        categorical: list[str] | None = None,
    ) -> None:
        self.numeric = numeric or {}
        self.categorical = categorical or []
        self.ref: dict[str, dict[str, int]] = {}
        for r in ref_hist.collect():
            self.ref.setdefault(r["column"], {})[r["bin"]] = r["n"]
        self.cur: dict[str, dict[str, int]] = {}

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        h = histogram(batch_df, self.numeric, self.categorical)
        for r in h.collect():
            col = self.cur.setdefault(r["column"], {})
            col[r["bin"]] = col.get(r["bin"], 0) + r["n"]

    def psi(self) -> dict[str, float]:
        return psi_from_counts(self.ref, self.cur)

    def drifted(self, threshold: float = 0.25) -> dict[str, float]:
        return {c: v for c, v in self.psi().items() if v > threshold}
