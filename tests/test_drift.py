"""Drift monitor: per-bin report hash-matches a DuckDB twin built from the
SAME bin expression text; PSI totals match an independent Python reference;
identity / symmetry / gate properties."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from volga_spark.operators.drift import (
    EPS,
    _bin_expr,
    drift_report,
    drifted_columns,
    histogram,
    psi_totals,
    suggest_edges,
)
from volga_spark.oracle import compare_frames, run_oracle
from volga_spark.tables import load_table


def _twin_sql(side_pred: dict[str, str], lo, hi, nb) -> str:
    """DuckDB twin of drift_report for events.value (numeric) + event_type
    (categorical), ref/cur split by a predicate — the same bin expression
    text `_bin_expr` emits, the same EPS smoothing arithmetic."""
    be = _bin_expr("value", lo, hi, nb)
    sides = {}
    for name, pred in side_pred.items():
        sides[name] = f"""
        SELECT 'value' AS "column", CAST(({be}) AS VARCHAR) AS bin,
               count(*) AS n
        FROM events WHERE {pred} GROUP BY 1, 2
        UNION ALL
        SELECT 'event_type', COALESCE(CAST(event_type AS VARCHAR), '<null>'),
               count(*)
        FROM events WHERE {pred} GROUP BY 1, 2
        """
    return f"""
    WITH h_ref AS ({sides['ref']}), h_cur AS ({sides['cur']}),
    j AS (
        SELECT COALESCE(r."column", c."column") AS "column",
               COALESCE(r.bin, c.bin) AS bin,
               COALESCE(r.n, 0) AS n_ref, COALESCE(c.n, 0) AS n_cur
        FROM h_ref r FULL OUTER JOIN h_cur c
          ON r."column" = c."column" AND r.bin = c.bin
    ),
    t AS (
        SELECT *, sum(n_ref) OVER (PARTITION BY "column") AS tot_ref,
                  sum(n_cur) OVER (PARTITION BY "column") AS tot_cur,
                  count(*) OVER (PARTITION BY "column") AS k
        FROM j
    )
    SELECT "column", bin, n_ref, n_cur,
           (n_ref + {EPS}) / (tot_ref + {EPS} * k) AS rate_ref,
           (n_cur + {EPS}) / (tot_cur + {EPS} * k) AS rate_cur,
           ((n_ref + {EPS}) / (tot_ref + {EPS} * k)
            - (n_cur + {EPS}) / (tot_cur + {EPS} * k))
           * (ln((n_ref + {EPS}) / (tot_ref + {EPS} * k))
              - ln((n_cur + {EPS}) / (tot_cur + {EPS} * k))) AS psi_bin
    FROM t
    """


def test_drift_report_matches_duckdb(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    ref = ev.filter(F.col("event_id") % 2 == 0)
    cur = ev.filter(F.col("event_id") % 2 == 1)
    lo, hi, nb = 0.0, 50.0, 8
    got = drift_report(
        ref, cur, numeric={"value": (lo, hi, nb)}, categorical=["event_type"]
    ).toPandas()
    oracle = run_oracle(
        _twin_sql(
            {"ref": "event_id % 2 = 0", "cur": "event_id % 2 = 1"}, lo, hi, nb
        ),
        sf_dir,
    )
    # counts + single-division rates hash-compare exactly; psi_bin uses ln()
    # whose JVM/libm implementations differ in the last ULP → 1e-12 relative
    exact_cols = ["column", "bin", "n_ref", "n_cur", "rate_ref", "rate_cur"]
    assert not compare_frames(got[exact_cols], oracle[exact_cols])
    key = ["column", "bin"]
    g = got.set_index(key)["psi_bin"].sort_index()
    o = oracle.set_index(key)["psi_bin"].sort_index()
    assert list(g.index) == list(o.index)
    assert all(
        math.isclose(a, b, rel_tol=1e-12, abs_tol=1e-15)
        for a, b in zip(g.tolist(), o.tolist())
    )


def test_psi_matches_python_reference(spark):
    ref_rows = [(float(v),) for v in [1, 1, 2, 2, 2, 3, 5, 8, 9, 9]]
    cur_rows = [(float(v),) for v in [6, 6, 7, 7, 8, 8, 9, 9, 9, 2]]
    ref = spark.createDataFrame(ref_rows, "x double")
    cur = spark.createDataFrame(cur_rows, "x double")
    lo, hi, nb = 0.0, 10.0, 5
    got = psi_totals(drift_report(ref, cur, numeric={"x": (lo, hi, nb)}))

    def bins(vals):
        out = {}
        for v in vals:
            if v < lo:
                b = 0
            elif v == hi:
                b = nb
            elif v > hi:
                b = nb + 1
            else:
                b = int(math.floor((v - lo) * nb / (hi - lo))) + 1
            out[b] = out.get(b, 0) + 1
        return out

    br, bc = bins([v for (v,) in ref_rows]), bins([v for (v,) in cur_rows])
    keys = sorted(set(br) | set(bc))
    k, tr, tc = len(keys), sum(br.values()), sum(bc.values())
    expected = math.fsum(
        ((br.get(b, 0) + EPS) / (tr + EPS * k)
         - (bc.get(b, 0) + EPS) / (tc + EPS * k))
        * (math.log((br.get(b, 0) + EPS) / (tr + EPS * k))
           - math.log((bc.get(b, 0) + EPS) / (tc + EPS * k)))
        for b in keys
    )
    assert math.isclose(got["x"], expected, rel_tol=1e-12)
    assert got["x"] > 0.25  # the crafted shift is a retrain-grade drift


def test_identical_snapshots_have_zero_psi(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    totals = psi_totals(
        drift_report(
            ev, ev, numeric={"value": (0.0, 50.0, 8)},
            categorical=["event_type"],
        )
    )
    assert all(abs(v) < 1e-12 for v in totals.values())


def test_psi_is_symmetric(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_id") % 3 == 0)
    b = ev.filter(F.col("event_id") % 3 != 0)
    spec = {"value": (0.0, 50.0, 6)}
    ab = psi_totals(drift_report(a, b, numeric=spec))
    ba = psi_totals(drift_report(b, a, numeric=spec))
    assert math.isclose(ab["value"], ba["value"], rel_tol=1e-12)


def test_gate_flags_only_drifted_columns(spark):
    ref = spark.createDataFrame(
        [(float(i % 10), "a" if i % 2 else "b") for i in range(200)],
        "x double, c string",
    )
    cur = spark.createDataFrame(
        [(float(i % 10) + 40.0, "a" if i % 2 else "b") for i in range(200)],
        "x double, c string",
    )
    flagged = drifted_columns(
        ref, cur, numeric={"x": (0.0, 10.0, 5)}, categorical=["c"]
    )
    assert "x" in flagged and flagged["x"] > 0.25
    assert "c" not in flagged  # unchanged distribution stays under the gate


def test_histogram_counts_cover_input(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    h = histogram(ev, numeric={"value": (0.0, 50.0, 8)})
    assert h.agg(F.sum("n")).first()[0] == ev.count()


def test_suggest_edges_spans_reference(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    lo, hi = suggest_edges(ev, "value", nbins=10)
    assert lo < hi


def test_stream_drift_equals_batch(spark, sf_dir, tmp_path):
    """Stream-fed cumulative histogram == batch histogram over the same
    rows, and stream PSI == batch PSI exactly (the batch<->stream
    unification discipline for the monitoring tier)."""
    from volga_spark.operators.drift import StreamDriftMonitor, psi_from_counts
    from volga_spark.streaming.sources import chunked_file_stream
    from volga_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    numeric = {"value": (0.0, 50.0, 8)}
    cats = ["event_type"]
    ref = ev.filter(F.col("event_id") % 2 == 0)
    mon = StreamDriftMonitor(histogram(ref, numeric, cats), numeric, cats)

    stream, _ = chunked_file_stream(spark, sf_dir, "events", "ts", n_chunks=4)
    q = stream.writeStream.foreachBatch(mon).trigger(
        availableNow=True
    ).option(
        "checkpointLocation", str(tmp_path / "drift_ckpt")
    ).start()
    q.awaitTermination(120)

    # cumulative stream counts == one-shot batch counts, bin for bin
    batch_counts: dict = {}
    for r in histogram(ev, numeric, cats).collect():
        batch_counts.setdefault(r["column"], {})[r["bin"]] = r["n"]
    assert mon.cur == batch_counts

    # and the PSI gate equals the batch-computed PSI exactly
    batch_psi = psi_totals(drift_report(ref, ev, numeric, cats))
    stream_psi = mon.psi()
    assert set(stream_psi) == set(batch_psi)
    for c in batch_psi:
        assert math.isclose(stream_psi[c], batch_psi[c], rel_tol=1e-12)
