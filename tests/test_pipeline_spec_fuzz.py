"""Differential PipelineSpec fuzzer (r11 verdict #3).

The golden tests cover the reference's 18 sql_tests shapes; this covers the
COMBINATORIAL space of user-written specs: a seeded generator draws random
(window kind × frame size × agg mix × leg composition) specs in the
reference's SQL dialect, compiles them through the real PipelineSpec front
end, and emits the equivalent DuckDB query over the same synthetic source —
value-for-value comparison per alias (exact for ints/strings, 1e-9 relative
for floats, per the repo's float-parity rule).

The synthetic source has UNIQUE ts per partition so ROWS frames are
well-defined in both engines. On a failing seed the harness SHRINKS by
re-running each call in isolation and reports the minimal failing spec.

Seed count: FUZZ_SEEDS env (default 25 for CI cadence; the committed deep
sweep ran 300 — see COVERAGE.md r12).
"""

from __future__ import annotations

import os
import random
from datetime import datetime, timedelta

import duckdb
import numpy as np
import pandas as pd
import pytest

from volga_spark.api import PipelineSpec, SourceSpec
from volga_spark.formatting import DUCK_FMT

N_ROWS = 420
N_USERS = 7
CATS = ["a", "b", "c", "d", "e"]


def fmt(expr: str) -> str:
    return DUCK_FMT.format(expr=expr)


def _source_pdf() -> pd.DataFrame:
    base = datetime(2024, 3, 1)
    rows = []
    for i in range(N_ROWS):
        value = ((i * 37) % 5000) / 100.0 - 10.0
        rows.append(
            {
                "event_id": i,
                "user_id": i % N_USERS,
                # strictly increasing -> unique ts per partition
                "ts": base + timedelta(seconds=13 * i),
                "value": value,
                "vc": int(round(value * 100)),
                "event_type": CATS[(i * 11) % len(CATS)],
            }
        )
    return pd.DataFrame(rows)


# --- random draw ------------------------------------------------------------


def _draw_window(rng: random.Random, name: str) -> dict:
    pk = rng.choice(["user_id", "event_type"])
    if rng.random() < 0.6:
        n, unit = rng.choice(
            [(rng.randint(30, 900), "SECOND"), (rng.randint(1, 40), "MINUTE"),
             (rng.randint(1, 3), "HOUR")]
        )
        return {"name": name, "kind": "range", "n": n, "unit": unit, "pk": pk}
    return {"name": name, "kind": "rows", "n": rng.randint(1, 60), "pk": pk}


def _draw_cond(rng: random.Random) -> tuple[str, str]:
    """(spark/source-side expr, pairs-side expr over v/vc/cat)."""
    kind = rng.randrange(4)
    if kind == 0:
        c = round(rng.uniform(-5, 30), 2)
        return f"value > {c}", f"v > {c}"
    if kind == 1:
        k = rng.choice([2, 3, 5, 7])
        return f"vc % {k} = 0", f"vc % {k} = 0"
    if kind == 2:
        cat = rng.choice(CATS)
        return f"event_type <> '{cat}'", f"cat <> '{cat}'"
    c = round(rng.uniform(-5, 30), 2)
    return f"value <= {c}", f"v <= {c}"


_NATIVE = ["sum", "count", "min", "max", "avg", "stddev"]
_WHERE = ["sum", "count", "min", "max", "avg"]
_CATE = ["sum", "count", "avg", "min", "max"]
_TOPN_AGG = ["sum", "count", "min", "max", "avg", "ratio"]


def _draw_call(rng: random.Random, i: int, wname: str) -> dict:
    alias = f"c{i}"
    family = rng.choice(["native", "where", "cate", "cate_where", "top", "topn"])
    if family == "native":
        agg = rng.choice(_NATIVE)
        col = "value" if agg in ("avg", "stddev") else rng.choice(["vc", "value"])
        if agg in ("sum", "count", "min", "max") and col == "value":
            col = "vc"  # keep sums/extrema integer-exact
        return {"family": family, "alias": alias, "w": wname, "agg": agg, "col": col}
    if family == "where":
        agg = rng.choice(_WHERE)
        cond_src, cond_pairs = _draw_cond(rng)
        col = "value" if agg == "avg" else "vc"
        return {
            "family": family, "alias": alias, "w": wname, "agg": agg,
            "col": col, "cond_src": cond_src, "cond_pairs": cond_pairs,
        }
    if family in ("cate", "cate_where"):
        agg = rng.choice(_CATE)
        out = {"family": family, "alias": alias, "w": wname, "agg": agg}
        if family == "cate_where":
            out["cond_src"], out["cond_pairs"] = _draw_cond(rng)
        return out
    if family == "top":
        shape = rng.choice(
            ["top", "topn_frequency", "top1_ratio", "count_distinct",
             "quantile_disc"]
        )
        out = {"family": family, "alias": alias, "w": wname, "shape": shape}
        if shape in ("top", "topn_frequency"):
            out["k"] = rng.randint(1, 4)
        elif shape == "quantile_disc":
            out["q"] = rng.choice([0.1, 0.25, 0.5, 0.75, 0.9, 1.0])
        return out
    agg = rng.choice(_TOPN_AGG)
    cond_src, cond_pairs = _draw_cond(rng)
    return {
        "family": "topn", "alias": alias, "w": wname, "agg": agg,
        "order": rng.choice(["key", "value"]), "k": rng.randint(1, 3),
        "cond_src": cond_src, "cond_pairs": cond_pairs,
    }


def draw_spec(seed: int) -> dict:
    rng = random.Random(seed)
    windows = [_draw_window(rng, f"w{i}") for i in range(rng.randint(1, 2))]
    calls = [
        _draw_call(rng, i, rng.choice(windows)["name"])
        for i in range(rng.randint(2, 4))
    ]
    return {"windows": windows, "calls": calls}


# --- PipelineSpec SQL -------------------------------------------------------


def _call_sql(c: dict) -> str:
    f = c["family"]
    if f == "native":
        return f"{c['agg']}({c['col']}) OVER {c['w']} AS {c['alias']}"
    if f == "where":
        return (
            f"{c['agg']}_where({c['col']}, {c['cond_src']}) OVER {c['w']} "
            f"AS {c['alias']}"
        )
    if f == "cate":
        return f"{c['agg']}_cate(vc, event_type) OVER {c['w']} AS {c['alias']}"
    if f == "cate_where":
        return (
            f"{c['agg']}_cate_where(vc, {c['cond_src']}, event_type) "
            f"OVER {c['w']} AS {c['alias']}"
        )
    if f == "top":
        s = c["shape"]
        if s == "top":
            return f"top(vc, {c['k']}) OVER {c['w']} AS {c['alias']}"
        if s == "topn_frequency":
            return (
                f"topn_frequency(event_type, {c['k']}) OVER {c['w']} "
                f"AS {c['alias']}"
            )
        if s == "top1_ratio":
            return f"top1_ratio(event_type) OVER {c['w']} AS {c['alias']}"
        if s == "quantile_disc":
            return (
                f"quantile_disc(vc, {c['q']}) OVER {c['w']} AS {c['alias']}"
            )
        return f"count_distinct(event_type) OVER {c['w']} AS {c['alias']}"
    agg = c["agg"]
    if agg == "ratio":
        fn = f"top_n_{c['order']}_ratio_cate"
    else:
        fn = f"top_n_{c['order']}_{agg}_cate_where"
    return (
        f"{fn}(vc, {c['cond_src']}, event_type, {c['k']}) OVER {c['w']} "
        f"AS {c['alias']}"
    )


def _window_sql(w: dict) -> str:
    if w["kind"] == "range":
        frame = (
            f"RANGE BETWEEN INTERVAL '{w['n']}' {w['unit']} PRECEDING "
            "AND CURRENT ROW"
        )
    else:
        frame = f"ROWS BETWEEN {w['n']} PRECEDING AND CURRENT ROW"
    return (
        f"{w['name']} AS (PARTITION BY {w.get('pk', 'user_id')} "
        f"ORDER BY ts {frame})"
    )


def spec_sql(spec: dict) -> str:
    calls = ",\n       ".join(_call_sql(c) for c in spec["calls"])
    wins = ",\n       ".join(_window_sql(w) for w in spec["windows"])
    return f"SELECT event_id,\n       {calls}\nFROM src\nWINDOW {wins}"


# --- DuckDB twin ------------------------------------------------------------


def _pairs_ctes(w: dict) -> list[str]:
    """CTEs producing pairs_<w>: (eid, cat, v, vc) — one row per
    (event, window member), the window-membership relation both sweep
    families aggregate over."""
    nm = w["name"]
    pk = w.get("pk", "user_id")
    if w["kind"] == "range":
        return [
            f"""pairs_{nm} AS (
              SELECT e.event_id AS eid, e2.event_type AS cat,
                     e2.value AS v, e2.vc AS vc
              FROM src e JOIN src e2 ON e2.{pk} = e.{pk}
               AND e2.ts >= e.ts - INTERVAL {w['n']} {w['unit']}
               AND e2.ts <= e.ts)"""
        ]
    return [
        f"""nb_{nm} AS (
          SELECT *, row_number() OVER (PARTITION BY {pk} ORDER BY ts) AS rn
          FROM src)""",
        f"""pairs_{nm} AS (
          SELECT e.event_id AS eid, e2.event_type AS cat,
                 e2.value AS v, e2.vc AS vc
          FROM nb_{nm} e JOIN nb_{nm} e2 ON e2.{pk} = e.{pk}
           AND e2.rn BETWEEN e.rn - {w['n']} AND e.rn)""",
    ]


def _cate_val(agg: str) -> str:
    # scale=1 in the SQL dialect: int aggs render as plain ints, avg as float
    return {
        "sum": "CAST(s AS VARCHAR)",
        "count": "CAST(c AS VARCHAR)",
        "min": "CAST(mn AS VARCHAR)",
        "max": "CAST(mx AS VARCHAR)",
        "avg": fmt("s / c"),
    }[agg]


def _twin_call(c: dict, ctes: list[str], selects: list[str]) -> None:
    a, w = c["alias"], c["w"]
    f = c["family"]
    if f == "native":
        selects.append(f"{c['agg']}({c['col']}) OVER {w} AS {a}")
        return
    if f == "where":
        selects.append(
            f"{c['agg']}(CASE WHEN {c['cond_src']} THEN {c['col']} END) "
            f"OVER {w} AS {a}"
        )
        return
    if f in ("cate", "cate_where"):
        cond = f"WHERE {c['cond_pairs']}" if f == "cate_where" else ""
        val = _cate_val(c["agg"])
        ctes.append(
            f"""agg_{a} AS (
              SELECT eid, cat, CAST(sum(vc) AS BIGINT) AS s, count(*) AS c,
                     min(vc) AS mn, max(vc) AS mx
              FROM pairs_{w} {cond} GROUP BY eid, cat)"""
        )
        ctes.append(
            f"""str_{a} AS (
              SELECT eid, string_agg(p, ',' ORDER BY p) AS {a}
              FROM (SELECT eid, cat || ':' || {val} AS p FROM agg_{a})
              GROUP BY eid)"""
        )
        selects.append(f"coalesce(str_{a}.{a}, '') AS {a}")
        return
    if f == "top":
        s = c["shape"]
        if s == "top":
            ctes.append(
                f"""str_{a} AS (
                  SELECT eid, string_agg(CAST(vc AS VARCHAR), ','
                             ORDER BY vc DESC) AS {a}
                  FROM (SELECT eid, vc, row_number() OVER
                          (PARTITION BY eid ORDER BY vc DESC) AS rk
                        FROM pairs_{w})
                  WHERE rk <= {c['k']} GROUP BY eid)"""
            )
            selects.append(f"coalesce(str_{a}.{a}, '') AS {a}")
        elif s == "topn_frequency":
            ctes.append(
                f"""str_{a} AS (
                  SELECT eid, string_agg(cat, ',' ORDER BY c DESC, cat DESC)
                         AS {a}
                  FROM (SELECT eid, cat, c, row_number() OVER
                          (PARTITION BY eid ORDER BY c DESC, cat DESC) AS rk
                        FROM (SELECT eid, cat, count(*) AS c
                              FROM pairs_{w} GROUP BY eid, cat))
                  WHERE rk <= {c['k']} GROUP BY eid)"""
            )
            selects.append(f"coalesce(str_{a}.{a}, '') AS {a}")
        elif s == "top1_ratio":
            ctes.append(
                f"""str_{a} AS (
                  SELECT eid, CAST(max(CASE WHEN rk = 1 THEN c END) AS DOUBLE)
                              / max(total) AS {a}
                  FROM (SELECT eid, c, row_number() OVER
                          (PARTITION BY eid ORDER BY c DESC, cat DESC) AS rk,
                          sum(c) OVER (PARTITION BY eid) AS total
                        FROM (SELECT eid, cat, count(*) AS c
                              FROM pairs_{w} GROUP BY eid, cat))
                  GROUP BY eid)"""
            )
            selects.append(f"str_{a}.{a} AS {a}")
        elif s == "quantile_disc":
            # percentile_disc semantics: smallest v with cum >= ceil(q*m)
            ctes.append(
                f"""str_{a} AS (
                  SELECT eid, CAST(min(CASE WHEN cum >=
                         CAST(ceil({c['q']} * m) AS BIGINT) THEN vc END)
                         AS DOUBLE) AS {a}
                  FROM (SELECT eid, vc,
                               CAST(sum(cnt) OVER (PARTITION BY eid
                                    ORDER BY vc) AS BIGINT) AS cum,
                               CAST(sum(cnt) OVER (PARTITION BY eid)
                                    AS BIGINT) AS m
                        FROM (SELECT eid, vc, count(*) AS cnt
                              FROM pairs_{w} GROUP BY eid, vc))
                  GROUP BY eid)"""
            )
            selects.append(f"str_{a}.{a} AS {a}")
        else:  # count_distinct
            ctes.append(
                f"""str_{a} AS (
                  SELECT eid, count(DISTINCT cat) AS {a}
                  FROM pairs_{w} GROUP BY eid)"""
            )
            selects.append(f"str_{a}.{a} AS {a}")
        return
    # topn family
    if c["agg"] == "ratio":
        ctes.append(
            f"""agg_{a} AS (
              SELECT eid, cat,
                     CAST(count(CASE WHEN {c['cond_pairs']} THEN 1 END)
                          AS DOUBLE) / count(*) AS av
              FROM pairs_{w} GROUP BY eid, cat)"""
        )
        val = fmt("av")
    else:
        ctes.append(
            f"""agg_{a} AS (
              SELECT eid, cat, CAST(sum(vc) AS BIGINT) AS s, count(*) AS c,
                     min(vc) AS mn, max(vc) AS mx
              FROM pairs_{w} WHERE {c['cond_pairs']} GROUP BY eid, cat)"""
        )
        val = {
            "sum": "CAST(s AS VARCHAR)", "count": "CAST(c AS VARCHAR)",
            "min": "CAST(mn AS VARCHAR)", "max": "CAST(mx AS VARCHAR)",
            "avg": fmt("s / c"),
        }[c["agg"]]
    order_val = {
        "sum": "s", "count": "c", "min": "mn", "max": "mx",
        "avg": "s / c", "ratio": "av",
    }[c["agg"]]
    if c["order"] == "key":
        rk_order, agg_order = "cat DESC", "cat DESC"
    else:
        rk_order = agg_order = f"{order_val} DESC, cat DESC"
    ctes.append(
        f"""str_{a} AS (
          SELECT eid, string_agg(cat || ':' || {val}, ','
                     ORDER BY {agg_order}) AS {a}
          FROM (SELECT *, row_number() OVER
                  (PARTITION BY eid ORDER BY {rk_order}) AS rk
                FROM agg_{a})
          WHERE rk <= {c['k']} GROUP BY eid)"""
    )
    selects.append(f"coalesce(str_{a}.{a}, '') AS {a}")


def twin_sql(spec: dict) -> str:
    ctes: list[str] = []
    for w in spec["windows"]:
        if any(c["family"] not in ("native", "where") for c in spec["calls"]
               if c["w"] == w["name"]):
            ctes.extend(_pairs_ctes(w))
    selects: list[str] = []
    joins: list[str] = []
    for c in spec["calls"]:
        before = len(ctes)
        _twin_call(c, ctes, selects)
        if len(ctes) > before:  # sweep-family call -> join its str_ CTE
            joins.append(
                f"LEFT JOIN str_{c['alias']} "
                f"ON str_{c['alias']}.eid = src.event_id"
            )
    wins = ",\n       ".join(_window_sql(w) for w in spec["windows"])
    with_clause = ("WITH " + ",\n".join(ctes) + "\n") if ctes else ""
    return (
        f"{with_clause}SELECT src.event_id,\n       "
        + ",\n       ".join(selects)
        + "\nFROM src\n"
        + "\n".join(joins)
        + f"\nWINDOW {wins}"
    )


# --- execution + compare ----------------------------------------------------


def run_spec(spark, src_df, spec: dict) -> pd.DataFrame:
    p = PipelineSpec(
        sql=spec_sql(spec), sources=[SourceSpec("src", dataframe=src_df)]
    )
    return p.build(spark).toPandas().set_index("event_id").sort_index()


def run_twin(pdf: pd.DataFrame, spec: dict) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("src", pdf)
    out = con.execute(twin_sql(spec)).df()
    con.close()
    return out.set_index("event_id").sort_index()


def compare(spark_out: pd.DataFrame, duck_out: pd.DataFrame, spec: dict) -> list[str]:
    problems = []
    for c in spec["calls"]:
        a = c["alias"]
        got, want = spark_out[a], duck_out[a]
        if len(got) != len(want):
            problems.append(f"{a}: row count {len(got)} != {len(want)}")
            continue
        gv, wv = got.to_numpy(), want.to_numpy()
        if got.dtype.kind == "f" or want.dtype.kind == "f":
            g = got.astype(float).to_numpy()
            x = want.astype(float).to_numpy()
            both_nan = np.isnan(g) & np.isnan(x)
            close = np.isclose(g, x, rtol=1e-9, atol=1e-12, equal_nan=True)
            bad = ~(close | both_nan)
        else:
            bad = np.array([str(a_) != str(b_) for a_, b_ in zip(gv, wv)])
        if bad.any():
            i = int(np.argmax(bad))
            problems.append(
                f"{a} ({c['family']}): {int(bad.sum())} mismatches, first at "
                f"event_id={spark_out.index[i]}: spark={gv[i]!r} duck={wv[i]!r}"
            )
    return problems


_SEEDS = int(os.environ.get("FUZZ_SEEDS", "25"))
_SRC_PDF = _source_pdf()


@pytest.fixture(scope="module")
def src_df(spark):
    df = spark.createDataFrame(_SRC_PDF).localCheckpoint()
    return df


@pytest.mark.parametrize("seed", range(_SEEDS))
def test_spec_fuzz_differential(spark, src_df, seed):
    spec = draw_spec(seed)
    problems = compare(
        run_spec(spark, src_df, spec), run_twin(_SRC_PDF, spec), spec
    )
    if problems:
        # shrink: isolate each failing call into a one-call spec
        minimal = []
        for c in spec["calls"]:
            sub = {"windows": spec["windows"], "calls": [c]}
            sub_p = compare(
                run_spec(spark, src_df, sub), run_twin(_SRC_PDF, sub), sub
            )
            if sub_p:
                minimal.append((spec_sql(sub), sub_p))
        raise AssertionError(
            f"seed {seed} diverged: {problems}\nSHRUNK: {minimal or 'only-in-combination'}"
            f"\nFULL SQL:\n{spec_sql(spec)}"
        )


# --- request-mode differential (write path vs virtual-point sweep) -----------


def draw_request_spec(seed: int) -> dict:
    """Request-mode-shaped spec: 1-2 windows over the same partition/order
    (r12 multi-WINDOW serving), RANGE or ROWS (r13 — the reference's own
    request bench is ROWS, window_operator_benchmark.rs:609-612), 2-4 calls
    across every family the service compiles."""
    rng = random.Random(10_000 + seed)
    windows = []
    for i in range(rng.randint(1, 2)):
        if rng.random() < 0.35:
            windows.append(
                {"name": f"w{i}", "kind": "rows", "n": rng.randint(1, 60),
                 "pk": "user_id"}
            )
            continue
        n, unit = rng.choice(
            [(rng.randint(60, 900), "SECOND"), (rng.randint(2, 40), "MINUTE"),
             (rng.randint(1, 3), "HOUR")]
        )
        windows.append(
            {"name": f"w{i}", "kind": "range", "n": n, "unit": unit,
             "pk": "user_id"}
        )
    calls = [
        _draw_call(rng, i, rng.choice(windows)["name"])
        for i in range(rng.randint(2, 4))
    ]
    return {"windows": windows, "calls": calls}


_REQ_SEEDS = int(os.environ.get("FUZZ_REQUEST_SEEDS", "8"))


@pytest.mark.parametrize("seed", range(_REQ_SEEDS))
def test_request_mode_fuzz_matches_write_path(spark, src_df, seed):
    """The SAME random spec compiled two independent ways — the emitting
    write path (native Catalyst windows + batch sweep) and the request
    service (virtual-point retractable sweep over state) — must agree at
    every existing event's own (key, ts). RANGE frames: request rows never
    contribute, so the lookup answer IS that row's write-path value. ROWS
    frames (r13): the virtual point consumes the current-row slot
    (reference plain_points.rs:345-370), so its frame is the last n STATE
    rows at-or-before — with the source's unique-ts-per-partition
    guarantee, that equals the write-path value at ROWS n-1 PRECEDING; the
    write twin decrements each ROWS window accordingly."""
    from pyspark.sql import functions as F

    spec = draw_request_spec(seed)
    write_spec = {
        "windows": [
            {**w, "n": w["n"] - 1} if w["kind"] == "rows" else w
            for w in spec["windows"]
        ],
        "calls": spec["calls"],
    }
    p_write = PipelineSpec(
        sql=spec_sql(write_spec), sources=[SourceSpec("src", dataframe=src_df)]
    )
    aliases = [c["alias"] for c in spec["calls"]]
    write = {
        r["event_id"]: r
        for r in p_write.build(spark).filter(F.col("event_id") % 5 == 0).collect()
    }
    assert write
    p = PipelineSpec(
        sql=spec_sql(spec), sources=[SourceSpec("src", dataframe=src_df)]
    )
    svc = p.build_request_service(spark)
    try:
        requests = src_df.filter(F.col("event_id") % 5 == 0).select(
            F.col("event_id").alias("request_id"), "user_id", "ts"
        )
        got = {r["request_id"]: r for r in svc.lookup(requests).collect()}
    finally:
        svc.close()
    assert set(got) == set(write)
    problems = []
    for rid in sorted(write):
        for c in spec["calls"]:
            a = c["alias"]
            wv, gv = write[rid][a], got[rid][a]
            if isinstance(wv, float) or isinstance(gv, float):
                # stddev: Catalyst's moment-based vs the sweep's s2 form
                # differ in the last ulps on near-constant windows
                tol = 1e-6 if c.get("agg") == "stddev" else 1e-9
                ok = (
                    (wv is None and gv is None)
                    or (
                        wv is not None
                        and gv is not None
                        and (
                            abs(float(wv) - float(gv))
                            <= tol * max(1.0, abs(float(wv)))
                        )
                    )
                )
            else:
                ok = wv == gv
            if not ok:
                problems.append((rid, a, c["family"], wv, gv))
    assert not problems, (
        f"seed {seed}: {len(problems)} divergences, first 5: {problems[:5]}\n"
        f"SQL:\n{spec_sql(spec)}"
    )
