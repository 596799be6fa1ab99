"""Objective prep (FIM + T5 span corruption): DuckDB twins, reconstruction
invariants, determinism, plan audits."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from volga_spark.operators.objectives import (
    fim_oracle_sql,
    fim_transform,
    span_corruption,
    span_corruption_oracle_sql,
)
from volga_spark.oracle import compare_frames, run_oracle
from volga_spark.tables import load_table

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return load_table(spark, SF, "documents").select("doc_id", "text")


def test_fim_matches_duckdb_twin(spark):
    got = fim_transform(_docs(spark)).toPandas()
    want = run_oracle(fim_oracle_sql("SELECT doc_id, text FROM documents"), SF)
    assert compare_frames(got, want) == []


def test_span_corruption_matches_duckdb_twin(spark):
    got = span_corruption(_docs(spark)).toPandas()
    want = run_oracle(
        span_corruption_oracle_sql("SELECT doc_id, text FROM documents"), SF
    )
    assert compare_frames(got, want) == []


def test_fim_reconstruction(spark):
    """The three FIM segments, reassembled in P-M-S order, equal the
    original document exactly — the transform reorders, never loses."""
    out = fim_transform(_docs(spark)).join(_docs(spark), "doc_id")
    applied = out.filter("fim_applied")
    assert applied.count() > 0
    # token-level comparison (an empty middle leaves a doubled space in the
    # naive string reassembly; tokens are the real unit anyway)
    toks = lambda c: F.filter(F.split(c, " "), lambda t: t != "")  # noqa: E731
    bad = applied.select(
        "doc_id",
        toks(
            F.expr(
                "concat_ws(' ',"
                " split(split(fim_text, '<fim_suffix>')[0], '<fim_prefix>')[1],"
                " split(fim_text, '<fim_middle>')[1],"
                " split(split(fim_text, '<fim_middle>')[0], '<fim_suffix>')[1])"
            )
        ).alias("rebuilt"),
        toks(F.col("text")).alias("orig"),
    ).filter(F.col("rebuilt") != F.col("orig"))
    assert bad.count() == 0
    # short docs pass through verbatim
    short = out.filter(~F.col("fim_applied"))
    assert short.filter(F.col("fim_text") != F.coalesce("text", F.lit(""))).count() == 0


def test_span_corruption_reconstruction(spark):
    """Replacing each sentinel in the input with its target span rebuilds
    the original document — the T5 encoding is lossless."""
    rows = (
        span_corruption(_docs(spark))
        .join(_docs(spark), "doc_id")
        .filter("n_corrupted > 0")
        .select("input_text", "target_text", "text", "n_corrupted")
        .collect()
    )
    assert rows
    for r in rows[:200]:
        inp, tgt = r["input_text"], r["target_text"]
        # parse target: <extra_id_k> span ... closed by final sentinel
        parts = tgt.split("<extra_id_")
        spans = {}
        for p in parts[1:]:
            k, rest = p.split(">", 1)
            spans[int(k)] = rest.strip() if rest else ""
        rebuilt = inp
        for k in range(r["n_corrupted"]):
            rebuilt = rebuilt.replace(f"<extra_id_{k}>", spans[k], 1)
        # collapse doubled spaces from empty corrupted windows
        assert " ".join(rebuilt.split()) == " ".join(r["text"].split())


def test_objectives_deterministic_and_seeded(spark):
    d = _docs(spark)
    a = fim_transform(d).orderBy("doc_id").collect()
    b = fim_transform(d.repartition(13)).orderBy("doc_id").collect()
    assert a == b
    c = fim_transform(d, seed="other").orderBy("doc_id").collect()
    assert any(x["fim_text"] != y["fim_text"] for x, y in zip(a, c))
    sa = span_corruption(d).orderBy("doc_id").collect()
    sb = span_corruption(d.repartition(7)).orderBy("doc_id").collect()
    assert sa == sb


def test_corruption_rate_near_nominal(spark):
    """~1/corrupt_one_in of windows corrupt (md5 uniformity)."""
    agg = span_corruption(_docs(spark), corrupt_one_in=5).agg(
        F.sum("n_corrupted").alias("c"),
        F.sum(F.expr("CAST(ceil(n_tokens / 3.0) AS BIGINT)")).alias("w"),
    ).first()
    rate = agg["c"] / agg["w"]
    assert 0.14 < rate < 0.26, rate


def test_objectives_zero_shuffle_plan(spark):
    """Both transforms are pure per-row rewrites: no exchange, no Python."""
    for df in (fim_transform(_docs(spark)), span_corruption(_docs(spark))):
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:2000]
        assert "EvalPython" not in plan and "InPandas" not in plan


def test_degenerate_params_rejected(spark):
    with pytest.raises(ValueError):
        span_corruption(_docs(spark), span_len=0)
    with pytest.raises(ValueError):
        fim_transform(_docs(spark), min_tokens=1)
    with pytest.raises(ValueError, match="mutually exclusive"):
        fim_transform(_docs(spark), replace_text=True, keep_cols=True)


def test_oracle_builders_escape_token_literals(spark):
    """Sentinel/marker tokens containing a single quote must be escaped
    into the DuckDB twin (same rule as the seed literal) — and the Spark
    side must still agree byte-for-byte."""
    toks = dict(prefix_tok="<p'fx>", suffix_tok="<s'fx>", middle_tok="<m'id>")
    got = fim_transform(_docs(spark), **toks).toPandas()
    want = run_oracle(
        fim_oracle_sql("SELECT doc_id, text FROM documents", **toks), SF
    )
    assert compare_frames(got, want) == []

    got = span_corruption(_docs(spark), sentinel="<x'{}'y>").toPandas()
    want = run_oracle(
        span_corruption_oracle_sql(
            "SELECT doc_id, text FROM documents", sentinel="<x'{}'y>"
        ),
        SF,
    )
    assert compare_frames(got, want) == []


def test_span_corruption_matches_python_reference(spark):
    """Third independent formulation: a direct python re-implementation of
    the T5 encoding over a seeded random corpus (including empty and
    1-token docs) must agree byte-for-byte with the Spark fold."""
    import hashlib
    import random

    rng = random.Random(8)
    vocab = ["aa", "b", "ccc", "dd", "e"]
    rows = [(i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 25))))
            for i in range(60)]
    rows += [(100, ""), (101, "solo")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    L, R, SEED = 3, 5, "volga-t5"

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def ref(doc_id, text):
        ws = (text or "").split(" ")
        wins = [ws[i : i + L] for i in range(0, len(ws), L)]
        k, inp, tgt = 0, [], []
        for w, toks in enumerate(wins):
            wtext = " ".join(toks)
            if h60(f"{SEED}:{doc_id}:{w}") % R == 0:
                s = f"<extra_id_{k}>"
                inp.append(s)
                tgt.extend([s, wtext])
                k += 1
            else:
                inp.append(wtext)
        target = " ".join(tgt + [f"<extra_id_{k}>"]) if k else ""
        return " ".join(inp), target, k, len(ws)

    got = {
        r["doc_id"]: (
            r["input_text"], r["target_text"], r["n_corrupted"], r["n_tokens"]
        )
        for r in span_corruption(df, span_len=L, corrupt_one_in=R).collect()
    }
    for doc_id, text in rows:
        assert got[doc_id] == ref(doc_id, text), doc_id


def test_fim_keep_cols_refuses_collision_and_replace_text_preserves(spark):
    """review-pass r08: keep_cols must never silently overwrite caller
    columns; replace_text rewrites ONLY the text column."""
    df = spark.createDataFrame(
        [(1, "a b c d e f", 42)], "doc_id long, text string, n_tokens long"
    )
    with pytest.raises(ValueError):
        fim_transform(df, keep_cols=True)
    out = fim_transform(df, replace_text=True)
    assert out.columns == ["doc_id", "text", "n_tokens"]
    row = out.first()
    assert row["n_tokens"] == 42  # caller column untouched
    assert "<fim_prefix>" in row["text"]
