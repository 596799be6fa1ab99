"""Gopher Table A1 repetition rules (Rae et al. 2021): native line/paragraph
duplication expressions + the one-Arrow-pass n-gram character-coverage
metrics, checked three ways — crafted docs with hand-computed fractions, the
top-n-gram legs vs a DuckDB oracle over the real `documents` corpus, and the
duplicated-n-gram span-coverage legs vs an independent brute-force Python
reference (set-of-char-positions, no shared code with the operator)."""

from __future__ import annotations

import pandas as pd
import pytest

from volga_spark.operators.text import (
    GOPHER_REPETITION_THRESHOLDS,
    line_repetition_flags,
    repetition_ngram_metrics,
)
from volga_spark.oracle import run_oracle
from volga_spark.tables import load_table

CRAFTED = [
    # doc 1: 4 non-empty lines, "aa" twice (4 chars dup of 8 total chars);
    # 2 paragraphs, distinct
    (1, "aa\nbb\naa\ncc\n\ndd"),
    # doc 2: one line, no repetition anywhere
    (2, "unique words only here"),
    # doc 3: same paragraph twice -> dup_para_frac 0.5, chars 0.5
    (3, "x y z\n\nx y z"),
]


def _crafted_df(spark):
    return spark.createDataFrame(CRAFTED, "doc_id int, text string")


def test_line_repetition_flags_crafted(spark):
    rows = {
        r["doc_id"]: r
        for r in _crafted_df(spark)
        .select("doc_id", *[c.alias(k) for k, c in line_repetition_flags("text").items()])
        .collect()
    }
    d1 = rows[1]
    # lines: aa bb aa cc dd -> 5 units, 4 distinct; chars 10, distinct 8
    assert d1["dup_line_frac"] == pytest.approx(1 / 5)
    assert d1["dup_line_char_frac"] == pytest.approx(2 / 10)
    assert d1["dup_para_frac"] == 0.0
    d2 = rows[2]
    assert d2["dup_line_frac"] == 0.0 and d2["dup_line_char_frac"] == 0.0
    assert d2["dup_line_frac_ok"] and d2["dup_para_char_frac_ok"]
    d3 = rows[3]
    assert d3["dup_para_frac"] == pytest.approx(1 / 2)
    assert d3["dup_para_char_frac"] == pytest.approx(1 / 2)
    assert not d3["dup_para_frac_ok"]  # 0.5 > 0.30 threshold


def test_top_ngram_metrics_match_duckdb(spark, sf_dir):
    got = (
        repetition_ngram_metrics(
            load_table(spark, sf_dir, "documents"), dup_ns=()
        )
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    frames = []
    for n in (2, 3, 4):
        frames.append(
            run_oracle(
                f"""
                WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS tk
                           FROM documents),
                g AS (SELECT doc_id, length(text) AS L,
                             unnest([array_to_string(tk[i:i+{n - 1}], ' ')
                                     for i in range(1, len(tk) - {n} + 2)]) AS gram
                      FROM t WHERE len(tk) >= {n}),
                c AS (SELECT doc_id, any_value(L) AS L, gram, count(*) AS c
                      FROM g GROUP BY doc_id, gram)
                SELECT doc_id,
                       max(c * length(gram)) / CAST(any_value(L) AS DOUBLE)
                           AS top_{n}gram_char_frac
                FROM c GROUP BY doc_id
                """,
                sf_dir,
            ).set_index("doc_id")
        )
    oracle = pd.concat(frames, axis=1).reset_index().sort_values("doc_id")
    merged = got.merge(oracle, on="doc_id", suffixes=("", "_o"))
    assert len(merged) == len(got)
    for n in (2, 3, 4):
        col = f"top_{n}gram_char_frac"
        diff = (merged[col] - merged[f"{col}_o"].fillna(0.0)).abs().max()
        assert diff == 0.0, f"{col}: max diff {diff}"


def _brute_dup_char_frac(text: str, n: int) -> float:
    toks = [t for t in text.split(" ") if t]
    if len(toks) < n:
        return 0.0
    norm = " ".join(toks)
    starts = []
    pos = 0
    for t in toks:
        starts.append(pos)
        pos += len(t) + 1
    grams = [tuple(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    from collections import Counter

    c = Counter(grams)
    covered: set[int] = set()
    for i, g in enumerate(grams):
        if c[g] > 1:
            end = starts[i + n - 1] + len(toks[i + n - 1])
            covered.update(range(starts[i], end))
    return len(covered) / len(norm)


def test_dup_ngram_span_coverage_matches_reference(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(40)
    got = (
        repetition_ngram_metrics(docs, top_ns=(), dup_ns=(5, 7))
        .toPandas()
        .set_index("doc_id")
    )
    pdf = docs.select("doc_id", "text").toPandas()
    for _, row in pdf.iterrows():
        for n in (5, 7):
            expect = _brute_dup_char_frac(row["text"], n)
            assert got.loc[row["doc_id"], f"dup_{n}gram_char_frac"] == pytest.approx(
                expect, abs=1e-12
            ), f"doc {row['doc_id']} n={n}"


def test_repetition_pass_combined(spark):
    df = _crafted_df(spark)
    m = repetition_ngram_metrics(df, top_ns=(2,), dup_ns=(5,)).toPandas()
    assert set(m.columns) == {"doc_id", "top_2gram_char_frac", "dup_5gram_char_frac"}
    # doc 3 "x y z\n\nx y z" tokenized on single spaces: the newline chunk is
    # one token; every 2-gram is unique except none repeat -> frac < 1
    assert (m["top_2gram_char_frac"] <= 1.0).all()
    assert set(GOPHER_REPETITION_THRESHOLDS) >= {
        "dup_line_frac",
        "top_2gram_char_frac",
        "dup_10gram_char_frac",
    }
