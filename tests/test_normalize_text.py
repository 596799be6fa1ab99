"""normalize_text: table alignment invariants, crafted-string exactness,
DuckDB parity over the documents table, and the CurationSpec stage."""

from __future__ import annotations

import duckdb
import unicodedata

from pyspark.sql import functions as F

from volga_spark.operators.text import (
    _ACCENT_DST,
    _ACCENT_SRC,
    _PUNCT_DST,
    _PUNCT_SRC,
    normalize_text,
    normalize_text_oracle_sql,
)
from volga_spark.tables import load_table


def test_tables_aligned_and_sane():
    assert len(_ACCENT_SRC) == len(_ACCENT_DST)
    assert len(_PUNCT_SRC) == len(_PUNCT_DST)
    for s, d in zip(_ACCENT_SRC, _ACCENT_DST):
        if s in "øØ":  # no NFD decomposition; mapped by policy
            assert d in "oO"
        else:
            assert unicodedata.normalize("NFD", s)[0] == d, (s, d)
        assert d.isascii()
    assert all(d in "'\"- " for d in _PUNCT_DST)


def test_crafted_normalization(spark):
    raw = "“Café” cafès — naïve… résumé\t\ttabs \x07bell\nline 2"
    df = spark.createDataFrame([(raw,)], "text string")
    got = df.select(normalize_text("text").alias("t")).collect()[0]["t"]
    assert got == '"Cafe" cafes - naive... resume tabs bell\nline 2'
    # selective switches
    keep_accents = df.select(
        normalize_text("text", accents=False).alias("t")
    ).collect()[0]["t"]
    assert "Café" in keep_accents and '"' in keep_accents


def test_matches_duckdb(spark, sf_dir):
    # inject typographic noise deterministically, then normalize on both engines
    inject = (
        "concat('“', substring(text, 1, 60), '” — café… end')"
    )
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(inject).alias("text")
    )
    got = docs.select("doc_id", normalize_text("text").alias("norm")).toPandas()
    ora_expr = normalize_text_oracle_sql(inject.replace("concat", "concat", 1))
    con = duckdb.connect()
    try:
        ora = con.execute(
            f"SELECT doc_id, {ora_expr} AS norm FROM "
            f"read_parquet('{sf_dir}/documents.parquet')"
        ).fetchdf()
    finally:
        con.close()
    from volga_spark.oracle import compare_frames

    assert not compare_frames(got, ora)


def test_curation_spec_stage(spark):
    from volga_spark.api.curation import CurationSpec

    df = spark.createDataFrame(
        [(1, "“hello”…  world")], "doc_id bigint, text string"
    )
    out = CurationSpec(stages=[{"op": "normalize_text"}]).build(spark, df)
    assert out.collect()[0]["text"] == '"hello"... world'
