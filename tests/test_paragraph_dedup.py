"""Cross-document paragraph dedup (CCNet §3.1): DuckDB oracle parity on a
crafted corpus, keep-first semantics, normalization, and vanishing docs."""

from __future__ import annotations

import duckdb
import pandas as pd

from volga_spark.operators.dedup import paragraph_dedup, paragraph_dedup_oracle_sql
from volga_spark.oracle import compare_frames

DOCS = [
    (1, "alpha beta\n\nshared paragraph one\n\ngamma"),
    (2, "shared paragraph one\n\ndelta epsilon"),  # dup of doc1's middle
    (3, "SHARED paragraph 111 one\n\nzeta"),  # dup after normalization
    (4, "shared paragraph one"),  # doc vanishes entirely
    (5, "  \n\neta theta\n\n"),  # short/empty fragments kept as-is
    (6, "eta theta"),  # dup of doc5's middle
]


def _spark_df(spark):
    return spark.createDataFrame(DOCS, "doc_id bigint, text string")


def _oracle(sql_tail: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        con.register("docs_v", pd.DataFrame(DOCS, columns=["doc_id", "text"]))
        return con.execute(sql_tail).fetchdf()
    finally:
        con.close()


def test_matches_duckdb_oracle(spark):
    got = paragraph_dedup(_spark_df(spark), normalize=True, min_chars=3)
    sql = paragraph_dedup_oracle_sql("docs_v", normalize=True, min_chars=3)
    assert not compare_frames(got.toPandas(), _oracle(sql))


def test_keep_first_and_normalized_dup_removed(spark):
    out = {
        r["doc_id"]: r["text"]
        for r in paragraph_dedup(_spark_df(spark), min_chars=3).collect()
    }
    assert out[1] == "alpha beta\n\nshared paragraph one\n\ngamma"  # first wins
    assert out[2] == "delta epsilon"  # exact dup dropped
    assert out[3] == "zeta"  # case+digit-normalized dup dropped
    assert 4 not in out  # every paragraph was a dup → doc vanishes
    assert out[5] == "  \n\neta theta\n\n"  # short fragments pass through
    assert 6 not in out or "eta theta" not in out.get(6, "")


def test_without_normalization_case_variants_survive(spark):
    out = {
        r["doc_id"]: r["text"]
        for r in paragraph_dedup(
            _spark_df(spark), normalize=False, min_chars=3
        ).collect()
    }
    assert "SHARED paragraph 111 one" in out[3]  # not a dup without normalize


def test_scale_plan_text_never_in_winner_shuffle(spark):
    """The winners aggregation must shuffle digests, not paragraphs: assert
    the agg subtree's exchange schema carries no string paragraph column."""
    df = _spark_df(spark)
    out = paragraph_dedup(df)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    # the digest agg exchange partitions by __digest and its row is
    # (digest, min-struct) — 'para' appears in exchanges only for the
    # semi-join/reassembly stages keyed by (doc_id, pos)/(doc_id)
    import re

    digest_exchanges = [
        ln for ln in final.splitlines() if "hashpartitioning(__digest" in ln
    ]
    assert digest_exchanges, final
    assert all("para" not in ln for ln in digest_exchanges), digest_exchanges
