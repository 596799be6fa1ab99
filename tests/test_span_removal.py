"""remove_duplicated_spans: the exact-substring-dedup rewrite step.

Same DuckDB-compare discipline as the driver gate: the whole pipeline
(dense grams → canonical-occurrence pick → span merge → positional cut →
text rebuild) is mirrored in one DuckDB SQL statement over the same parquet
and hash-compared; crafted corpora pin the keep-first semantics.
"""

from __future__ import annotations

import pytest

from volga_spark.operators.dedup import duplicated_ngram_spans, remove_duplicated_spans
from volga_spark.oracle import compare_frames, run_oracle
from volga_spark.tables import load_table

SF = "/root/testdata/sf0.01"


def _oracle(n: int) -> str:
    return f"""
        WITH docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        gp AS (
            SELECT doc_id, w, unnest(generate_series(1, len(w) - {n - 1})) AS pos
            FROM docs WHERE len(w) >= {n}
        ),
        grams AS (
            SELECT doc_id, pos, array_to_string(w[pos:pos+{n - 1}], ' ') AS gram
            FROM gp
        ),
        occ AS (
            SELECT doc_id, pos,
                   row_number() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rk,
                   count(*) OVER (PARTITION BY gram) AS n_occ
            FROM grams
        ),
        cuts AS (SELECT doc_id, pos FROM occ WHERE n_occ > 1 AND rk > 1),
        marked AS (
            SELECT doc_id, pos,
                   CASE WHEN lag(pos) OVER w IS NULL
                             OR pos > lag(pos) OVER w + {n}
                        THEN 1 ELSE 0 END AS new_span
            FROM cuts WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
        ),
        sess AS (
            SELECT doc_id, pos,
                   sum(new_span) OVER (PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span_id
            FROM marked
        ),
        spans AS (
            SELECT doc_id, span_id, min(pos) AS s, max(pos) + {n - 1} AS e
            FROM sess GROUP BY 1, 2
        ),
        cutpos AS (
            SELECT doc_id, unnest(generate_series(s, e)) AS pos FROM spans
        ),
        allpos AS (
            SELECT doc_id, w, unnest(generate_series(1, len(w))) AS pos FROM docs
        ),
        kept AS (
            SELECT a.doc_id, a.pos, a.w[a.pos] AS tok
            FROM allpos a LEFT JOIN cutpos c USING (doc_id, pos)
            WHERE c.pos IS NULL
        ),
        agg AS (
            SELECT doc_id,
                   coalesce(string_agg(tok, ' ' ORDER BY pos), '') AS clean_text,
                   count(*) AS n_kept
            FROM kept GROUP BY doc_id
        )
        SELECT d.doc_id,
               coalesce(a.clean_text, '') AS clean_text,
               CAST(len(d.w) - coalesce(a.n_kept, 0) AS BIGINT) AS removed_tokens
        FROM docs d LEFT JOIN agg a USING (doc_id)
    """


def test_matches_duckdb_oracle_on_documents(spark):
    docs = load_table(spark, SF, "documents")
    got = remove_duplicated_spans(docs, "text", "doc_id", n=8).toPandas()
    want = run_oracle(_oracle(8), SF)
    assert compare_frames(got, want) == []
    assert (got["removed_tokens"] > 0).any()  # the corpus genuinely has dups


def test_keep_first_occurrence_semantics(spark):
    dup = "p q r s t u v w x y"  # 10 tokens, one duplicated 8-gram span
    rows = [
        (1, f"a1 b1 c1 {dup} d1 e1"),
        (2, f"a2 {dup} b2 c2 d2 e2"),
        (3, "f g h i j k l m n o"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in remove_duplicated_spans(df, "text", "doc_id", n=8).collect()
    }
    # doc 1 is canonical (smallest (id, pos) for every shared gram): untouched
    assert out[1]["clean_text"] == rows[0][1] and out[1]["removed_tokens"] == 0
    # doc 2 loses exactly the shared 10-token phrase
    assert out[2]["clean_text"] == "a2 b2 c2 d2 e2"
    assert out[2]["removed_tokens"] == 10
    # doc 3 has no duplicated grams: pass-through
    assert out[3]["clean_text"] == rows[2][1] and out[3]["removed_tokens"] == 0


def test_within_document_repeat_keeps_one_copy(spark):
    phrase = "a b c d e f g h"
    df = spark.createDataFrame(
        [(7, f"{phrase} z1 z2 {phrase}")], "doc_id long, text string"
    )
    (row,) = remove_duplicated_spans(df, "text", "doc_id", n=8).collect()
    assert row["clean_text"] == f"{phrase} z1 z2"
    assert row["removed_tokens"] == 8


def test_removed_tokens_consistent_with_span_report(spark):
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    removed = remove_duplicated_spans(docs, "text", "doc_id", n=8)
    report = duplicated_ngram_spans(docs, "text", "doc_id", n=8)
    r = {x["doc_id"]: x["removed_tokens"] for x in removed.collect()}
    d = {x["doc_id"]: x["dup_tokens"] for x in report.collect()}
    # the rewrite never cuts more than the full duplicated-span report, and
    # cuts nothing in docs the report doesn't mention
    for doc_id, cut in r.items():
        assert cut <= d.get(doc_id, 0)
