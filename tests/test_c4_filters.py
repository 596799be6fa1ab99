"""C4 rule set (Raffel et al. 2020 §2.2): crafted-doc exactness for the
line cleaner + page flags, and a DuckDB mirror for the page flags over the
real corpus."""

from __future__ import annotations

from volga_spark.operators.text import c4_clean_lines, c4_quality_flags
from volga_spark.oracle import run_oracle
from volga_spark.tables import load_table

CRAFTED = [
    (1, 'Good line with five proper words.\nshort line\n'
        'This javascript line has enough words here.\n'
        'Another keeper sentence with many words inside it!'),
    (2, "function() { return 1; }"),
    (3, "Lorem Ipsum dolor sit amet. More words here now. And a third one."),
    (4, "Please read our Privacy Policy. It matters a lot. Really it does."),
    (5, "One real sentence here. Two real sentences now. Three full stops."),
]


def test_c4_clean_lines_crafted(spark):
    df = spark.createDataFrame(CRAFTED, "doc_id int, text string")
    rows = {
        r["doc_id"]: r["cleaned"]
        for r in df.select("doc_id", c4_clean_lines("text").alias("cleaned")).collect()
    }
    # doc 1: drops the <5-word line and the javascript line
    assert rows[1] == (
        "Good line with five proper words.\n"
        "Another keeper sentence with many words inside it!"
    )
    # doc 2: nothing survives (no terminal punctuation at line end... the
    # brace line ends in '}' )
    assert rows[2] == ""


def test_c4_quality_flags_crafted(spark):
    df = spark.createDataFrame(CRAFTED, "doc_id int, text string")
    flags = c4_quality_flags("text")
    rows = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id", *[c.alias(k) for k, c in flags.items()]
        ).collect()
    }
    assert not rows[2]["c4_no_braces_ok"]
    assert not rows[3]["c4_no_placeholder_ok"]  # case-insensitive
    assert not rows[4]["c4_no_policy_ok"]
    assert rows[5]["c4_pass"]
    assert not rows[2]["c4_pass"]


def test_c4_page_flags_match_duckdb(spark, sf_dir):
    got = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            *[c.alias(k) for k, c in c4_quality_flags("text").items()],
        )
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    oracle = run_oracle(
        """
        SELECT doc_id,
               NOT contains(text, '{') AS c4_no_braces_ok,
               NOT contains(lower(text), 'lorem ipsum') AS c4_no_placeholder_ok,
               NOT (contains(lower(text), 'terms of use')
                    OR contains(lower(text), 'privacy policy')
                    OR contains(lower(text), 'cookie policy')
                    OR contains(lower(text), 'uses cookies')) AS c4_no_policy_ok,
               len(regexp_extract_all(text, '[.!?]')) >= 3 AS c4_min_sentences_ok
        FROM documents
        """,
        sf_dir,
    ).sort_values("doc_id").reset_index(drop=True)
    for col in (
        "c4_no_braces_ok",
        "c4_no_placeholder_ok",
        "c4_no_policy_ok",
        "c4_min_sentences_ok",
    ):
        assert (got[col] == oracle[col]).all(), col
