"""HTML→text extraction: crafted-document exactness, script/style subtree
removal, entity decoding, DuckDB regex-chain parity, and a native-plan
audit — plus composition with the quality gates downstream."""

from __future__ import annotations

from pyspark.sql import functions as F

from volga_spark.operators.text import html_to_text, token_count
from volga_spark.oracle import run_oracle

HTML = """<html><head><title>T</title>
<style>body { color: red; }</style>
<script>var x = "<p>not text</p>";</script>
</head><body>
<!-- navigation -->
<h1>The Title</h1>
<p>First paragraph with <b>bold</b> &amp; <a href="/x">a link</a>.</p>
<div>Second   block with&nbsp;entities: &lt;tag&gt; &quot;q&quot; &#39;s&#39;</div>
<ul><li>item one</li><li>item two</li></ul>
Trailing text<br>after a break
</body></html>"""

EXPECTED = """T
The Title
First paragraph with bold & a link .
Second block with entities: <tag> "q" 's'
item one
item two
Trailing text
after a break"""


def test_crafted_document_extracts_exactly(spark):
    df = spark.createDataFrame([(1, HTML)], ["doc_id", "html"])
    got = df.select(html_to_text("html").alias("t")).first()["t"]
    assert got == EXPECTED, repr(got)


def test_script_and_style_subtrees_never_leak(spark):
    df = spark.createDataFrame([(1, HTML)], ["doc_id", "html"])
    got = df.select(html_to_text("html").alias("t")).first()["t"]
    for leak in ("var x", "color: red", "not text", "navigation"):
        assert leak not in got, leak


def test_matches_duckdb_regex_chain(spark):
    """The same ordered regex chain in DuckDB produces the same text —
    the extraction is engine-portable (regexes kept in the RE2∩Java
    subset, the pii.py discipline)."""
    docs = [(i, f"<p>Doc {i} has <b>bold</b> &amp; stuff</p><script>x{i}</script>") for i in range(20)]
    df = spark.createDataFrame(docs, ["doc_id", "html"])
    got = {r["doc_id"]: r["t"] for r in df.select("doc_id", html_to_text("html").alias("t")).collect()}
    oracle_sql = r"""
        SELECT doc_id,
          array_to_string(list_filter(list_transform(string_split(
            regexp_replace(
              replace(replace(replace(replace(replace(replace(
                regexp_replace(
                  regexp_replace(
                    regexp_replace(
                      regexp_replace(
                        regexp_replace(
                          regexp_replace(html, '(?is)<script\b.*?</script>', ' ', 'g'),
                          '(?is)<style\b.*?</style>', ' ', 'g'),
                        '(?s)<!--.*?-->', ' ', 'g'),
                      '(?i)</(p|div|br|li|ul|ol|h[1-6]|tr|table|blockquote)>', e'\n', 'g'),
                    '(?i)<br\s*/?>', e'\n', 'g'),
                  '(?s)<[^>]+>', ' ', 'g'),
                '&amp;', '&'), '&lt;', '<'), '&gt;', '>'),
                '&quot;', '"'), '&#39;', e'\x27'), '&nbsp;', ' '),
              e'[ \t]+', ' ', 'g'),
            e'\n'), l -> trim(l)), l -> l != ''), e'\n') AS t
        FROM htmldocs
    """
    import duckdb
    import pandas as pd

    con = duckdb.connect()
    con.register("htmldocs", pd.DataFrame(docs, columns=["doc_id", "html"]))
    want = {r[0]: r[1] for r in con.execute(oracle_sql).fetchall()}
    assert got == want


def test_extraction_stays_native_and_feeds_gates(spark):
    df = spark.createDataFrame([(i, HTML) for i in range(50)], ["doc_id", "html"])
    out = df.select(
        "doc_id",
        html_to_text("html").alias("text"),
    ).select("doc_id", token_count("text").alias("n"))
    out.count()
    plan = out._jdf.queryExecution().executedPlan().toString()
    for marker in ("Python", "Pandas", "BatchEval"):
        assert marker not in plan, marker
    assert out.first()["n"] > 10
