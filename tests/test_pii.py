"""PII detection/redaction parity vs DuckDB, plus a native-plan audit.

The synthetic corpus contains no natural PII, so both engines first inject
deterministic PII spans with IDENTICAL SQL arithmetic (email / IPv4 / SSN /
phone / credit-card seeded from doc_id), then count + redact. The comparison
therefore verifies the redaction expressions themselves (regex dialect
parity, replace-all semantics, chaining order), not the injection.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from volga_spark.operators.pii import (
    PII_PATTERNS,
    pii_counts,
    pii_oracle_exprs,
    pii_total,
    redact_pii,
)
from volga_spark.oracle import compare_frames, run_oracle
from volga_spark.tables import load_table

# Same text construction in both dialects: base text truncated to 40 chars,
# then per-category spans appended for doc_id slices (each category on a
# different modulus so docs carry 0..5 distinct categories).
_SPARK_INJECT = (
    "concat(substring(text, 1, 40),"
    " CASE WHEN doc_id % 2 = 0 THEN concat(' u', CAST(doc_id AS STRING),"
    "   '@example.com') ELSE '' END,"
    " CASE WHEN doc_id % 3 = 0 THEN concat(' 10.', CAST(doc_id % 200 AS STRING),"
    "   '.0.1') ELSE '' END,"
    " CASE WHEN doc_id % 5 = 0 THEN concat(' 123-45-',"
    "   lpad(CAST(doc_id % 10000 AS STRING), 4, '0')) ELSE '' END,"
    " CASE WHEN doc_id % 7 = 0 THEN concat(' 555-010-',"
    "   lpad(CAST(doc_id % 10000 AS STRING), 4, '0')) ELSE '' END,"
    " CASE WHEN doc_id % 11 = 0 THEN concat(' 4000 1234 5678 ',"
    "   lpad(CAST(doc_id % 10000 AS STRING), 4, '0')) ELSE '' END)"
)
_DUCK_INJECT = (
    "concat(substring(text, 1, 40),"
    " CASE WHEN doc_id % 2 = 0 THEN concat(' u', CAST(doc_id AS VARCHAR),"
    "   '@example.com') ELSE '' END,"
    " CASE WHEN doc_id % 3 = 0 THEN concat(' 10.', CAST(doc_id % 200 AS VARCHAR),"
    "   '.0.1') ELSE '' END,"
    " CASE WHEN doc_id % 5 = 0 THEN concat(' 123-45-',"
    "   lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')) ELSE '' END,"
    " CASE WHEN doc_id % 7 = 0 THEN concat(' 555-010-',"
    "   lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')) ELSE '' END,"
    " CASE WHEN doc_id % 11 = 0 THEN concat(' 4000 1234 5678 ',"
    "   lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')) ELSE '' END)"
)


def _spark_result(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    seeded = docs.select("doc_id", F.expr(_SPARK_INJECT).alias("text"))
    counts = pii_counts("text")
    return seeded.select(
        "doc_id",
        *[c.alias(n) for n, c in counts.items()],
        pii_total("text"),
        redact_pii("text").alias("redacted"),
    )


def _oracle_sql() -> str:
    exprs = pii_oracle_exprs("text")
    count_cols = ", ".join(
        f"{sql} AS {name}" for name, sql in exprs.items() if name != "redacted"
    )
    total = " + ".join(n for n in exprs if n != "redacted")
    return f"""
        WITH seeded AS (SELECT doc_id, {_DUCK_INJECT} AS text FROM documents)
        SELECT doc_id, {count_cols}, CAST({total} AS BIGINT) AS pii_total,
               {exprs['redacted']} AS redacted
        FROM seeded
    """


def test_pii_matches_duckdb(spark, sf_dir):
    got = _spark_result(spark, sf_dir).toPandas()
    oracle = run_oracle(_oracle_sql(), sf_dir)
    assert len(got) > 0
    # The injection actually fires: every category appears somewhere.
    for _, _, token in PII_PATTERNS:
        assert got["redacted"].str.contains(token, regex=False).any(), token
    problems = compare_frames(got, oracle)
    assert not problems, "; ".join(problems)


def test_redacted_text_is_clean(spark, sf_dir):
    """Redacting twice is a fixpoint: zero residual matches of any pattern."""
    out = _spark_result(spark, sf_dir)
    residual = out.select(
        *[
            F.regexp_count("redacted", F.lit(pat)).alias(name)
            for name, pat, _ in PII_PATTERNS
        ]
    ).groupBy().sum()
    assert all(v == 0 for v in residual.first())


def test_pii_plan_is_native(spark, sf_dir):
    """No Python stage: the whole op must live inside whole-stage codegen."""
    plan = _spark_result(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan, marker
    # codegen'd stages print as "WholeStageCodegen" (formatted) or "*(n)"
    assert "WholeStageCodegen" in plan or "*(" in plan
