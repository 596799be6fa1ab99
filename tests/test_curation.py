"""Composed curation pipeline: stage interaction semantics.

The oracle-parity test covers value equality; these tests pin the CROSS-STAGE
invariants a hash compare can't localize (who killed a document and why).
"""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def result(spark, sf_dir):
    from volga_spark.workloads import load_all

    df = load_all()["q_training_pipeline"].fn(spark, sf_dir)
    rows = {r["doc_id"]: r.asDict() for r in df.collect()}
    assert rows, "pipeline returned no rows"
    return rows


def test_keep_is_conjunction_of_gates(result):
    for r in result.values():
        assert r["keep"] == (
            r["quality_ok"] and r["is_canonical"] and not r["contaminated"]
        ), r


def test_contamination_gram_count_consistent(result):
    for r in result.values():
        assert r["contaminated"] == (r["n_contaminated_grams"] > 0), r


def test_benchmark_slice_excluded_from_corpus(result):
    assert all(doc_id % 31 != 0 for doc_id in result)


def test_duplicates_keep_exactly_one_canonical(spark, sf_dir):
    """Group by text digest on the raw corpus: every group must have exactly
    one canonical member in the pipeline output."""
    from volga_spark.tables import load_table
    from volga_spark.workloads import load_all

    out = load_all()["q_training_pipeline"].fn(spark, sf_dir)
    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 31 != 0)
        .select("doc_id", F.md5("text").alias("fp"))
    )
    per_group = (
        out.join(d, "doc_id")
        .groupBy("fp")
        .agg(F.sum(F.col("is_canonical").cast("int")).alias("n_canon"))
        .select(F.min("n_canon").alias("lo"), F.max("n_canon").alias("hi"))
        .collect()[0]
    )
    assert per_group["lo"] == 1 and per_group["hi"] == 1

    assert not out.filter(~F.col("is_canonical") & F.col("keep")).count()


def test_gopher_pass_implies_quality_ok(result):
    """gopher_pass is quality_ok AND the English required-words rule — it can
    never be true when the language-agnostic subset fails."""
    for r in result.values():
        if r["gopher_pass"]:
            assert r["quality_ok"], r


def test_sampling_within_keep_and_budget(result):
    """sampled ⊆ keep; rates in [0,1]; realized token budget near the 0.5×
    target (deterministic hash draw → tight at corpus sizes)."""
    kept_tok = sum(r["n_tokens"] for r in result.values() if r["keep"])
    samp_tok = sum(r["n_tokens"] for r in result.values() if r["sampled"])
    for r in result.values():
        if r["sampled"]:
            assert r["keep"], r
        assert 0.0 <= r["mix_rate"] <= 1.0, r
        if not r["keep"]:
            assert not r["sampled"]
    assert kept_tok > 0
    assert 0.35 <= samp_tok / kept_tok <= 0.65, samp_tok / kept_tok


def test_small_sources_upweighted(result):
    """α=0.5 temperature must give token-poor sources a HIGHER sampling rate
    than token-rich ones (the whole point of the rebalance)."""
    tok = {}
    rate = {}
    for r in result.values():
        if r["keep"]:
            tok[r["source"]] = tok.get(r["source"], 0) + r["n_tokens"]
            rate[r["source"]] = r["mix_rate"]
    if len(tok) < 2:
        return
    lo = min(tok, key=tok.get)
    hi = max(tok, key=tok.get)
    if tok[lo] < tok[hi]:
        assert rate[lo] >= rate[hi], (tok[lo], rate[lo], tok[hi], rate[hi])
