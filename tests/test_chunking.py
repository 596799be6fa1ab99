"""Document chunking + sequence packing: DuckDB-oracle equality for the
native chunker, structural invariants for both, and a Python-reference
check for the greedy packer."""

from __future__ import annotations

import pytest

from volga_spark.operators.chunking import (
    chunk_documents,
    chunk_oracle_sql,
    pack_sequences,
)
from volga_spark.oracle import compare_frames, run_oracle
from volga_spark.tables import load_table


def test_chunk_documents_matches_duckdb(spark, sf_dir):
    got = chunk_documents(
        load_table(spark, sf_dir, "documents"), chunk_tokens=64, overlap=16
    ).toPandas()
    oracle = run_oracle(chunk_oracle_sql(chunk_tokens=64, overlap=16), sf_dir)
    problems = compare_frames(got, oracle)
    assert not problems, "; ".join(problems)
    assert len(got) > 0


def test_chunk_documents_invariants(spark, sf_dir):
    chunk_tokens, overlap = 32, 8
    docs = load_table(spark, sf_dir, "documents").limit(25)
    got = chunk_documents(docs, chunk_tokens=chunk_tokens, overlap=overlap).toPandas()
    texts = {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()}
    stride = chunk_tokens - overlap
    for doc_id, g in got.groupby("doc_id"):
        toks = texts[doc_id].split(" ")
        g = g.sort_values("chunk_id")
        # starts step by stride; sizes capped; short tail only at the end
        assert list(g["tok_start"]) == [i * stride for i in range(len(g))]
        assert (g["chunk_n_tokens"] <= chunk_tokens).all()
        assert (g["chunk_n_tokens"].iloc[:-1] == chunk_tokens).all() or len(g) == 1
        # every chunk is the exact token slice of the source
        for _, row in g.iterrows():
            s = int(row["tok_start"])
            expect = " ".join(toks[s : s + chunk_tokens])
            assert row["chunk_text"] == expect
        # full coverage: last chunk reaches the final token
        last = g.iloc[-1]
        assert int(last["tok_start"]) + int(last["chunk_n_tokens"]) == len(toks)
        # no redundant tail: a second-to-last chunk never already covers it
        if len(g) > 1:
            assert int(last["tok_start"]) + overlap < len(toks)


def test_chunk_documents_rejects_bad_overlap(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(docs, chunk_tokens=16, overlap=16)


def _py_pack(tokens: list[int], budget: int) -> list[int]:
    bins, cur_bin, cur = [], 0, 0
    for t in tokens:
        if cur > 0 and cur + t > budget:
            cur_bin, cur = cur_bin + 1, 0
        cur += t
        bins.append(cur_bin)
    return bins


def test_pack_sequences_matches_reference_and_invariants(spark, sf_dir):
    from pyspark.sql import functions as F

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "source", F.size(F.split("text", " ")).alias("n_tokens"))
    )
    budget = 256
    packed = pack_sequences(
        docs, budget=budget, n_shards=4
    ).toPandas()
    assert len(packed) == docs.count()
    for (_, _), g in packed.groupby(["source", "shard"]):
        g = g.sort_values("doc_id")
        expect = _py_pack(list(g["n_tokens"]), budget)
        assert list(g["bin_id"]) == expect
        # bin totals: within budget unless the bin is a single oversized doc
        sums = g.groupby("bin_id")["n_tokens"].sum()
        counts = g.groupby("bin_id")["doc_id"].count()
        over = sums[sums > budget]
        assert (counts[over.index] == 1).all()
        # bin_tokens is the running total, ending at the bin sum
        assert (
            g.groupby("bin_id")["bin_tokens"].max() == sums
        ).all()


def test_chunk_documents_plan_stays_native(spark, sf_dir):
    """The chunker must be pure JVM: explode of a per-row sequence, no
    Python stage anywhere in the plan."""
    import contextlib
    import io

    df = chunk_documents(load_table(spark, sf_dir, "documents"))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    assert "Generate" in p  # posexplode
    for marker in ("MapInPandas", "ArrowEvalPython", "BatchEvalPython"):
        assert marker not in p, marker
