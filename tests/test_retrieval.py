"""BM25 retrieval: python-reference parity on a crafted corpus, determinism,
and plan shape (no Python UDFs, broadcast query side)."""

from __future__ import annotations

import math

from volga_spark.operators.retrieval import bm25_topk, tokenize

DOCS = [
    (1, "apple banana apple"),
    (2, "banana cherry"),
    (3, "apple apple apple durian"),
    (4, "cherry durian elderberry banana"),
    (5, "fig"),
    (6, "  apple   fig  "),  # messy whitespace
]
QUERIES = [(1, "apple fig"), (2, "banana"), (3, "durian elderberry")]


def _py_bm25(docs, queries, k1=1.2, b=0.75):
    """Independent reference implementation (micro-unit quantization
    matching the operator's engine-parity contract)."""
    toks = {d: t.split() for d, t in docs}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    df = {}
    for terms in toks.values():
        for t in set(terms):
            df[t] = df.get(t, 0) + 1
    out = {}
    for qid, qtext in queries:
        scores = {}
        for t in set(qtext.split()):
            if t not in df:
                continue
            idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            for d, terms in toks.items():
                tf = terms.count(t)
                if tf == 0:
                    continue
                tfn = tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(terms) / avgdl))
                scores.setdefault(d, 0)
                scores[d] += math.floor(idf * tfn * 1_000_000)
        out[qid] = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return out


def test_bm25_matches_python_reference(spark):
    docs = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    qs = spark.createDataFrame(QUERIES, "query_id int, qtext string")
    got = bm25_topk(docs, qs, k=10).collect()
    ref = _py_bm25(DOCS, QUERIES)
    by_q = {}
    for r in sorted(got, key=lambda r: (r["query_id"], r["rank"])):
        by_q.setdefault(r["query_id"], []).append((r["doc_id"], r["score_micro"]))
    assert by_q == {q: v for q, v in ref.items() if v}


def test_bm25_rank_is_dense_and_deterministic(spark):
    docs = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    qs = spark.createDataFrame(QUERIES, "query_id int, qtext string")
    a = sorted(map(tuple, bm25_topk(docs, qs, k=3).collect()))
    b = sorted(map(tuple, bm25_topk(docs.repartition(7), qs, k=3).collect()))
    assert a == b  # partitioning-independent
    ranks = {}
    for qid, rank, *_ in a:
        ranks.setdefault(qid, []).append(rank)
    for qid, rs in ranks.items():
        assert sorted(rs) == list(range(1, len(rs) + 1)), qid


def test_tokenize_drops_empties(spark):
    docs = spark.createDataFrame([(1, "  a  b "), (2, "   ")], "doc_id bigint, text string")
    toks = tokenize(docs).collect()
    assert sorted((r["doc_id"], r["term"]) for r in toks) == [(1, "a"), (1, "b")]


def test_bm25_plan_no_python_and_broadcast_queries(spark):
    """Hot path stays JVM-side; the query side joins by broadcast."""
    docs = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    qs = spark.createDataFrame(QUERIES, "query_id int, qtext string")
    out = bm25_topk(docs, qs, k=5)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
