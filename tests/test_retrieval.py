"""BM25 retrieval: python-reference parity on a crafted corpus, determinism,
and plan shape (no Python UDFs, broadcast query side)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

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


def test_incremental_index_merge_equals_rebuild(spark):
    """merge_index(index(batch1), index(batch2)) scores identically to
    index(batch1 ∪ batch2) — the standing-index maintenance contract."""
    from volga_spark.operators.retrieval import (
        bm25_index,
        bm25_topk_from_index,
        merge_index,
    )

    all_docs = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    b1 = all_docs.filter("doc_id <= 3")
    b2 = all_docs.filter("doc_id > 3")
    qs = spark.createDataFrame(QUERIES, "query_id int, qtext string")

    merged = merge_index(bm25_index(b1), bm25_index(b2))
    got = sorted(map(tuple, bm25_topk_from_index(merged, qs, k=10).collect()))
    want = sorted(map(tuple, bm25_topk_from_index(bm25_index(all_docs), qs, k=10).collect()))
    assert got == want and len(got) > 0


def test_rrf_fusion_exact_and_oracled(spark, sf_dir):
    """RRF fusion: pure-integer scores match DuckDB bit-for-bit, and the
    hybrid composition (BM25 ∪ crafted dense ranking) behaves sanely."""
    import duckdb

    from volga_spark.operators.retrieval import (
        RRF_SCALE,
        rrf_fuse,
        rrf_fuse_oracle_sql,
    )

    # two crafted rankings with partial overlap
    r1 = [(1, 1, 10), (1, 2, 20), (1, 3, 30), (2, 1, 40)]
    r2 = [(1, 1, 20), (1, 2, 99), (2, 1, 40), (2, 2, 41)]
    schema = "query_id int, rank int, doc_id bigint"
    d1 = spark.createDataFrame(r1, schema)
    d2 = spark.createDataFrame(r2, schema)
    got = sorted(map(tuple, rrf_fuse([d1, d2], k=10).collect()))

    def vals(rows):
        return ", ".join(f"({q}, {r}, {d})" for q, r, d in rows)

    sql = rrf_fuse_oracle_sql(
        [
            f"SELECT * FROM (VALUES {vals(r1)}) AS t(query_id, rank, doc_id)",
            f"SELECT * FROM (VALUES {vals(r2)}) AS t(query_id, rank, doc_id)",
        ],
        k=10,
    )
    want = sorted(map(tuple, duckdb.sql(sql).fetchall()))
    assert got == want

    # doc 20 appears in both lists (ranks 2, 1) — it must outrank docs
    # appearing once; and its score is the exact integer formula
    q1 = {d: (s, n) for _, rk, d, s, n in got if _ == 1}
    assert q1[20][1] == 2 and q1[30][1] == 1
    assert q1[20][0] == RRF_SCALE // 62 + RRF_SCALE // 61


def test_hybrid_bm25_plus_ann_rankings_fuse(spark, sf_dir):
    """End-to-end hybrid: BM25 over documents fused with a dense ranking
    (brute-force cosine over embeddings, ids aligned with doc_ids)."""
    from volga_spark.operators.retrieval import bm25_topk, rrf_fuse
    from volga_spark.operators.similarity import brute_force_topk
    from volga_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    qs = spark.createDataFrame(
        [(0, "spark window agg"), (1, "hash join merge")],
        "query_id int, qtext string",
    )
    sparse = bm25_topk(docs, qs, k=5)
    dense = (
        brute_force_topk(emb, emb.filter("vec_id < 2"), k=5)
        .select(
            F.col("query_id").cast("int").alias("query_id"),
            "rank",
            F.col("neighbor_id").alias("doc_id"),
        )
    )
    fused = rrf_fuse([sparse, dense], k=8).collect()
    assert len(fused) > 0
    for r in fused:
        assert r["n_lists"] in (1, 2)
    # determinism under repartition
    fused2 = rrf_fuse([sparse.repartition(5), dense.repartition(3)], k=8).collect()
    assert sorted(map(tuple, fused)) == sorted(map(tuple, fused2))


def test_remove_from_index_equals_rebuild_and_stays_broadcast(spark):
    """remove_from_index(index(all), tombstones) scores identically to
    index(all − tombstones) — delete propagation into the standing index
    (the forget-tier cascade) — and the scrub plan never shuffles the
    postings (broadcast anti-join only)."""
    from volga_spark.operators.retrieval import (
        bm25_index,
        bm25_topk_from_index,
        remove_from_index,
    )

    all_docs = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    tomb = spark.createDataFrame([(2,), (5,)], "doc_id bigint")
    qs = spark.createDataFrame(QUERIES, "query_id int, qtext string")

    scrubbed = remove_from_index(bm25_index(all_docs), tomb)
    got = sorted(map(tuple, bm25_topk_from_index(scrubbed, qs, k=10).collect()))
    survivors = all_docs.filter(~F.col("doc_id").isin(2, 5))
    want = sorted(
        map(tuple, bm25_topk_from_index(bm25_index(survivors), qs, k=10).collect())
    )
    assert got == want and len(got) > 0
    # removed docs are really gone from every result
    assert not [r for r in got if r[2] in (2, 5)]
    # stats subtracted exactly
    p, d, s = scrubbed
    srow = s.collect()[0]
    wrow = bm25_index(survivors)[2].collect()[0]
    assert (srow["n_docs"], srow["sum_dl"]) == (wrow["n_docs"], wrow["sum_dl"])
    # plan: the postings scrub is a broadcast anti-join, no shuffle of the
    # big side
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        p.explain("formatted")
    plan = buf.getvalue()
    assert "SortMergeJoin" not in plan, plan[:2000]
