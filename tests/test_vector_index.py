"""Persistent IVF index: build/load round trip, probe == in-memory IVF
behavior (recall vs brute force), partition pruning in the probe plan."""

from __future__ import annotations

from volga_spark.operators.similarity import brute_force_topk
from volga_spark.operators.vector_index import IvfIndex
from volga_spark.tables import load_table


def test_build_load_and_recall(spark, sf_dir, tmp_path):
    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivf")
    built = IvfIndex.build(emb, path, n_lists=16, seed=7)
    loaded = IvfIndex.load(spark, path)
    assert (built.centroids == loaded.centroids).all()

    queries = emb.filter("vec_id < 10").withColumnRenamed("vec_id", "query_id")
    got = loaded.topk(queries, k=5, n_probe=6, exclude_self=True)
    exact = brute_force_topk(emb, emb.filter("vec_id < 10"), k=5)
    g = {(r["query_id"], r["neighbor_id"]) for r in got.collect()}
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    recall = len(g & e) / len(e)
    assert recall >= 0.6, recall  # random near-orthogonal corpus; 6/16 lists

    # determinism: rebuild gives identical centroids and results
    built2 = IvfIndex.build(emb, str(tmp_path / "ivf2"), n_lists=16, seed=7)
    assert (built2.centroids == built.centroids).all()

    # serving mode (default): query ids and doc ids are independent id
    # spaces — an id collision must NOT hide the document. Every query
    # here shares its id with a corpus row; the self row is its own
    # nearest neighbor at cosine 1.0.
    serve = loaded.topk(queries, k=5, n_probe=6)
    by_q = {}
    for r in serve.collect():
        by_q.setdefault(r["query_id"], []).append(
            (r["rank"], r["neighbor_id"], r["score"])
        )
    for qid, rows in by_q.items():
        top = min(rows)
        assert top[1] == qid and top[2] > 0.999, (qid, top)


def test_probe_scan_is_partition_pruned(spark, sf_dir, tmp_path):
    import contextlib
    import io

    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivf_pruned")
    idx = IvfIndex.build(emb, path, n_lists=16, seed=7)

    pruned = idx.postings_for([1, 3])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pruned.explain("formatted")
    p = buf.getvalue()
    assert "PartitionFilters" in p
    assert "list_id" in p.split("PartitionFilters")[1][:200]
    # and the pruned scan returns only those lists
    lists = {r["list_id"] for r in pruned.select("list_id").distinct().collect()}
    assert lists <= {1, 3}
