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


def test_empty_query_batch_schema_matches_nonempty(spark, sf_dir, tmp_path):
    """r07: an empty request batch must return the SAME schema (incl. the
    queries' own query-id type) as a non-empty one, so result batches
    union/compare cleanly in a serving loop."""
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    idx = IvfIndex.build(emb, str(tmp_path / "ivf_empty"), n_lists=4, seed=7)
    # int (not bigint) query ids
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").cast("int").alias("query_id"), "embedding"
    )
    full = idx.topk(queries, k=3, n_probe=2)
    empty = idx.topk(queries.limit(0), k=3, n_probe=2)
    # names + types must agree (nullability flags may differ: the DDL
    # empty schema is all-nullable while row_number output is not)
    assert [(f.name, f.dataType) for f in empty.schema.fields] == [
        (f.name, f.dataType) for f in full.schema.fields
    ]
    assert empty.count() == 0 and full.count() > 0
    # union of serving batches — the failure mode the schema pin prevents
    assert full.unionByName(empty).count() == full.count()
