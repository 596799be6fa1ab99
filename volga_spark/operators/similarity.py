"""Similarity search over embedding columns (`array<float>`).

- ``cosine(a, b)`` — pure higher-order-function expression (zip_with +
  aggregate in double precision): JVM-side, no UDF.
- ``brute_force_topk`` — the exactness baseline: broadcast the (small) query
  set against the corpus, score map-side, take top-k per query with a
  ranking window. At 100 TB the scoring pass is embarrassingly parallel and
  shuffles only (n_queries × corpus_partitions × k) candidate rows after the
  per-partition pre-prune.
- ``lsh_topk`` — the scale path: random-hyperplane LSH (deterministic seeded
  planes evaluated as expressions), bucket-join on band signatures, score
  only same-bucket candidates. Recall tunable by (planes, bands).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from volga_spark.partitioning import widen_for_python


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    max_broadcast_queries: int = 65536,
) -> DataFrame:
    """Exact cosine top-k per query, scored in ONE Arrow/numpy pass.

    The query set ships to every corpus partition as a normalized float64
    matrix in the task closure (same bounded-collect discipline as
    `ivfpq_topk`'s query list; guarded by `max_broadcast_queries` — brute
    force over a huge query set is the wrong tool, use `lsh_topk`/`ivf_topk`).
    Each partition computes a blocked matmul (corpus_batch × queries) and
    keeps a running top-k per query, so the rank-window shuffle carries
    O(partitions × queries × k) rows, never |corpus| × |queries|.

    This replaces the previous HOF-expression scorer: a BroadcastNestedLoop
    join producing |corpus|×|queries| rows, each evaluating an interpreted
    zip_with/aggregate cosine — ~40× more intermediate rows and ~5× the
    wall-clock at sf0.1. Scores are float64 (vectors upcast before the
    matmul); ties break on neighbor id for determinism.
    """
    q_rows = queries.select(
        F.col(id_col).alias(qid_col), F.col(vec_col).alias("__qvec")
    ).collect()
    if len(q_rows) > max_broadcast_queries:
        raise ValueError(
            f"{len(q_rows)} queries exceeds max_broadcast_queries="
            f"{max_broadcast_queries}; brute force is the small-query-set "
            "exactness baseline — use lsh_topk/ivf_topk for query fan-out"
        )
    qids = np.asarray([r[qid_col] for r in q_rows])
    Q = np.asarray([r["__qvec"] for r in q_rows], dtype=np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)

    # an under-split corpus scan would score on one core
    corpus = widen_for_python(corpus.select(id_col, vec_col))
    id_, vec_, qid_, k_ = id_col, vec_col, qid_col, k

    def _score_topk(batches):
        import pandas as pd

        # running per-query top-k across the partition's batches
        best: list = [None] * len(qids)  # (scores desc-ready, ids) per query
        for pdf in batches:
            ids = pdf[id_].to_numpy()
            C = np.asarray(list(pdf[vec_]), dtype=np.float64)
            Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
            S = Cn @ Qn.T  # (n_batch, n_queries)
            for j in range(len(qids)):
                s = S[:, j]
                keep = ids != qids[j]  # self-exclusion
                s_j, id_j = s[keep], ids[keep]
                if best[j] is not None:
                    s_j = np.concatenate([best[j][0], s_j])
                    id_j = np.concatenate([best[j][1], id_j])
                if len(s_j) > k_:
                    # top-k by (score desc, id asc): lexsort on (-score, id)
                    order = np.lexsort((id_j, -s_j))[:k_]
                    s_j, id_j = s_j[order], id_j[order]
                best[j] = (s_j, id_j)
        out_q, out_id, out_s = [], [], []
        for j in range(len(qids)):
            if best[j] is None:
                continue
            out_q.extend([qids[j]] * len(best[j][0]))
            out_id.extend(best[j][1].tolist())
            out_s.extend(best[j][0].tolist())
        if out_q:
            yield pd.DataFrame({qid_: out_q, "neighbor_id": out_id, "score": out_s})

    pruned = corpus.mapInPandas(
        _score_topk,
        schema=f"{qid_col} long, neighbor_id long, score double",
    )
    w = Window.partitionBy(qid_col).orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        pruned.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qid_col, "neighbor_id", "rank", "score")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 7) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_signature(vec_col: Column, planes: np.ndarray) -> Column:
    """Sign-bit signature: array<int> of 0/1 per hyperplane, computed as
    native expressions (one dot product per plane)."""
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(
                    vec_col,
                    F.array(*[F.lit(float(w)) for w in plane]),
                    lambda x, y: x.cast("double") * y,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            >= 0,
            1,
        ).otherwise(0)
        for plane in planes
    ]
    return F.array(*bits)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    n_planes: int = 16,
    bands: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: score only candidates sharing ≥1 LSH band with the
    query. Collision pruning happens in the join, so the scoring volume is
    ~corpus/2^rows_per_band per band instead of the full corpus."""
    planes = _hyperplanes(dim, n_planes)
    width = n_planes // bands

    def banded(df: DataFrame, ident: str) -> DataFrame:
        sig = lsh_signature(F.col(vec_col), planes)
        return df.select(
            F.col(id_col).alias(ident),
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(bands - 1)),
                    lambda i: F.slice(sig, i * width + 1, width),
                )
            ).alias("band", "chunk"),
        )

    # dedup on bare (qid, cid) ids — carrying the vectors through the
    # distinct would make embedding payload the dominant shuffle volume at
    # dim≈1k; vectors are re-joined once per surviving candidate instead.
    qb = banded(queries, "qid")
    cb = banded(corpus, "cid")
    cand = (
        qb.join(cb, ["band", "chunk"])
        .filter(F.col("qid") != F.col("cid"))
        .select("qid", "cid")
        .distinct()
    )
    qv = queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("__vec_qid"))
    cv = corpus.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("__vec_cid"))
    scored = (
        cand.join(F.broadcast(qv), "qid")
        .join(cv, "cid")
        .select(
            F.col("qid").alias(qid_col),
            F.col("cid").alias("neighbor_id"),
            cosine(F.col("__vec_qid"), F.col("__vec_cid")).alias("score"),
        )
    )
    w = Window.partitionBy(qid_col).orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qid_col, "neighbor_id", "rank", "score")
    )


def spherical_kmeans(
    sample: np.ndarray, n_lists: int, iters: int = 15, seed: int = 7
) -> np.ndarray:
    """Deterministic spherical k-means coarse quantizer (the IVF training
    step — same role as faiss's quantizer training, which also trains on a
    bounded sample). Vectors are L2-normalized so nearest-centroid by dot
    product == nearest by cosine; centroids re-normalize every Lloyd round.
    Empty lists re-seed deterministically from the farthest points."""
    rng = np.random.RandomState(seed)
    x = sample.astype(np.float64)
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    n = len(x)
    cents = x[rng.choice(n, size=min(n_lists, n), replace=False)].copy()
    if len(cents) < n_lists:  # degenerate tiny sample: pad with jitter
        pad = cents[rng.randint(0, len(cents), n_lists - len(cents))]
        cents = np.vstack([cents, pad + rng.standard_normal(pad.shape) * 1e-3])
    for _ in range(iters):
        sims = x @ cents.T
        assign = np.argmax(sims, axis=1)
        for c in range(n_lists):
            members = x[assign == c]
            if len(members):
                cents[c] = members.sum(axis=0)
            else:
                cents[c] = x[np.argmin(np.max(sims, axis=1))]
        cents /= np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
    return cents


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    n_lists: int = 32,
    n_probe: int = 4,
    train_sample: int = 4096,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    train: str = "sample",
) -> DataFrame:
    """IVF approximate top-k (the inverted-file scale path, complementing
    ``lsh_topk``): train a coarse quantizer on a bounded deterministic
    sample, assign every corpus vector to its nearest-centroid list (one
    Arrow-batched numpy matmul pass — no per-row python), probe the
    ``n_probe`` closest lists per query, and score only candidates in probed
    lists. Scoring volume ≈ corpus × n_probe / n_lists.

    Training (``train=``):

    - ``"sample"`` (default): O(train_sample × dim) driver-side spherical
      k-means on a bounded deterministic sample — the standard IVF
      discipline (faiss trains its quantizer on a sample too), and
      bit-deterministic across runs/partitionings.
    - ``"distributed"``: MLlib ``KMeans`` (k-means||) over the FULL
      normalized corpus — no driver-side data collect at all (only the
      n_lists × dim centroid matrix comes back, which every variant ships
      in the assignment closure anyway). Use when the corpus distribution
      is too diverse for a fixed sample; deterministic per Spark version
      via ``seed`` but not bit-stable across versions.

    Assignment is one embarrassingly-parallel pass either way; the
    candidate join shuffles (list_id) ints, and list skew is bounded by
    k-means balance — raise n_lists (and n_probe proportionally) as the
    corpus grows."""
    import pandas as pd

    if train == "distributed":
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        n_corpus = corpus.count()
        # same ≥8-points-per-list guard as the sample path
        n_lists = max(1, min(n_lists, n_corpus // 8))
        n_probe = min(n_probe, n_lists)
        nrm = F.sqrt(
            F.aggregate(
                F.col(vec_col), F.lit(0.0), lambda acc, x: acc + x * x
            )
        )
        feats = corpus.select(
            array_to_vector(
                F.transform(
                    F.col(vec_col), lambda x: x / F.greatest(nrm, F.lit(1e-12))
                ).cast("array<double>")
            ).alias("features")
        )
        model = KMeans(k=n_lists, seed=seed, maxIter=15).fit(feats)
        cents = np.array([np.asarray(c) for c in model.clusterCenters()])
        cents /= np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
    elif train == "sample":
        # deterministic pseudo-random sample: order by id hash, take the prefix
        sample_rows = (
            corpus.select(vec_col)
            .orderBy(F.xxhash64(F.col(id_col)))
            .limit(train_sample)
            .collect()
        )
        # the usual IVF training guard: ≥ ~8 training points per list, else the
        # quantizer overfits the sample and lists go near-empty (faiss warns at
        # 39×; small test corpora would otherwise crater recall)
        n_lists = max(1, min(n_lists, len(sample_rows) // 8))
        n_probe = min(n_probe, n_lists)
        cents = spherical_kmeans(
            np.array([r[0] for r in sample_rows], dtype=np.float64), n_lists, seed=seed
        )
    else:
        raise ValueError(f"train must be 'sample' or 'distributed', got {train!r}")

    def assign_gen(n_top):
        def gen(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                x = np.array(list(pdf["__v"]), dtype=np.float64)
                x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
                sims = x @ cents.T
                if n_top == 1:
                    lists = np.argmax(sims, axis=1)[:, None]
                else:
                    lists = np.argpartition(-sims, n_top - 1, axis=1)[:, :n_top]
                ids = np.repeat(pdf["__id"].to_numpy(), n_top)
                yield pd.DataFrame(
                    {"__id": ids, "list_id": lists.reshape(-1).astype(np.int32)}
                )

        return gen

    def assigned(df: DataFrame, n_top: int, ident: str) -> DataFrame:
        n_top = min(n_top, n_lists)
        narrow = widen_for_python(
            df.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"))
        )
        out = narrow.mapInPandas(
            assign_gen(n_top), schema="__id bigint, list_id int"
        )
        return out.select(F.col("__id").alias(ident), "list_id")

    cand = (
        F.broadcast(assigned(queries, n_probe, "qid"))  # n_queries × n_probe rows
        .join(assigned(corpus, 1, "cid"), "list_id")
        .filter(F.col("qid") != F.col("cid"))
        .select("qid", "cid")
        .distinct()
    )
    qv = queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("__vec_qid"))
    cv = corpus.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("__vec_cid"))
    scored = (
        cand.join(F.broadcast(qv), "qid")
        .join(cv, "cid")
        .select(
            F.col("qid").alias(qid_col),
            F.col("cid").alias("neighbor_id"),
            cosine(F.col("__vec_qid"), F.col("__vec_cid")).alias("score"),
        )
    )
    w = Window.partitionBy(qid_col).orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qid_col, "neighbor_id", "rank", "score")
    )


def blocked_neardup_pairs(
    df: DataFrame,
    block_col: str,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-duplicate pairs within blocks (cosine ≥ threshold).
    Blocking bounds the pair count; swap ``block_col`` for an LSH band at
    100 TB (same shuffle shape — one exchange on the block key).

    Scoring is a per-block chunked numpy matmul (`applyInPandas`): one
    normalized matrix per block, scores in row-chunks of ``chunk`` so peak
    memory is O(chunk × block), emit only over-threshold (id_a < id_b)
    pairs. Replaces the block self-join + interpreted HOF cosine, which
    materialized every intra-block pair as a row (quadratic row explosion
    BEFORE the threshold filter — measured 13s vs 1s at sf0.1). The block
    contract (bounded block sizes — labels here, LSH bands at scale) is
    what makes whole-block-in-memory safe.
    """
    chunk = 2048
    gdf = df.select(
        F.col(block_col).alias("__blk"),
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__v"),
    )

    def _emit(pdf):
        import pandas as pd

        ids = pdf["__id"].to_numpy()
        M = np.asarray(list(pdf["__v"]), dtype=np.float64)
        Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
        out_a: list = []
        out_b: list = []
        for s in range(0, len(ids), chunk):
            S = Mn[s : s + chunk] @ Mn.T
            hit_r, hit_c = np.nonzero(S >= threshold)
            ga, gb = ids[hit_r + s], ids[hit_c]
            keep = ga < gb
            out_a.extend(ga[keep].tolist())
            out_b.extend(gb[keep].tolist())
        return pd.DataFrame(
            {
                "id_a": np.asarray(out_a, dtype=np.int64),
                "id_b": np.asarray(out_b, dtype=np.int64),
            }
        )

    return gdf.groupBy("__blk").applyInPandas(_emit, "id_a long, id_b long")


def semdedup(
    df: DataFrame,
    threshold: float = 0.95,
    n_lists: int = 32,
    train_sample: int = 4096,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Semantic deduplication (SemDeDup, Abbas et al. 2023): cluster the
    embedding space with a spherical k-means quantizer, compare pairs only
    WITHIN a cluster (cosine >= threshold => semantic duplicates), resolve
    duplicate groups by connected components, and keep one representative
    per group — the member with the LOWEST cosine to its cluster centroid
    (the paper's keep rule: prefer the least-typical exemplar).

    Returns (id, cluster_id, component, cent_sim, keep) for every row:
    unduplicated rows form singleton components and are kept.

    Scale shape: quantizer training is a bounded driver sample (the same
    faiss/IVF discipline as ``ivf_topk``); assignment is one Arrow/numpy
    pass; the pair scan is intra-cluster only, so worst-case volume is
    sum(cluster_size^2) — bounded by raising n_lists as the corpus grows
    (the paper runs ~50k clusters at billions of embeddings); the group
    resolution is the same shuffle-based large-star/small-star CC used for
    text near-dup clustering.
    """
    import pandas as pd

    from volga_spark.operators.components import connected_components

    sample_rows = (
        df.select(vec_col).orderBy(F.xxhash64(F.col(id_col))).limit(train_sample).collect()
    )
    n_lists = max(1, min(n_lists, len(sample_rows) // 8))
    cents = spherical_kmeans(
        np.array([r[0] for r in sample_rows], dtype=np.float64), n_lists, seed=seed
    )

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array(list(pdf["__v"]), dtype=np.float64)
            x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
            sims = x @ cents.T
            cl = np.argmax(sims, axis=1)
            yield pd.DataFrame(
                {
                    "__id": pdf["__id"].to_numpy(),
                    "cluster_id": cl.astype(np.int32),
                    "cent_sim": sims[np.arange(len(cl)), cl],
                }
            )

    assigned = widen_for_python(
        df.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"))
    ).mapInPandas(gen, schema="__id bigint, cluster_id int, cent_sim double")
    assigned = assigned.localCheckpoint(eager=False)  # feeds pairs AND keep rule

    with_cluster = df.select(F.col(id_col), F.col(vec_col)).join(
        assigned.withColumnRenamed("__id", id_col), id_col
    )
    pairs = blocked_neardup_pairs(
        with_cluster, "cluster_id", threshold, id_col=id_col, vec_col=vec_col
    )
    cc = connected_components(pairs, "id_a", "id_b")

    out = (
        assigned.select(
            F.col("__id").alias(id_col), "cluster_id", "cent_sim"
        )
        .join(cc.withColumnRenamed("node", id_col), id_col, "left")
        .withColumn("component", F.coalesce("component", F.col(id_col)))
    )
    w = Window.partitionBy("component").orderBy("cent_sim", id_col)
    return out.withColumn(
        "keep", F.row_number().over(w) == 1
    ).select(id_col, "cluster_id", "component", "cent_sim", "keep")


def pq_train(
    sample: np.ndarray, m: int = 8, ksub: int = 256, iters: int = 15, seed: int = 7
) -> np.ndarray:
    """Deterministic product-quantizer training (Jégou et al. 2011): split
    the (L2-normalized) vector into ``m`` contiguous sub-vectors and run
    plain Lloyd k-means with ``ksub`` centroids independently per subspace.
    Returns codebooks shaped (m, ksub, dim/m). Like the IVF coarse
    quantizer, training is bounded: O(sample × dim) on the driver — the
    standard faiss discipline."""
    x = sample.astype(np.float64)
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    n, dim = x.shape
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    ksub = max(1, min(ksub, n))
    rng = np.random.RandomState(seed)
    books = np.empty((m, ksub, dsub))
    for j in range(m):
        xs = x[:, j * dsub : (j + 1) * dsub]
        cents = xs[rng.choice(n, size=ksub, replace=False)].copy()
        for _ in range(iters):
            # squared-L2 assignment: argmin ||x-c||² = argmax (x·c - ||c||²/2)
            d = xs @ cents.T - 0.5 * (cents**2).sum(axis=1)
            assign = np.argmax(d, axis=1)
            # vectorized Lloyd update (was a 256-cluster python loop of
            # masked means — ~0.8s of pure driver time per train call):
            # scatter-add member sums, divide by counts; empty cells keep
            # their old centroid (deterministic, same rule as before)
            counts = np.bincount(assign, minlength=ksub)
            sums = np.zeros((ksub, dsub))
            np.add.at(sums, assign, xs)
            nonempty = counts > 0
            cents[nonempty] = sums[nonempty] / counts[nonempty, None]
        books[j] = cents
    return books


def pq_encode(x: np.ndarray, books: np.ndarray) -> np.ndarray:
    """Encode normalized vectors to (n, m) uint8/int32 PQ codes."""
    m, ksub, dsub = books.shape
    codes = np.empty((len(x), m), dtype=np.int32)
    for j in range(m):
        xs = x[:, j * dsub : (j + 1) * dsub]
        d = xs @ books[j].T - 0.5 * (books[j] ** 2).sum(axis=1)
        codes[:, j] = np.argmax(d, axis=1)
    return codes


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    n_lists: int = 32,
    n_probe: int = 4,
    m: int = 8,
    ksub: int = 256,
    refine_factor: int = 8,
    train_sample: int = 4096,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
) -> DataFrame:
    """IVF-PQ approximate top-k — the MEMORY scale path on top of IVF's
    compute scale path. Corpus vectors are stored as ``m``-byte PQ codes
    (a 64-dim float32 vector compresses 32×: 256 B → 8 B), and queries
    score candidates by Asymmetric Distance Computation: per query, one
    (m × ksub) lookup table of sub-inner-products, each candidate scored by
    ``m`` table lookups — no candidate vector is ever decoded or shipped.

    At 100 TB of embeddings this is the difference between "the index fits
    in cluster RAM" and "it does not": the shuffled candidate rows carry
    (list_id int, code binary(m)); raw vectors appear ONLY in the bounded
    driver training sample and the broadcast query set. Training = coarse
    quantizer + per-subspace codebooks on the same bounded sample
    (`pq_train`); encoding is one Arrow-batched numpy pass.

    A REFINE stage (faiss's IndexRefineFlat discipline) recovers the
    ranking accuracy ADC gives up: the ADC shortlist of ``k ×
    refine_factor`` candidates per query is re-scored with exact cosine
    against the true vectors — a targeted fetch of O(queries × k ×
    refine_factor) vectors, never a corpus scan, so the memory story
    stands. Measured on the synthetic embeddings: ADC-only recall@5 ≈ 0.5,
    with refine ≈ 0.95+ (tests/test_similarity.py).
    """
    import pandas as pd

    import volga_spark.operators.similarity as _self
    from volga_spark._pickle import register_by_value

    # pq_encode is referenced from the Arrow-batch closures: serialize the
    # module by value so workers need no volga_spark on their PYTHONPATH
    register_by_value(_self)

    sample_rows = (
        corpus.select(vec_col)
        .orderBy(F.xxhash64(F.col(id_col)))
        .limit(train_sample)
        .collect()
    )
    sample = np.array([r[0] for r in sample_rows], dtype=np.float64)
    n_lists = max(1, min(n_lists, len(sample) // 8))
    n_probe = min(n_probe, n_lists)
    cents = spherical_kmeans(sample, n_lists, seed=seed)
    books = pq_train(sample, m=m, ksub=ksub, seed=seed)

    def encode_gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array(list(pdf["__v"]), dtype=np.float64)
            x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
            lists = np.argmax(x @ cents.T, axis=1).astype(np.int32)
            codes = pq_encode(x, books)
            yield pd.DataFrame(
                {
                    "cid": pdf["__id"].to_numpy(),
                    "list_id": lists,
                    "code": list(codes),
                }
            )

    encoded = widen_for_python(
        corpus.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"))
    ).mapInPandas(encode_gen, schema="cid bigint, list_id int, code array<int>")

    # per-query probe set + the query vectors themselves (queries are the
    # bounded side — broadcast, never shuffled)
    q_rows = queries.select(id_col, vec_col).collect()
    qv = np.array([r[1] for r in q_rows], dtype=np.float64)
    qv /= np.maximum(np.linalg.norm(qv, axis=1, keepdims=True), 1e-12)
    qids = np.array([r[0] for r in q_rows], dtype=np.int64)
    qsims = qv @ cents.T
    probe = np.argpartition(-qsims, min(n_probe, n_lists) - 1, axis=1)[:, :n_probe]
    probe_pdf = pd.DataFrame(
        {
            "qid": np.repeat(qids, n_probe),
            "list_id": probe.reshape(-1).astype(np.int32),
        }
    )
    spark = corpus.sparkSession
    probe_df = F.broadcast(spark.createDataFrame(probe_pdf))

    # ADC lookup tables: one (m, ksub) table per query, broadcast via closure
    mm, ksub_eff, dsub = books.shape
    luts = np.einsum(
        "qmd,mkd->qmk", qv.reshape(len(qv), mm, dsub), books
    )  # (n_queries, m, ksub)
    qid_to_row = {int(q): i for i, q in enumerate(qids)}
    k_ = k

    def adc_gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.array(list(pdf["code"]), dtype=np.int64)  # (n, m)
            qrows = np.array([qid_to_row[int(q)] for q in pdf["qid"]])
            t = luts[qrows]  # (n, m, ksub)
            scores = np.take_along_axis(t, codes[:, :, None], axis=2)[:, :, 0].sum(
                axis=1
            )
            out = pd.DataFrame(
                {"qid": pdf["qid"], "cid": pdf["cid"], "score": scores}
            )
            # per-partition prune to k best per query (exact ADC order kept)
            out = (
                out.sort_values(["score", "cid"], ascending=[False, True])
                .groupby("qid", sort=False)
                .head(k_)
            )
            yield out

    cand = (
        probe_df.join(encoded, "list_id")
        .filter(F.col("qid") != F.col("cid"))
        .select("qid", "cid", "code")
    )
    scored = cand.mapInPandas(adc_gen, schema="qid bigint, cid bigint, score double")
    w_adc = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("cid"))
    shortlist = (
        scored.withColumn("__adc_rank", F.row_number().over(w_adc))
        .filter(F.col("__adc_rank") <= k * refine_factor)
        .select("qid", "cid")
    )
    # refine: exact cosine on the shortlist only — O(queries·k·refine_factor)
    # vector fetches, the corpus codes stay the only full-corpus structure
    qvec = queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("__vq"))
    cvec = corpus.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("__vc"))
    refined = (
        shortlist.join(F.broadcast(qvec), "qid")
        .join(cvec, "cid")
        .select(
            "qid",
            "cid",
            cosine(F.col("__vq"), F.col("__vc")).alias("score"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("cid"))
    return (
        refined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias(qid_col),
            F.col("cid").alias("neighbor_id"),
            "rank",
            "score",
        )
    )
