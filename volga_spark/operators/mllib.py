"""MLlib-backed variants of the dedup / similarity operators.

The hand-rolled operators in ``dedup.py`` / ``similarity.py`` exist for
oracle-exact parity (bit-stable signatures, reference CSV formats). Spark
ships the same algorithms in MLlib — `pyspark.ml.feature.MinHashLSH`
(Jaccard similarity join) and `BucketedRandomProjectionLSH` (Euclidean
LSH) — and on a cluster they are the zero-maintenance choice: JVM-side
hashing, `approxSimilarityJoin` planning, and Estimator/Transformer reuse
across batch and STREAMING DataFrames (a fitted model's ``transform``
applies to a readStream frame unchanged — the Structured Streaming + MLlib
"real-time feature engineering" shape).

These wrappers adapt MLlib's API to the same (id_a, id_b, score) /
(query_id, neighbor_id, rank) surfaces as the hand-rolled paths so tests
can cross-check the two implementations against each other.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def shingle_features(
    df: DataFrame,
    text_col: str,
    out_col: str = "features",
    n: int = 3,
    num_features: int = 1 << 18,
) -> DataFrame:
    """Word n-gram shingles → fixed-width sparse count vector (HashingTF).
    All JVM-side: SQL `transform` builds the shingle list, `NGram`-free (we
    shingle ourselves to match the hand-rolled 3-gram semantics), HashingTF
    hashes each shingle into a 2^18 bucket. Empty docs get a guard shingle
    (MinHashLSH requires ≥1 non-zero entry)."""
    from pyspark.ml.feature import HashingTF

    toks = F.split(F.col(text_col), " ")
    shingled = df.withColumn(
        "__shingles",
        F.when(
            F.size(toks) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
            ),
        ).otherwise(F.array(F.col(text_col))),
    )
    tf = HashingTF(inputCol="__shingles", outputCol=out_col, numFeatures=num_features)
    return tf.transform(shingled).drop("__shingles")


def mllib_minhash_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    jaccard_threshold: float = 0.7,
    num_hash_tables: int = 8,
    n: int = 3,
    seed: int = 7,
) -> DataFrame:
    """Near-dup candidate pairs via MLlib MinHashLSH `approxSimilarityJoin`
    — Spark's built-in equivalent of the hand-rolled MinHash+LSH+verify
    pipeline. Returns (id_a, id_b, jaccard) with id_a < id_b; `jaccard` is
    1 − MLlib's Jaccard *distance* over the hashed-shingle sets (hash-bucket
    collisions make it approximate vs the exact string-shingle Jaccard —
    agreement is asserted statistically in tests, not bit-wise)."""
    from pyspark.ml.feature import MinHashLSH

    feats = shingle_features(df.select(id_col, text_col), text_col, n=n)
    mh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=num_hash_tables, seed=seed
    )
    model = mh.fit(feats)
    joined = model.approxSimilarityJoin(
        feats, feats, 1.0 - jaccard_threshold, distCol="__dist"
    )
    return (
        joined.select(
            F.col(f"datasetA.{id_col}").alias("id_a"),
            F.col(f"datasetB.{id_col}").alias("id_b"),
            (F.lit(1.0) - F.col("__dist")).alias("jaccard"),
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .distinct()
    )


def mllib_brp_ann(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    bucket_length: float = 2.0,
    num_hash_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    seed: int = 7,
) -> DataFrame:
    """Approximate top-k via MLlib BucketedRandomProjectionLSH (Euclidean).
    Vectors are L2-normalized first, so Euclidean distance is a monotone
    transform of cosine (d² = 2 − 2·cos) and the top-k ORDER matches the
    cosine rankings of the hand-rolled paths. Returns
    (query_id, neighbor_id, rank, score=cosine)."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH, Normalizer
    from pyspark.ml.functions import array_to_vector

    def prep(df, ident):
        v = df.select(
            F.col(id_col).alias(ident),
            array_to_vector(F.col(vec_col).cast("array<double>")).alias("__raw"),
        )
        return (
            Normalizer(inputCol="__raw", outputCol="__vec", p=2.0)
            .transform(v)
            .drop("__raw")
        )

    c = prep(corpus, "cid")
    q = prep(queries, "qid")
    brp = BucketedRandomProjectionLSH(
        inputCol="__vec",
        outputCol="__hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    )
    model = brp.fit(c)
    # 2.0 covers the full normalized-space diameter; the LSH buckets do the
    # pruning, the threshold only caps the join output
    joined = model.approxSimilarityJoin(q, c, 2.0, distCol="__d")
    scored = joined.select(
        F.col("datasetA.qid").alias(qid_col),
        F.col("datasetB.cid").alias("neighbor_id"),
        # d² = 2 − 2cos → cos = 1 − d²/2 (exact on normalized vectors)
        (F.lit(1.0) - F.col("__d") * F.col("__d") / F.lit(2.0)).alias("score"),
    ).filter(F.col(qid_col) != F.col("neighbor_id"))
    w = Window.partitionBy(qid_col).orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qid_col, "neighbor_id", "rank", "score")
    )
