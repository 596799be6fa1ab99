"""Persistent IVF vector index — train once, probe many times with
partition-pruned scans.

`operators/similarity.ivf_topk` trains + assigns per call, which is right
for one-shot jobs; a retrieval service over a fixed corpus should pay the
quantizer training and the corpus assignment ONCE. The on-disk layout is
the classic inverted file made lakehouse-native:

  <path>/centroids.parquet        (list_id, centroid array<double>) — tiny
  <path>/postings/list_id=<i>/    (vec_id, embedding) — hive-partitioned

Hive-partitioning the postings by list_id turns list probing into
PARTITION PRUNING: a query batch that probes lists {3, 17, 40} scans only
those directories (`PartitionFilters` in the plan, asserted in tests) —
scan volume ≈ corpus × n_probe / n_lists with no index-free fallback
path, the faiss IVF contract expressed as file layout.

Build: the deterministic sample-trained spherical k-means quantizer and
the one-Arrow-pass assignment from `operators/similarity` (same
functions, same determinism guarantees). Query: query vectors assign to
their n_probe nearest centroids in the driver (queries are the bounded
side — same closure-ship discipline as `brute_force_topk`), the probed
list ids become a partition filter, and scoring joins candidates to the
pruned postings only.

Reference: the reference has no vector index (windows/aggs engine); this
extends the training-data tier's ANN story from one-shot to standing-
service shape, matching the standing BM25 index (`operators/retrieval`).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from volga_spark.operators.similarity import cosine, spherical_kmeans
from volga_spark.partitioning import widen_for_python


class IvfIndex:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        centroids: np.ndarray,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ):
        self.spark = spark
        self.path = path
        self.centroids = centroids  # (n_lists, dim), L2-normalized
        self.id_col = id_col
        self.vec_col = vec_col

    # -- build / load ------------------------------------------------------

    @classmethod
    def build(
        cls,
        corpus: DataFrame,
        path: str,
        n_lists: int = 32,
        train_sample: int = 4096,
        seed: int = 7,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> "IvfIndex":
        """Train the quantizer on a bounded deterministic sample, assign
        the corpus in one Arrow pass, write centroids + hive-partitioned
        postings. One corpus read + one write.

        Ids must be integral (the assignment pass and topk declare bigint
        ids) — fail fast here rather than letting Arrow die mid-build or
        topk truncate; map string doc ids through a surrogate (e.g.
        xxhash64) upstream."""
        import pandas as pd

        from pyspark.sql import types as T

        id_type = corpus.schema[id_col].dataType
        if not isinstance(
            id_type, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
        ):
            raise TypeError(
                f"IvfIndex requires an integral {id_col!r} (got "
                f"{id_type.simpleString()}); hash string ids to a bigint "
                "surrogate upstream"
            )

        spark = corpus.sparkSession
        sample_rows = (
            corpus.select(vec_col)
            .orderBy(F.xxhash64(F.col(id_col)))
            .limit(train_sample)
            .collect()
        )
        n_lists = max(1, min(n_lists, len(sample_rows) // 8))
        cents = spherical_kmeans(
            np.array([r[0] for r in sample_rows], dtype=np.float64),
            n_lists,
            seed=seed,
        )

        def gen(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                x = np.array(list(pdf["__v"]), dtype=np.float64)
                x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
                yield pd.DataFrame(
                    {
                        "__id": pdf["__id"].to_numpy(),
                        "list_id": np.argmax(x @ cents.T, axis=1).astype(
                            np.int32
                        ),
                    }
                )

        narrow = widen_for_python(
            corpus.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"))
        )
        assignment = narrow.mapInPandas(gen, schema="__id bigint, list_id int")
        postings = corpus.join(
            assignment.withColumnRenamed("__id", id_col), id_col
        )
        postings.write.mode("overwrite").partitionBy("list_id").parquet(
            f"{path.rstrip('/')}/postings"
        )
        cdf = spark.createDataFrame(
            [(i, row.tolist()) for i, row in enumerate(cents)],
            "list_id int, centroid array<double>",
        )
        cdf.coalesce(1).write.mode("overwrite").parquet(
            f"{path.rstrip('/')}/centroids.parquet"
        )
        return cls(spark, path, cents, id_col, vec_col)

    @classmethod
    def load(
        cls,
        spark: SparkSession,
        path: str,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> "IvfIndex":
        rows = (
            spark.read.parquet(f"{path.rstrip('/')}/centroids.parquet")
            .orderBy("list_id")
            .collect()
        )
        cents = np.array([r["centroid"] for r in rows], dtype=np.float64)
        return cls(spark, path, cents, id_col, vec_col)

    # -- query -------------------------------------------------------------

    def postings_for(self, list_ids: list[int]) -> DataFrame:
        """Pruned postings scan — only the named list partitions."""
        return self.spark.read.parquet(
            f"{self.path.rstrip('/')}/postings"
        ).filter(F.col("list_id").isin([int(x) for x in list_ids]))

    def topk(
        self,
        queries: DataFrame,
        k: int = 10,
        n_probe: int = 4,
        qid_col: str = "query_id",
        exclude_self: bool = False,
    ) -> DataFrame:
        """Top-k per query over the probed lists only. `queries` carries
        (qid_col, vec_col) and is the bounded side (collected to assign —
        the brute_force_topk closure discipline).

        `exclude_self=True` drops postings whose id equals the query id —
        ONLY meaningful when the queries are corpus rows (the ANN/near-dup
        shape, matching brute_force_topk). Leave it off for serving: query
        ids and doc ids are independent id spaces there, and an id
        collision must not hide a document."""
        n_probe = min(n_probe, len(self.centroids))
        qrows = queries.select(qid_col, self.vec_col).collect()
        if not qrows:
            # empty-query batch: carry the queries' ACTUAL query-id type so
            # empty and non-empty result batches union/compare cleanly.
            qid_type = queries.schema[qid_col].dataType.simpleString()
            return self.spark.createDataFrame(
                [],
                f"{qid_col} {qid_type}, neighbor_id bigint, rank int, score double",
            )
        qx = np.array([r[1] for r in qrows], dtype=np.float64)
        qx /= np.maximum(np.linalg.norm(qx, axis=1, keepdims=True), 1e-12)
        sims = qx @ self.centroids.T
        probe = np.argpartition(-sims, n_probe - 1, axis=1)[:, :n_probe]
        pairs = [
            (int(qrows[i][0]), int(l))
            for i in range(len(qrows))
            for l in probe[i]
        ]
        probe_df = self.spark.createDataFrame(pairs, "qid bigint, list_id int")
        needed = sorted({l for _, l in pairs})

        cand = self.postings_for(needed).join(
            F.broadcast(probe_df), "list_id"
        )
        qv = queries.select(
            F.col(qid_col).alias("qid"), F.col(self.vec_col).alias("__qv")
        )
        scored = cand.join(F.broadcast(qv), "qid")
        if exclude_self:
            scored = scored.filter(F.col("qid") != F.col(self.id_col))
        scored = (
            scored.select(
                # pin the output id type to the queries' own (the probe
                # frame carries bigint internally) — empty and non-empty
                # batches must agree on schema.
                F.col("qid")
                .cast(queries.schema[qid_col].dataType)
                .alias(qid_col),
                F.col(self.id_col).alias("neighbor_id"),
                cosine(F.col(self.vec_col), F.col("__qv")).alias("score"),
            )
        )
        w = Window.partitionBy(qid_col).orderBy(
            F.col("score").desc(), F.col("neighbor_id")
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(qid_col, "neighbor_id", "rank", "score")
        )
