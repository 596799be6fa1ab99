"""Length-bucketed batching: DuckDB twin, batch-shape invariants,
padding-efficiency beats random batching, determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from volga_spark.operators.batching import (
    length_bucketed_batches,
    length_bucketed_batches_oracle_sql,
    padding_efficiency,
)
from volga_spark.oracle import compare_frames, run_oracle
from volga_spark.tables import load_table


def test_matches_duckdb_twin(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    got = length_bucketed_batches(docs, 8).toPandas()
    want = run_oracle(
        length_bucketed_batches_oracle_sql("SELECT doc_id, text FROM documents", 8),
        sf_dir,
    )
    assert compare_frames(got, want) == []


def test_batch_shape_invariants(spark, sf_dir):
    """Within every bucket: batch ids contiguous from 0, every batch full
    except the last, positions 0..size-1, and lengths within a 2x band."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    rows = length_bucketed_batches(docs, 8).collect()
    by_bucket: dict = {}
    for r in rows:
        by_bucket.setdefault(r["bucket"], []).append(r)
    assert len(by_bucket) > 1
    for bucket, rs in by_bucket.items():
        lens = [r["n_tokens"] for r in rs]
        assert max(lens) < 2 * min(lens) + 2  # log2 band
        batches: dict = {}
        for r in rs:
            batches.setdefault(r["batch_id"], []).append(r["pos_in_batch"])
        assert sorted(batches) == list(range(len(batches)))
        last = max(batches)
        for bid, poss in batches.items():
            assert sorted(poss) == list(range(len(poss)))
            if bid != last:
                assert len(poss) == 8


def test_beats_random_batching_on_padding(spark, sf_dir):
    """The observable the operator exists for: padding efficiency is
    strictly better than batches drawn in md5-random order."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    bucketed = length_bucketed_batches(docs, 8)
    eff = padding_efficiency(bucketed).first()["efficiency"]

    # random baseline: same rank order, NO length bucketing
    from pyspark.sql import Window

    from volga_spark.functions.tokenize import n_tokens
    from volga_spark.operators.sampling import _rank

    d = (
        docs.withColumn("n_tokens", n_tokens("text"))
        .filter("n_tokens > 0")
        .withColumn("__rank", _rank("doc_id", "volga-batch"))
        .withColumn("bucket", F.lit(0))
    )
    idx = (
        F.row_number().over(Window.partitionBy("bucket").orderBy("__rank", "doc_id"))
        - 1
    )
    rand = d.select(
        "n_tokens",
        "bucket",
        F.floor(idx / F.lit(8)).cast("int").alias("batch_id"),
    )
    base = padding_efficiency(rand).first()["efficiency"]
    assert eff > base, (eff, base)
    assert eff > 0.8  # within-band padding waste is bounded by the 2x rule


def test_deterministic_and_guards(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    a = sorted(map(tuple, length_bucketed_batches(docs, 8).collect()))
    b = sorted(
        map(tuple, length_bucketed_batches(docs.repartition(13), 8).collect())
    )
    assert a == b
    with pytest.raises(ValueError):
        length_bucketed_batches(docs, 0)


def test_precomputed_length_col(spark):
    df = spark.createDataFrame(
        [(1, "ignored", 5), (2, "ignored", 1000), (3, "ignored", 0)],
        "doc_id long, text string, bpe_len long",
    )
    out = length_bucketed_batches(df, 2, length_col="bpe_len").collect()
    got = {r["doc_id"]: (r["n_tokens"], r["bucket"]) for r in out}
    assert got == {1: (5, 2), 2: (1000, 9)}  # zero-length row dropped
