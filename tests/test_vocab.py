"""Vocabulary training + token-id encoding: DuckDB count/rank parity,
deterministic ids, round-trip decode, and OOV handling."""

from __future__ import annotations

from pyspark.sql import functions as F

from volga_spark.operators.text import build_vocab, encode_tokens
from volga_spark.oracle import compare_frames, run_oracle
from volga_spark.tables import load_table

VOCAB_ORACLE = """
    WITH toks AS (
        SELECT unnest(string_split(text, ' ')) AS token FROM documents
    ),
    counts AS (
        SELECT token, count(*) AS count FROM toks GROUP BY token
        HAVING count(*) >= {min_count}
    )
    SELECT token,
           CAST(row_number() OVER (ORDER BY count DESC, token ASC) - 1
                AS BIGINT) AS token_id,
           count
    FROM counts
"""


def test_vocab_matches_duckdb(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    got = build_vocab(docs, min_count=2).toPandas()
    got["token_id"] = got["token_id"].astype("int64")
    oracle = run_oracle(VOCAB_ORACLE.format(min_count=2), sf_dir)
    assert not compare_frames(got, oracle)


def test_vocab_ids_deterministic_across_partitionings(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = sorted(map(tuple, build_vocab(docs).collect()))
    b = sorted(map(tuple, build_vocab(docs.repartition(13)).collect()))
    assert a == b


def test_encode_round_trips_in_vocab_tokens(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    vocab = build_vocab(docs, min_count=1)  # every token in vocab
    enc = encode_tokens(docs, vocab)
    id2tok = {r["token_id"]: r["token"] for r in vocab.collect()}
    for r in enc.select("text", "token_ids").collect():
        decoded = " ".join(id2tok[i] for i in r["token_ids"])
        assert decoded == r["text"]


def test_oov_tokens_get_unk_id(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    vocab = build_vocab(docs, min_count=1)
    probe = spark.createDataFrame(
        [(1, "zzqxa zzqxb"), (2, "zzqxc")], ["doc_id", "text"]
    )
    enc = {r["doc_id"]: r["token_ids"] for r in encode_tokens(probe, vocab).collect()}
    assert enc[1] == [-1, -1] and enc[2] == [-1]


def test_vocab_size_cap(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    v = build_vocab(docs, vocab_size=10)
    assert v.count() == 10
    assert v.agg(F.max("token_id")).first()[0] == 9
