"""End-to-end pretraining-data pipeline: the full curation flow a corpus
team would run, composed from the repo's operators — report → perplexity
gate → learned classifier gate → exact dedup → vocab/encode → chunk →
pack → split → report. Property-tested stage by stage (monotone shrinkage,
no leakage between stages' contracts, budget/fraction invariants); each
individual operator's exactness is pinned by its own oracled test file —
this test pins that they COMPOSE.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from volga_spark.operators.chunking import chunk_documents, pack_sequences
from volga_spark.operators.classifier import (
    score_quality,
    train_quality_classifier,
)
from volga_spark.operators.lm import score_perplexity, train_bigram_lm
from volga_spark.operators.report import corpus_report
from volga_spark.operators.splits import assign_split
from volga_spark.operators.text import build_vocab, encode_tokens, token_count
from volga_spark.tables import load_table


def test_full_pretraining_pipeline(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang", "text"
    )
    n0 = docs.count()
    report0 = corpus_report(docs, group_by=["source"])
    assert report0.agg(F.sum("n_docs")).first()[0] == n0

    # 1. perplexity gate: self-trained bigram LM, keep at/below the median
    lm = train_bigram_lm(docs, min_count=2)
    scored = score_perplexity(docs, lm)
    ceiling = scored.approxQuantile("perplexity", [0.5], 0.0)[0]
    kept1 = scored.filter(F.col("perplexity") <= ceiling).select(
        "doc_id", "source", "lang", "text"
    )
    n1 = kept1.count()
    assert 0 < n1 < n0

    # 2. learned gate: weak labels (token-count band as the teacher here;
    #    production swaps in LLM labels), then keep classifier-positives
    labeled = docs.withColumn(
        "label",
        (token_count("text").between(20, 500)).cast("double"),
    )
    assert labeled.filter(F.col("label") == 1.0).count() > 0
    clf = train_quality_classifier(labeled)
    kept2 = score_quality(kept1, clf).filter(
        F.col("quality_score") >= 0.5
    ).select("doc_id", "source", "lang", "text")
    n2 = kept2.count()
    assert 0 < n2 <= n1

    # 3. exact dedup: smallest doc_id per content fingerprint survives
    from volga_spark.operators.text import fingerprint

    w = kept2.withColumn("__fp", fingerprint("text"))
    survivors = w.groupBy("__fp").agg(F.min("doc_id").alias("doc_id"))
    kept3 = w.join(survivors, ["__fp", "doc_id"]).drop("__fp")
    n3 = kept3.count()
    assert n3 == w.select("__fp").distinct().count()

    # 4. tokenizer artifacts over the SURVIVING corpus: vocab + encoding
    vocab = build_vocab(kept3, min_count=1)
    encoded = encode_tokens(kept3, vocab)
    assert encoded.count() == n3
    # min_count=1 vocab over the same corpus → no OOV ids anywhere
    oov = encoded.select(
        F.size(F.filter("token_ids", lambda i: i == F.lit(-1))).alias("n")
    ).agg(F.sum("n")).first()[0]
    assert oov == 0

    # 5. chunk → pack under a token budget (chunks carry doc_id only;
    #    re-attach source for the packing groups, and give every chunk a
    #    unique id so the greedy first-fit order is total)
    chunks = chunk_documents(kept3, chunk_tokens=32, overlap=8)
    assert chunks.count() >= n3
    with_tok = chunks.join(kept3.select("doc_id", "source"), "doc_id").select(
        (F.col("doc_id") * 10000 + F.col("chunk_id")).alias("piece_id"),
        "source",
        F.col("chunk_n_tokens").alias("n_tokens"),
    )
    packed = pack_sequences(
        with_tok, id_col="piece_id", group_cols=("source",), budget=64,
        n_shards=4,
    )
    over = (
        packed.groupBy("source", "shard", "bin_id")
        .agg(F.sum("n_tokens").alias("t"), F.count("*").alias("c"))
        .filter((F.col("t") > 64) & (F.col("c") > 1))
        .count()
    )
    assert over == 0  # multi-piece bins never exceed the budget

    # 6. deterministic splits partition the survivors exactly
    final = kept3.withColumn(
        "split", assign_split("doc_id", {"train": 0.9, "val": 0.05, "test": 0.05})
    )
    per = {r["split"]: r["n"] for r in final.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(per.values()) == n3
    assert per.get("train", 0) > per.get("val", 0)

    # 7. closing report is consistent with the surviving corpus
    report1 = corpus_report(kept3)
    row = report1.collect()[0]
    assert row["n_docs"] == n3
    assert row["exact_dup_rate"] == 0.0  # we just deduped


def test_curation_to_export_to_search_composes(spark, sf_dir, tmp_path):
    """The r06 tiers compose end-to-end: curation spec → publish (atomic
    version) → training export over the PUBLISHED corpus → standing BM25
    index over the same corpus answers queries. Each stage's exactness is
    pinned elsewhere; this pins the hand-offs."""
    from volga_spark.api.curation import CurationSpec
    from volga_spark.api.training_export import (
        export_training_shards,
        read_manifest,
    )
    from volga_spark.operators.bpe import train_bpe
    from volga_spark.operators.publish import publish_version, read_latest
    from volga_spark.operators.retrieval import bm25_index, bm25_topk_from_index

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )

    # 1. curate (gate + dedup) and publish as v1
    spec = CurationSpec(
        stages=[
            {"op": "min_chars", "n": 20},
            {"op": "exact_dedup"},
        ]
    )
    curated = spec.build(spark, docs)
    root = str(tmp_path / "corpus")
    assert publish_version(curated, root) == 1
    published = read_latest(spark, root)
    n_pub = published.count()
    assert 0 < n_pub <= docs.count()

    # 2. export training shards FROM the published version
    model = train_bpe(published, num_merges=40)
    ex_root = str(tmp_path / "export")
    manifest = export_training_shards(
        published, model, ex_root, seq_len=96, n_shards=2
    )
    assert manifest == read_manifest(spark, ex_root)
    assert manifest["total_tokens"] > 0
    shards = spark.read.parquet(f"{ex_root}/shards")
    assert shards.count() == manifest["total_seqs"]

    # 3. standing BM25 index over the SAME published corpus serves queries
    #    whose hits are all published doc_ids
    idx = bm25_index(published)
    qs = spark.createDataFrame(
        [(1, "spark window agg")], "query_id int, qtext string"
    )
    hits = bm25_topk_from_index(idx, qs, k=5).collect()
    assert len(hits) > 0
    pub_ids = {r["doc_id"] for r in published.select("doc_id").collect()}
    assert all(r["doc_id"] in pub_ids for r in hits)
