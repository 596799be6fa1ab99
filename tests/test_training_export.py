"""Training export: sequences are the exact concatenation of the selected
BPE id stream, all-but-last exactly seq_len, manifest accounts for every
token, deterministic rebuild."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from volga_spark.api.training_export import (
    build_sequences,
    epoch_read_plan,
    export_training_shards,
    read_manifest,
)
from volga_spark.operators.bpe import encode_bpe, train_bpe
from volga_spark.tables import load_table


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").limit(200)


def test_sequences_are_exact_token_stream(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    model = train_bpe(docs, num_merges=50)
    L = 128
    seqs = {
        r["seq_id"]: r["token_ids"]
        for r in build_sequences(docs, model, L).collect()
    }
    # contiguous ids; all but last exactly L; last non-empty
    assert sorted(seqs) == list(range(len(seqs)))
    for sid, toks in seqs.items():
        if sid != max(seqs):
            assert len(toks) == L, sid
        else:
            assert 0 < len(toks) <= L
    # the concatenated stream equals the selected docs' ids in rank order
    enc = encode_bpe(docs, model)
    rows = [
        (r["doc_id"], r["bpe_ids"])
        for r in enc.collect()
        if len(r["bpe_ids"]) > 0
    ]

    def rank(i):
        return hashlib.md5(f"volga-export:{i}".encode()).hexdigest()

    rows.sort(key=lambda r: (rank(r[0]), r[0]))
    want_stream = [t for _, ids in rows for t in ids]
    got_stream = [t for sid in sorted(seqs) for t in seqs[sid]]
    assert got_stream == want_stream


def test_build_sequences_boundaries(spark, sf_dir):
    """emit_boundaries: bounds tile each sequence contiguously from 0,
    lens match the packed chunks, and doc ids re-derive the exact stream."""
    docs = _docs(spark, sf_dir)
    model = train_bpe(docs, num_merges=50)
    L = 128
    rows = build_sequences(docs, model, L, emit_boundaries=True).collect()
    enc = {
        r["doc_id"]: list(r["bpe_ids"])
        for r in encode_bpe(docs, model).collect()
    }
    consumed: dict[int, int] = {}
    for r in sorted(rows, key=lambda r: r["seq_id"]):
        pos = 0
        for b in r["bounds"]:
            assert b["start"] == pos  # contiguous tiling from 0
            pos += b["len"]
            # the span's tokens are the next b.len ids of that document
            off = consumed.get(b["doc_id"], 0)
            want = enc[b["doc_id"]][off : off + b["len"]]
            got = list(r["token_ids"][b["start"] : b["start"] + b["len"]])
            assert got == want
            consumed[b["doc_id"]] = off + b["len"]
        assert pos == len(r["token_ids"])
    # every selected document fully consumed
    assert all(consumed[d] == len(enc[d]) for d in consumed)


def test_export_manifest_boundaries_flag(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    model = train_bpe(docs, num_merges=50)
    root = str(tmp_path / "exp_bounds")
    man = export_training_shards(
        docs, model, root, seq_len=128, n_shards=2, emit_boundaries=True
    )
    assert man["boundaries"] is True
    shard = spark.read.parquet(f"{root}/shards")
    assert "bounds" in shard.columns
    man2 = export_training_shards(
        docs, model, str(tmp_path / "exp_plain"), seq_len=128, n_shards=2
    )
    assert man2["boundaries"] is False


def test_export_manifest_and_determinism(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    model = train_bpe(docs, num_merges=50)
    root = str(tmp_path / "export")
    m = export_training_shards(docs, model, root, seq_len=128, n_shards=4)
    assert m == read_manifest(spark, root)
    assert m["total_tokens"] == sum(
        s["n_tokens"] for s in m["shards"].values()
    )
    # totals match the sequence frame exactly
    seqs = build_sequences(docs, model, 128)
    agg = seqs.groupBy().sum("n_tokens").collect()[0][0]
    assert m["total_tokens"] == agg and m["total_seqs"] == seqs.count()

    # re-export reproduces identical sequences (deterministic provenance)
    root2 = str(tmp_path / "export2")
    export_training_shards(docs, model, root2, seq_len=128, n_shards=4)
    a = sorted(
        map(tuple, spark.read.parquet(f"{root}/shards").collect())
    )
    b = sorted(
        map(tuple, spark.read.parquet(f"{root2}/shards").collect())
    )
    assert a == b


def test_export_global_shuffle(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    model = train_bpe(docs, num_merges=50)
    root = str(tmp_path / "shuf")
    m = export_training_shards(
        docs, model, root, seq_len=64, n_shards=4, shuffle_seed="s1"
    )
    assert m["shuffle_seed"] == "s1"
    out = spark.read.parquet(f"{root}/shards")

    # shuffling is a pure reorder: same sequences, same ids, same tokens
    plain = build_sequences(docs, model, 64)
    a = sorted((r["seq_id"], tuple(r["token_ids"])) for r in out.collect())
    b = sorted((r["seq_id"], tuple(r["token_ids"])) for r in plain.collect())
    assert a == b
    n = len(a)

    # the global order is EXACTLY the md5(seed:seq_id) permutation —
    # engine-parity against an independent pure-python ranking
    order = [
        r["seq_id"] for r in out.orderBy("shuffle_pos", "seq_id").collect()
    ]
    want = sorted(
        range(n), key=lambda i: hashlib.md5(f"s1:{i}".encode()).hexdigest()
    )
    assert order == want and order != sorted(order)

    # shard assignment is the md5 bucket rule, and every shard draws
    # seq_ids from across the whole id range (decorrelated from position)
    for r in out.select("shard", "seq_id").collect():
        bucket = (
            int(hashlib.md5(f"s1:{r['seq_id']}".encode()).hexdigest()[:12], 16)
            % 1_000_000
        )
        assert r["shard"] == bucket % 4
    spans = {
        r["shard"]: (r["lo"], r["hi"])
        for r in out.groupBy("shard")
        .agg(F.min("seq_id").alias("lo"), F.max("seq_id").alias("hi"))
        .collect()
    }
    assert len(spans) == 4
    for lo, hi in spans.values():
        assert hi - lo > n // 2

    # a different seed yields a different permutation
    root2 = str(tmp_path / "shuf2")
    export_training_shards(
        docs, model, root2, seq_len=64, n_shards=4, shuffle_seed="s2"
    )
    order2 = [
        r["seq_id"]
        for r in spark.read.parquet(f"{root2}/shards")
        .orderBy("shuffle_pos", "seq_id")
        .collect()
    ]
    assert sorted(order2) == sorted(order) and order2 != order


def test_epoch_read_plan_fresh_permutation_per_epoch(
    spark, sf_dir, tmp_path
):
    docs = _docs(spark, sf_dir)
    model = train_bpe(docs, num_merges=50)
    root = str(tmp_path / "epochs")
    export_training_shards(
        docs, model, root, seq_len=64, n_shards=3, shuffle_seed="s1"
    )

    def epoch_order(epoch):
        df = epoch_read_plan(spark, root, epoch, n_slices=4)
        # partitions in index order, rows in partition order == the stream
        rows = df.select("seq_id", "epoch_pos").collect()
        return [r["seq_id"] for r in rows]

    e0, e1 = epoch_order(0), epoch_order(1)
    n = len(e0)
    # each epoch is a full permutation, epochs differ, and each matches
    # the independently-computed md5 prediction
    assert sorted(e0) == list(range(n)) == sorted(e1)
    assert e0 != e1
    for epoch, got in ((0, e0), (1, e1)):
        want = sorted(
            range(n),
            key=lambda i: hashlib.md5(
                f"volga-epoch:{epoch}:{i}".encode()
            ).hexdigest(),
        )
        assert got == want
    # reading the same epoch twice is reproducible
    assert epoch_order(1) == e1


def test_export_with_mixture_budget(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    model = train_bpe(docs.limit(100), num_merges=30)
    m = export_training_shards(
        docs,
        model,
        str(tmp_path / "mix"),
        seq_len=64,
        n_shards=2,
        weights={"src0": 0.6, "src1": 0.4},
        token_budget=3000,
    )
    # budgets bound the stream: ≤ budget + one straddling doc per domain
    assert 0 < m["total_tokens"] < 3000 + 2 * 2000


def test_build_sequences_context_order(spark, sf_dir):
    """order='context' packs the SAME token stream in simhash-locality
    order: the concatenation equals the BPE stream of docs sorted by the
    simhash rank (independently recomputed via simhash64), byte-exact."""
    from volga_spark.operators.dedup import simhash64

    docs = _docs(spark, sf_dir)
    model = train_bpe(docs, num_merges=50)
    L = 128
    out = build_sequences(docs, model, L, order="context").collect()
    got = []
    for r in sorted(out, key=lambda r: r["seq_id"]):
        got.extend(r["token_ids"])

    enc = encode_bpe(docs, model)
    texts = {
        r["doc_id"]: r["text"]
        for r in docs.select("doc_id", "text").collect()
    }

    def rank(doc_id):
        sim = simhash64(texts[doc_id])
        return f"{(sim >> 32) + (1 << 31):08x}{sim & 0xFFFFFFFF:08x}"

    rows = [
        (rank(r["doc_id"]), r["doc_id"], r["bpe_ids"])
        for r in enc.collect()
        if len(r["bpe_ids"]) > 0
    ]
    want = []
    for _, _, ids in sorted(rows, key=lambda t: (t[0], t[1])):
        want.extend(ids)
    assert got == want


def test_build_sequences_order_guard(spark, sf_dir):
    import pytest

    docs = _docs(spark, sf_dir)
    model = train_bpe(docs, num_merges=50)
    with pytest.raises(ValueError, match="order must be"):
        build_sequences(docs, model, 128, order="random")


def test_export_manifest_records_order(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    model = train_bpe(docs, num_merges=50)
    m = export_training_shards(
        docs, model, str(tmp_path / "ctx"), 128, n_shards=2, order="context"
    )
    assert m["order"] == "context"
    m2 = export_training_shards(
        docs, model, str(tmp_path / "shuf"), 128, n_shards=2
    )
    assert m2["order"] == "shuffle"


def test_build_sequences_curriculum_order(spark, sf_dir):
    """order='curriculum' packs the BPE stream sorted by the integer
    score column (ties broken on id), byte-exact."""
    docs = _docs(spark, sf_dir)
    model = train_bpe(docs, num_merges=50)
    out = build_sequences(
        docs, model, 128, order="curriculum", order_col="n_chars"
    ).collect()
    got = []
    for r in sorted(out, key=lambda r: r["seq_id"]):
        got.extend(r["token_ids"])

    enc = encode_bpe(docs, model)
    scores = {
        r["doc_id"]: r["n_chars"]
        for r in docs.select("doc_id", "n_chars").collect()
    }
    rows = [
        (scores[r["doc_id"]], r["doc_id"], r["bpe_ids"])
        for r in enc.collect()
        if len(r["bpe_ids"]) > 0
    ]
    want = []
    for _, _, ids in sorted(rows, key=lambda t: (t[0], t[1])):
        want.extend(ids)
    assert got == want


def test_budget_selection_is_order_independent(spark, sf_dir):
    """Regression (r09 review): with weights set, the order knob must not
    bias WHICH docs are selected — selection stays the uniform seeded-md5
    sample; only the packing order of the selected subset changes."""
    docs = _docs(spark, sf_dir)
    model = train_bpe(docs, num_merges=50)
    kw = dict(weights={"src0": 0.5, "src1": 0.5}, token_budget=3000)

    def doc_set(order, **extra):
        out = build_sequences(
            docs, model, 128, order=order, emit_boundaries=True, **kw, **extra
        ).collect()
        return {b["doc_id"] for r in out for b in r["bounds"]}

    shuffle_docs = doc_set("shuffle")
    ctx_docs = doc_set("context")
    cur_docs = doc_set("curriculum", order_col="n_chars", ascending=False)
    assert ctx_docs == shuffle_docs
    assert cur_docs == shuffle_docs
