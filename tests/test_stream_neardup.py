"""Online near-dup ingest filter: first-seen-wins decisions match a greedy
Python reference; state grows with the unique corpus only; rerun-identical."""

from __future__ import annotations


BASE = (
    "the quick brown fox jumps over the lazy dog while seventeen sleepy "
    "badgers watch from a mossy log near the river bend at dusk"
)
ALT = BASE.replace("mossy", "stony")          # near-dup of BASE (1 token)
FAR = (
    "completely different subject matter here involving spacecraft "
    "trajectories gravitational assists and the economics of asteroid "
    "mining ventures in the outer belt colonies"
)
FAR2 = FAR.replace("outer", "inner")          # near-dup of FAR


def _grams(text, n=3):
    toks = text.split()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _greedy_reference(docs, threshold=0.7):
    """First-seen-wins over the GLOBAL id order (batches arrive in id
    order here): drop a doc iff it matches any lower-id doc that is
    retained OR (same batch) any lower-id doc retained-or-not; reps are
    the smallest matching id. For this corpus every true pair is also an
    LSH candidate (J >= 0.85), so the filter must agree exactly."""
    decisions = {}
    retained = []
    batches = {}
    for did, batch, text in docs:
        batches.setdefault(batch, []).append((did, text))
    for batch in sorted(batches):
        rows = sorted(batches[batch])
        for did, text in rows:
            g = _grams(text)
            matches = []
            for oid, og, okept, obatch in retained:
                if not okept and obatch != batch:
                    continue  # dropped docs only block within their batch
                if oid >= did:
                    continue
                u = g | og
                if u and len(g & og) / len(u) >= threshold:
                    matches.append(oid)
            rep = min(matches) if matches else None
            decisions[did] = (rep is None, rep)
            retained.append((did, g, rep is None, batch))
    return decisions


def test_stream_filter_matches_greedy_reference(spark, tmp_path):
    from volga_spark.operators.dedup import neardup_stream_filter

    docs = [
        # batch 0: 1 unique, 2 ~ 1 (in-batch dup), 3 unique
        (1, 0, BASE), (2, 0, ALT), (3, 0, FAR),
        # batch 1: 4 ~ 1 (cross-batch dup of retained), 5 unique-ish far dup
        (4, 1, BASE + " extra"), (5, 1, FAR2),
        # batch 2: 6 ~ 2 (dup of a DROPPED doc -> matches retained rep 1),
        # 7 genuinely new
        (6, 2, ALT), (7, 2, "a tiny unrelated note about gardening tools "
                            "and the proper sharpening of shears in spring"),
    ]
    src = str(tmp_path / "nd_src")
    for b in range(3):
        rows = [(d, t) for d, bb, t in docs if bb == b]
        spark.createDataFrame(rows, "doc_id bigint, text string").coalesce(
            1
        ).write.mode("append" if b else "overwrite").parquet(src)
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    got = {
        r["doc_id"]: (r["kept"], r["dup_of"])
        for r in neardup_stream_filter(stream, threshold=0.7).collect()
    }
    want = _greedy_reference([(d, b, t) for d, b, t in docs])
    assert got == want, (got, want)
    # sanity on the planted structure
    assert got[1][0] and got[3][0] and got[7][0]
    assert not got[2][0] and got[2][1] == 1
    assert not got[4][0] and got[4][1] == 1
    assert not got[5][0] and got[5][1] == 3
    assert not got[6][0] and got[6][1] == 1


def test_stream_filter_rerun_identical(spark, tmp_path):
    from volga_spark.operators.dedup import neardup_stream_filter

    rows = [(i, BASE if i % 3 == 0 else FAR + f" tail{i // 3}") for i in range(12)]
    src = str(tmp_path / "nd_src2")
    for b in range(3):
        chunk = rows[b * 4 : (b + 1) * 4]
        spark.createDataFrame(chunk, "doc_id bigint, text string").coalesce(
            1
        ).write.mode("append" if b else "overwrite").parquet(src)

    def run():
        stream = (
            spark.readStream.schema("doc_id bigint, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        return sorted(
            map(tuple, neardup_stream_filter(stream, threshold=0.7).collect())
        )

    assert run() == run()
