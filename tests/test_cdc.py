"""CDC apply: log-replay reference parity, DuckDB twin hash-parity,
at-least-once idempotency, and streaming == batch."""

from __future__ import annotations

import random

import duckdb
from pyspark.sql import functions as F

from volga_spark.operators.cdc import apply_cdc, apply_cdc_oracle_sql

STATE_SCHEMA = "k bigint, val string, seq bigint"
CHG_SCHEMA = "k bigint, val string, seq bigint, op string"


def _replay(changes):
    """Sequential log replay (the semantics CDC merge must reproduce):
    apply in seq order; D at equal seq wins over I/U."""
    cur = {}
    for k, val, seq, op in sorted(
        changes, key=lambda c: (c[2], {"I": 1, "U": 1, "D": 2}[c[3]])
    ):
        if op == "D":
            cur.pop(k, None)
        else:
            cur[k] = (val, seq)
    return sorted((k, v, s) for k, (v, s) in cur.items())


def _gen_changes(seed, n, keys=8):
    rng = random.Random(seed)
    out = []
    for seq in range(1, n + 1):
        out.append(
            (
                rng.randrange(keys),
                f"v{seq}",
                seq,
                rng.choice(["I", "U", "U", "D"]),
            )
        )
    return out


def test_batch_apply_matches_log_replay(spark):
    changes = _gen_changes(3, 60)
    empty = spark.createDataFrame([], STATE_SCHEMA)
    got = sorted(
        map(
            tuple,
            apply_cdc(
                empty, spark.createDataFrame(changes, CHG_SCHEMA), ["k"]
            ).collect(),
        )
    )
    assert got == _replay(changes)


def test_multi_batch_apply_matches_log_replay(spark):
    changes = _gen_changes(7, 80)
    state = spark.createDataFrame([], STATE_SCHEMA)
    for i in range(0, 80, 20):
        batch = spark.createDataFrame(changes[i : i + 20], CHG_SCHEMA)
        state = apply_cdc(state, batch, ["k"]).localCheckpoint(eager=True)
    assert sorted(map(tuple, state.collect())) == _replay(changes)


def test_redelivery_is_idempotent(spark):
    changes = _gen_changes(9, 40)
    state = spark.createDataFrame([], STATE_SCHEMA)
    state = apply_cdc(
        state, spark.createDataFrame(changes, CHG_SCHEMA), ["k"]
    ).localCheckpoint(eager=True)
    # redeliver an arbitrary prefix (at-least-once) — state unchanged
    again = apply_cdc(
        state, spark.createDataFrame(changes[:25], CHG_SCHEMA), ["k"]
    )
    assert sorted(map(tuple, again.collect())) == sorted(
        map(tuple, state.collect())
    )


def test_redelivery_past_a_delete_needs_tombstones(spark):
    """A key whose LAST applied op is a delete: replaying an older prefix
    must not resurrect it. The plain merge forgets deletes (documented);
    keep_tombstones retains the delete's seq and stays idempotent."""
    from volga_spark.operators.cdc import live_rows

    changes = [(1, "a", 1, "I"), (1, "b", 2, "U"), (1, None, 3, "D")]
    empty = spark.createDataFrame([], STATE_SCHEMA)
    full = spark.createDataFrame(changes, CHG_SCHEMA)
    state = apply_cdc(
        empty, full, ["k"], keep_tombstones=True
    ).localCheckpoint(eager=True)
    assert live_rows(state).count() == 0  # key 1 is deleted
    # redeliver the pre-delete prefix — tombstone seq=3 out-ranks it
    again = apply_cdc(
        state,
        spark.createDataFrame(changes[:2], CHG_SCHEMA),
        ["k"],
        keep_tombstones=True,
    )
    assert sorted(map(tuple, again.collect())) == sorted(
        map(tuple, state.collect())
    )
    assert live_rows(again).count() == 0


def test_tombstoned_matches_plain_on_live_rows(spark):
    """keep_tombstones changes retention, not live-row semantics: the live
    view of the tombstoned state equals the plain merge, across batches."""
    from volga_spark.operators.cdc import live_rows

    changes = _gen_changes(21, 70)
    plain = spark.createDataFrame([], STATE_SCHEMA)
    tomb = plain.withColumn("__deleted", F.lit(False))
    for i in range(0, 70, 35):
        batch = spark.createDataFrame(changes[i : i + 35], CHG_SCHEMA)
        plain = apply_cdc(plain, batch, ["k"]).localCheckpoint(eager=True)
        tomb = apply_cdc(
            tomb, batch, ["k"], keep_tombstones=True
        ).localCheckpoint(eager=True)
    assert sorted(map(tuple, live_rows(tomb).collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_stream_scd2_with_ops_applies_deletes(spark, tmp_path):
    """The bridge's op_col path: the SAME Debezium-shaped feed that drives
    cdc_stream_apply maintains the SCD2 history — D rows end validity as
    tombstone versions, equal to a one-shot bootstrap with deletes."""
    from volga_spark.operators.cdc import cdc_stream_scd2
    from volga_spark.operators.scd import scd2_init, scd2_lookup

    schema = "k bigint, eff_ts bigint, tier string, op string"
    changes = [
        (u, ts, t, op)
        for u in range(4)
        for ts, t, op in [
            (0, "b", "I"),
            (10, "a", "U"),
            (20, None, "D"),
            (30, "c", "I"),
        ]
    ]
    src = str(tmp_path / "scd_ops_src")
    halves = [changes[0::2], changes[1::2]]
    for i, part in enumerate(halves):
        spark.createDataFrame(part, schema).coalesce(1).write.mode(
            "append" if i else "overwrite"
        ).parquet(src)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    dim = cdc_stream_scd2(stream, ["k"], ["tier"], op_col="op")
    boot = scd2_init(
        spark.createDataFrame(changes, schema).withColumn(
            "__is_del", F.col("op") == "D"
        ),
        "k",
        ["tier"],
        suppress_noops=False,
        delete_col="__is_del",
    )
    key = lambda df: sorted(  # noqa: E731
        (
            (r["k"], r["tier"], r["valid_from"], r["valid_to"], r["__tomb"])
            for r in df.collect()
        ),
        key=lambda t: (t[0], t[2]),
    )
    assert key(dim) == key(boot) and dim.count() > 0
    # point-in-time: t=25 is inside every key's deleted interval
    facts = spark.createDataFrame([(0, 25), (0, 35)], "k bigint, ts bigint")
    looked = {
        r["ts"]: r["tier"]
        for r in scd2_lookup(facts, dim, "k", "ts", ["tier"]).collect()
    }
    assert looked == {25: None, 35: "c"}


def test_stream_scd2_rejects_composite_keys(spark):
    import pytest

    from volga_spark.operators.cdc import cdc_stream_scd2

    with pytest.raises(ValueError, match="exactly one key column"):
        cdc_stream_scd2(
            spark.readStream.format("rate").load(), ["a", "b"], ["v"]
        )


def test_duckdb_twin_matches(spark):
    changes = _gen_changes(5, 50)
    prior = [(99, "old", 0), (98, "gone", 0)]
    state = spark.createDataFrame(prior, STATE_SCHEMA)
    got = sorted(
        map(
            tuple,
            apply_cdc(
                state, spark.createDataFrame(changes, CHG_SCHEMA), ["k"]
            ).collect(),
        )
    )
    state_vals = ", ".join(f"({k}, '{v}', {s})" for k, v, s in prior)
    chg_vals = ", ".join(
        f"({k}, '{v}', {s}, '{o}')" for k, v, s, o in changes
    )
    sql = apply_cdc_oracle_sql(
        f"SELECT * FROM (VALUES {state_vals}) t(k, val, seq)",
        f"SELECT * FROM (VALUES {chg_vals}) t(k, val, seq, op)",
        ["k"],
        ["val"],
    )
    want = sorted(map(tuple, duckdb.sql(sql).fetchall()))
    assert got == want


def test_stream_apply_equals_batch(spark, tmp_path):
    from volga_spark.operators.cdc import cdc_stream_apply

    changes = _gen_changes(13, 90)
    # three time-ordered chunk files → three micro-batches in seq order
    src = str(tmp_path / "cdc_src")
    for i, lo in enumerate(range(0, 90, 30)):
        spark.createDataFrame(changes[lo : lo + 30], CHG_SCHEMA).coalesce(
            1
        ).write.mode("append" if i else "overwrite").parquet(src)
    stream = (
        spark.readStream.schema(CHG_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    final = cdc_stream_apply(stream, ["k"])
    got = sorted(map(tuple, final.select("k", "val", "seq").collect()))
    assert got == _replay(changes)


def test_stream_scd2_history_equals_bootstrap(spark, tmp_path):
    """The streamed SCD2 dimension (suppress_noops=False, the out-of-order
    contract) equals a one-shot bootstrap over all changes — including a
    deliberately late-arriving batch."""
    from volga_spark.operators.cdc import cdc_stream_scd2
    from volga_spark.operators.scd import scd2_init

    schema = "k bigint, eff_ts bigint, tier string"
    changes = [
        (u, ts, t)
        for u in range(6)
        for ts, t in [(0, "b"), (20, "b"), (10, "a"), (30, "c")]
    ]
    # chunk so the (10, 'a') rows arrive AFTER (20, 'b') — late data
    src = str(tmp_path / "scd_src")
    thirds = [changes[0::3], changes[1::3], changes[2::3]]
    for i, part in enumerate(thirds):
        spark.createDataFrame(part, schema).coalesce(1).write.mode(
            "append" if i else "overwrite"
        ).parquet(src)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    dim = cdc_stream_scd2(stream, ["k"], ["tier"])
    got = sorted(
        (r["k"], r["tier"], r["valid_from"], r["valid_to"])
        for r in dim.collect()
    )
    boot = scd2_init(
        spark.createDataFrame(changes, schema), "k", ["tier"],
        suppress_noops=False,
    )
    want = sorted(
        (r["k"], r["tier"], r["valid_from"], r["valid_to"])
        for r in boot.collect()
    )
    assert got == want and len(want) > 0


def test_equal_seq_nondelete_tie_is_deterministic(spark):
    """r07: two non-delete changes at the same (key, seq) — a malformed
    but possible feed — must resolve identically on every run and
    partitioning (attr values desc, nulls last), and identically to the
    DuckDB twin."""
    changes = [
        (1, "zeta", 5, "I"),
        (1, "alpha", 5, "U"),  # same key, same seq — tie on attrs
        (2, None, 3, "U"),
        (2, "beta", 3, "I"),  # null loses to non-null (nulls last)
    ]
    empty = spark.createDataFrame([], STATE_SCHEMA)
    outs = set()
    for n_parts in (1, 4, 13):
        chg = spark.createDataFrame(changes, CHG_SCHEMA).repartition(n_parts)
        outs.add(
            tuple(sorted(map(tuple, apply_cdc(empty, chg, ["k"]).collect())))
        )
    assert len(outs) == 1, outs
    got = list(outs)[0]
    # desc order: 'zeta' > 'alpha'; 'beta' > NULL
    assert got == ((1, "zeta", 5), (2, "beta", 3))
    chg_vals = ", ".join(
        f"({k}, {'NULL' if v is None else repr(v)}, {s}, '{o}')"
        for k, v, s, o in changes
    )
    sql = apply_cdc_oracle_sql(
        "SELECT * FROM (VALUES (99, 'x', 0)) t(k, val, seq) WHERE k < 0",
        f"SELECT * FROM (VALUES {chg_vals}) t(k, val, seq, op)",
        ["k"],
        ["val"],
    )
    want = tuple(sorted(map(tuple, duckdb.sql(sql).fetchall())))
    assert got == want


def test_equal_seq_tie_fold_matches_replay(spark):
    """An equal-seq non-delete conflict SPLIT ACROSS batches must resolve
    exactly as a one-shot replay of the whole log: the state row ranks as
    the change it once was (attr tie-break), not below every change."""
    empty = spark.createDataFrame([], STATE_SCHEMA)
    b1 = spark.createDataFrame([(1, "zeta", 5, "I")], CHG_SCHEMA)
    b2 = spark.createDataFrame([(1, "alpha", 5, "U")], CHG_SCHEMA)
    folded = apply_cdc(apply_cdc(empty, b1, ["k"]), b2, ["k"])
    replay = apply_cdc(empty, b1.unionByName(b2), ["k"])
    assert sorted(map(tuple, folded.collect())) == sorted(
        map(tuple, replay.collect())
    ) == [(1, "zeta", 5)]


def test_map_typed_attrs_still_apply(spark):
    """Map-typed attr columns are unorderable in Spark — the deterministic
    tie-break must skip them instead of failing every apply."""
    state = spark.createDataFrame(
        [], "k bigint, props map<string,string>, seq bigint"
    )
    chg = spark.createDataFrame(
        [(1, {"a": "x"}, 5, "I"), (1, {"a": "y"}, 7, "U"), (2, {"b": "z"}, 3, "D")],
        "k bigint, props map<string,string>, seq bigint, op string",
    )
    got = {r["k"]: (dict(r["props"]), r["seq"]) for r in apply_cdc(state, chg, ["k"]).collect()}
    assert got == {1: ({"a": "y"}, 7)}
