"""Property tests for the tombstoned CDC merge (hypothesis), against a
pure-Python argmax twin:

- the merge is a per-key argmax over (seq, priority), so folding the
  change log in ANY batch partition / batch ORDER equals the sequential
  log replay — the commutativity that makes at-least-once + out-of-order
  delivery safe (holds only with tombstones retained: a delete must leave
  a record to out-rank older redelivered changes, the r06 fix);
- redelivering any subset of already-applied changes is a no-op;
- gc_tombstones at the source's acknowledged horizon is invisible: after
  GC, redelivery (which by the horizon contract only replays seq >=
  horizon) still converges to the same live state;
- one drawn case replays through the real Spark operator per run.
"""

from __future__ import annotations

import random

from hypothesis import given, settings
from hypothesis import strategies as st

# a change log with globally-unique seq (the real log shape); value derives
# from seq so equal-(key, seq) ambiguity cannot arise
_logs = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=4),  # key
        st.sampled_from(["I", "U", "U", "D"]),
    ),
    min_size=1,
    max_size=40,
).map(
    lambda rows: [
        (k, f"v{seq}", seq, op) for seq, (k, op) in enumerate(rows, start=1)
    ]
)


def _merge(state: dict, batch) -> dict:
    """Python twin of apply_cdc(keep_tombstones=True): per key keep the
    argmax by (seq, prio) where a delete re-enters at prio 2 and a live
    state row at 1 — EQUAL to an incoming I/U, the r07 fold==replay rule
    (the strict > keeps the state row on a redelivered identical change).
    The attr-value tie-break for equal-(key, seq) conflicts is not modeled
    here: this strategy generates globally-unique seqs, the real log
    shape; the equal-seq edge is pinned by test_cdc.py directly."""
    new = dict(state)
    for k, val, seq, op in batch:
        prio = 2 if op == "D" else 1
        cur = new.get(k)  # (seq, reentry_prio, val_or_None)
        if cur is None or (seq, prio) > (cur[0], cur[1]):
            new[k] = (seq, 2 if op == "D" else 1, None if op == "D" else val)
    return new


def _live(state: dict):
    return sorted(
        (k, v, s) for k, (s, p, v) in state.items() if p != 2
    )


def _replay(changes):
    """Sequential in-seq-order replay — the semantics to reproduce."""
    cur = {}
    for k, val, seq, op in sorted(changes, key=lambda c: c[2]):
        if op == "D":
            cur.pop(k, None)
        else:
            cur[k] = (val, seq)
    return sorted((k, v, s) for k, (v, s) in cur.items())


def _shuffled_batches(changes, rng):
    order = list(changes)
    rng.shuffle(order)
    batches, i = [], 0
    while i < len(order):
        n = rng.randint(1, max(1, len(order) // 3))
        batches.append(order[i : i + n])
        i += n
    return batches


@given(_logs, st.randoms(use_true_random=False))
@settings(max_examples=200, deadline=None)
def test_any_batch_order_equals_replay(changes, rng):
    state: dict = {}
    for batch in _shuffled_batches(changes, rng):
        state = _merge(state, batch)
    assert _live(state) == _replay(changes)


@given(_logs, st.randoms(use_true_random=False))
@settings(max_examples=200, deadline=None)
def test_redelivered_subset_is_noop(changes, rng):
    state: dict = {}
    for batch in _shuffled_batches(changes, rng):
        state = _merge(state, batch)
    subset = [c for c in changes if rng.random() < 0.5]
    rng.shuffle(subset)
    assert _merge(state, subset) == state


@given(_logs, st.randoms(use_true_random=False))
@settings(max_examples=200, deadline=None)
def test_gc_then_bounded_redelivery_converges(changes, rng):
    state: dict = {}
    for batch in _shuffled_batches(changes, rng):
        state = _merge(state, batch)
    horizon = rng.randint(1, len(changes) + 1)
    gced = {
        k: v for k, v in state.items() if not (v[1] == 2 and v[0] < horizon)
    }
    # the horizon contract: the transport can only redeliver seq >= horizon
    redeliver = [c for c in changes if c[2] >= horizon]
    rng.shuffle(redeliver)
    assert _live(_merge(gced, redeliver)) == _live(state)


def test_spark_operator_matches_python_twin(spark):
    """One adversarial drawn case through the REAL operator: shuffled
    batches with deletes, redelivery of an arbitrary subset, then GC +
    bounded redelivery — live rows equal the twin at every step."""
    from pyspark.sql import functions as F

    from volga_spark.operators.cdc import apply_cdc, gc_tombstones, live_rows

    rng = random.Random(17)
    changes = [
        (rng.randrange(1, 5), f"v{seq}", seq, rng.choice(["I", "U", "U", "D"]))
        for seq in range(1, 41)
    ]
    schema = "k bigint, val string, seq bigint, op string"
    sdf = spark.createDataFrame(
        [], "k bigint, val string, seq bigint"
    ).withColumn("__deleted", F.lit(False))
    twin: dict = {}
    for batch in _shuffled_batches(changes, rng):
        sdf = apply_cdc(
            sdf,
            spark.createDataFrame(batch, schema),
            ["k"],
            keep_tombstones=True,
        ).localCheckpoint(eager=True)
        twin = _merge(twin, batch)
    got = sorted(map(tuple, live_rows(sdf).collect()))
    assert got == _live(twin)

    # redeliver a subset — no change
    subset = [c for c in changes if rng.random() < 0.5]
    sdf2 = apply_cdc(
        sdf, spark.createDataFrame(subset, schema), ["k"], keep_tombstones=True
    )
    assert sorted(map(tuple, sdf2.collect())) == sorted(map(tuple, sdf.collect()))

    # GC at a horizon, then redeliver only seq >= horizon — same live rows
    horizon = 20
    gced = gc_tombstones(sdf, horizon).localCheckpoint(eager=True)
    late = [c for c in changes if c[2] >= horizon]
    sdf3 = apply_cdc(
        gced, spark.createDataFrame(late, schema), ["k"], keep_tombstones=True
    )
    assert sorted(map(tuple, live_rows(sdf3).collect())) == got
