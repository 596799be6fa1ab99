"""Property tests for SCD2 (hypothesis), against a pure-Python twin of the
operator's window logic:

- chronological batch application == bootstrap, row for row;
- ARBITRARY arrival order (late batches) keeps the range invariants and is
  point-in-time EQUIVALENT to bootstrap at every timestamp — row sets may
  differ because history rows are immutable (a late arrival can make an
  already-published version a retroactive no-op; the operator keeps the
  published row, which splits a range without changing any lookup value);
- re-applying a batch is a no-op (idempotency);
- one drawn case replays through the real Spark operator per run.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

_changes = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),
        st.integers(min_value=0, max_value=40),
        st.sampled_from(["a", "b", "c"]),
    ),
    min_size=1,
    max_size=25,
    unique_by=lambda t: (t[0], t[1]),
)


def _apply_ref(dim, batch):
    """Pure-Python twin of scd2_apply: (valid_from, change-last) order,
    no-op suppression of CHANGE rows vs the immediate predecessor,
    zero-width drop of same-ts replaced rows, valid_to = next survivor."""
    per_key: dict = {}
    for k, a, vf, _ in dim:
        per_key.setdefault(k, []).append((vf, 0, a))
    for k, ts, a in batch:
        per_key.setdefault(k, []).append((ts, 1, a))
    out = []
    for k, seq in per_key.items():
        seq.sort()
        kept = []
        for i, (ts, chg, a) in enumerate(seq):
            if chg == 1 and i > 0 and seq[i - 1][2] == a:
                continue
            kept.append((ts, a))
        for i, (ts, a) in enumerate(kept):
            nxt = kept[i + 1][0] if i + 1 < len(kept) else None
            if nxt is not None and nxt == ts:
                continue  # zero-width (replaced at its own timestamp)
            out.append((k, a, ts, nxt))
    return sorted(out)


def _bootstrap(changes):
    return _apply_ref([], list(changes))


def _value_at(dim, k, ts):
    for kk, a, vf, vt in dim:
        if kk == k and vf <= ts and (vt is None or ts < vt):
            return a
    return None


def _check_invariants(dim):
    by_key: dict = {}
    for k, a, vf, vt in dim:
        by_key.setdefault(k, []).append((vf, vt, a))
    for rows in by_key.values():
        rows.sort(key=lambda r: r[0])
        assert sum(1 for _, vt, _ in rows if vt is None) == 1
        assert all(rows[i][1] == rows[i + 1][0] for i in range(len(rows) - 1))


@settings(max_examples=150, deadline=None)
@given(_changes, st.integers(min_value=1, max_value=4))
def test_chronological_batches_equal_bootstrap(changes, n_batches):
    ordered = sorted(changes, key=lambda c: (c[1], c[0]))  # arrival by time
    step = max(1, len(ordered) // n_batches)
    dim: list = []
    for i in range(0, len(ordered), step):
        dim = _apply_ref(dim, ordered[i : i + step])
    assert dim == _bootstrap(changes)
    _check_invariants(dim)


@settings(max_examples=150, deadline=None)
@given(_changes, st.integers(min_value=1, max_value=4))
def test_late_arrivals_preserve_point_in_time_semantics(changes, n_batches):
    # batches are slices of the GENERATED order — arbitrary interleaving,
    # so later batches routinely carry earlier timestamps
    step = max(1, len(changes) // n_batches)
    dim: list = []
    for i in range(0, len(changes), step):
        dim = _apply_ref(dim, changes[i : i + step])
    _check_invariants(dim)
    boot = _bootstrap(changes)
    keys = {k for k, _, _ in changes}
    for k in keys:
        for ts in range(42):
            assert _value_at(dim, k, ts) == _value_at(boot, k, ts), (k, ts)


@settings(max_examples=100, deadline=None)
@given(_changes)
def test_reapplying_a_batch_is_noop(changes):
    dim = _bootstrap(changes)
    assert _apply_ref(dim, list(changes)) == dim


def test_spark_operator_matches_python_reference(spark):
    """Replay a representative case (late arrival + same-ts replace + no-op)
    through the real operator and compare to the Python twin row for row."""
    from volga_spark.operators.scd import scd2_apply, scd2_init

    b1 = [(1, 10, "a"), (1, 30, "b"), (2, 5, "a")]
    b2 = [(1, 20, "c"), (2, 5, "b"), (1, 40, "b"), (2, 9, "b")]
    dim = scd2_init(
        spark.createDataFrame(b1, "k bigint, eff_ts bigint, tier string"),
        "k",
        ["tier"],
    )
    out = scd2_apply(
        dim,
        spark.createDataFrame(b2, "k bigint, eff_ts bigint, tier string"),
        "k",
        ["tier"],
    )
    got = sorted(
        (r["k"], r["tier"], r["valid_from"], r["valid_to"])
        for r in out.collect()
    )
    assert got == _apply_ref(_bootstrap(b1), b2)
