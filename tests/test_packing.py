"""Mixture selection + sequence packing: budget/partition invariants,
distributed-prefix-sum correctness vs a single-window reference, plan shape
(no single-partition global window in the packing path)."""

from __future__ import annotations

from pyspark.sql import functions as F

from volga_spark.operators.packing import mixture_select, pack_sequences

WEIGHTS = {"a": 0.5, "b": 0.3, "c": 0.2}


def _docs(spark, n=120):
    rows = [
        (i, "w " * (3 + i % 11), ["a", "b", "c", "zz"][i % 4])
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string, source string")


def test_mixture_budgets_respected(spark):
    budget = 200
    sel = mixture_select(_docs(spark), WEIGHTS, budget).collect()
    by_d = {}
    for r in sel:
        by_d.setdefault(r["domain"], []).append(r)
    assert set(by_d) <= set(WEIGHTS)  # 'zz' (unweighted) dropped
    for d, rows in by_d.items():
        bd = int(WEIGHTS[d] * budget)
        total = sum(r["n_tokens"] for r in rows)
        longest = max(r["n_tokens"] for r in rows)
        # exclusive-prefix rule: total may overshoot by at most the last doc
        assert total < bd + longest
        # and the selection is maximal: the last kept doc's exclusive
        # prefix was still under budget
        last = max(rows, key=lambda r: (r["rank"], r["doc_id"]))
        assert total - last["n_tokens"] < bd


def test_mixture_deterministic_under_repartition(spark):
    d = _docs(spark)
    a = sorted(r["doc_id"] for r in mixture_select(d, WEIGHTS, 150).collect())
    b = sorted(
        r["doc_id"]
        for r in mixture_select(d.repartition(13), WEIGHTS, 150).collect()
    )
    assert a == b and len(a) > 0


def test_packing_spans_partition_docs_and_fill_sequences(spark):
    L = 16
    sel = mixture_select(_docs(spark), WEIGHTS, 300)
    spans = pack_sequences(sel, L).collect()
    sel_rows = {r["doc_id"]: r["n_tokens"] for r in sel.collect()}

    # every selected doc's spans tile [0, n_tokens) exactly
    by_doc = {}
    for s in spans:
        by_doc.setdefault(s["doc_id"], []).append(s)
    assert set(by_doc) == set(sel_rows)
    for doc, ss in by_doc.items():
        ss = sorted(ss, key=lambda s: s["doc_offset"])
        assert ss[0]["doc_offset"] == 0
        pos = 0
        for s in ss:
            assert s["doc_offset"] == pos
            assert s["span_len"] > 0
            pos += s["span_len"]
        assert pos == sel_rows[doc]

    # every sequence except the last is exactly full
    by_seq = {}
    for s in spans:
        by_seq[s["seq_id"]] = by_seq.get(s["seq_id"], 0) + s["span_len"]
    last = max(by_seq)
    assert sorted(by_seq) == list(range(last + 1))  # contiguous seq ids
    for sid, tot in by_seq.items():
        if sid != last:
            assert tot == L, (sid, tot)
    assert 0 < by_seq[last] <= L


def test_packing_matches_single_window_reference(spark):
    """Two-phase bucket prefix sum == the naive global-window offsets."""
    sel = mixture_select(_docs(spark, n=200), WEIGHTS, 400)
    got = {
        (r["doc_id"], r["seq_id"]): (r["seq_offset"], r["doc_offset"], r["span_len"])
        for r in pack_sequences(sel, 19).collect()
    }
    rows = sorted(sel.collect(), key=lambda r: (r["rank"], r["doc_id"]))
    start = 0
    want = {}
    for r in rows:
        for sid in range(start // 19, (start + r["n_tokens"] - 1) // 19 + 1):
            a = max(start, sid * 19)
            b = min(start + r["n_tokens"], (sid + 1) * 19)
            want[(r["doc_id"], sid)] = (a - sid * 19, a - start, b - a)
        start += r["n_tokens"]
    assert got == want


def test_packing_plan_has_no_global_window(spark):
    """The per-row prefix sum must be partitioned (by md5 bucket); only the
    256-row bucket-totals frame may use an unpartitioned window."""
    sel = mixture_select(_docs(spark), WEIGHTS, 300)
    out = pack_sequences(sel, 16)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # r08: the post-checkpoint plan has NO Window node at all — the
    # bucket-base prefix sum is an aggregate-HOF fold over the <=256-row
    # totals array, so "WindowExec: No Partition Defined" never fires and
    # the warning stays a reliable log grep for real global-window
    # regressions. The row-bearing windows live BEFORE the lineage-
    # truncating localCheckpoint; audit them via the exposed handle.
    assert "WindowExec" not in plan and "windowspecdefinition" not in plan

    pre = out._vs_precheckpoint._jdf.queryExecution().optimizedPlan().toString()
    pre_windows = [
        ln for ln in pre.splitlines() if "windowspecdefinition" in ln
    ]
    assert pre_windows, "phase-1/mixture windows should appear pre-checkpoint"
    import re

    for ln in pre_windows:
        # every window node is partitioned: the optimized-plan Window prints
        # `Window [exprs], [partitionExprs], [orderExprs]` — an empty
        # partition list (`], [], [`) is the global-window anti-pattern
        assert not re.search(r"\], \[\], \[", ln), ln


def test_prefilter_is_exact_including_fallback(spark):
    """The rank-prefix prefilter returns the IDENTICAL selection at every
    margin — generous (prefix covers the budget), huge (keeps everything),
    and deliberately starved (forces the per-domain unfiltered fallback)."""
    d = _docs(spark, n=400)
    base = sorted(map(tuple, mixture_select(d, WEIGHTS, 300).collect()))
    for margin in (2.0, 50.0, 0.05):
        got = sorted(
            map(
                tuple,
                mixture_select(
                    d, WEIGHTS, 300, prefilter_margin=margin
                ).collect(),
            )
        )
        assert got == base, margin


def test_prefilter_actually_prunes_the_sort_input(spark):
    """At a modest margin over a large domain the windowed row count is a
    fraction of the domain (the point of the knob) — checked via the
    selection's rank ceiling sitting far below the domain's max rank."""
    rows = [(i, "w " * 5, "a") for i in range(5000)]
    d = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    # budget 500 tokens of ~25,000 → keep ~2% of the rank space at m=2
    sel = mixture_select(d, {"a": 1.0}, 500, prefilter_margin=2.0)
    base = mixture_select(d, {"a": 1.0}, 500)
    assert sorted(map(tuple, sel.collect())) == sorted(
        map(tuple, base.collect())
    )


# ---- repeat-factor upsampling (mixture_select_with_repeats) ----


def test_repeats_reduces_to_mixture_select_when_budget_fits(spark):
    """No domain over-budget → output IS mixture_select's + copy_id 0
    (copy 0 keeps the exact mixture_select rank)."""
    from volga_spark.operators.packing import mixture_select_with_repeats

    d = _docs(spark)
    up = mixture_select_with_repeats(d, WEIGHTS, 200)
    base = mixture_select(d, WEIGHTS, 200)
    assert {r["copy_id"] for r in up.collect()} == {0}
    a = sorted(map(tuple, up.drop("copy_id").collect()))
    b = sorted(map(tuple, base.collect()))
    assert a == b and len(a) > 0


def test_repeats_hit_the_budget_plain_mixture_undershoots(spark):
    """The knob's reason to exist: a domain whose corpus is smaller than
    its budget reaches the budget via full passes + remainder; plain
    mixture_select silently undershoots to the corpus size."""
    from volga_spark.operators.packing import mixture_select_with_repeats

    d = _docs(spark)  # domains 'a' and 'b': 30 docs, ~240 tokens each
    w = {"a": 0.9, "b": 0.1}
    budget = 1500  # a-budget 1350 ≈ 5.6 passes of 'a'; b-budget 150 < corpus
    base_tot = sum(
        r["n_tokens"]
        for r in mixture_select(d, w, budget).collect()
        if r["domain"] == "a"
    )
    assert base_tot < 1350  # the undershoot

    up = mixture_select_with_repeats(d, w, budget).collect()
    by_d = {}
    for r in up:
        by_d.setdefault(r["domain"], []).append(r)
    tot = sum(r["n_tokens"] for r in by_d["a"])
    longest = max(r["n_tokens"] for r in by_d["a"])
    assert 1350 <= tot < 1350 + longest  # budget met, overshoot < last doc
    # every doc appears n_full or n_full + 1 times; ranks all distinct
    from collections import Counter

    cnt = Counter(r["doc_id"] for r in by_d["a"])
    n_full = min(cnt.values())
    assert set(cnt.values()) <= {n_full, n_full + 1} and n_full >= 4
    ranks = [r["rank"] for r in by_d["a"]]
    assert len(set(ranks)) == len(ranks)
    # domain under budget stays a plain single-pass selection
    assert {r["copy_id"] for r in by_d["b"]} == {0}


def test_repeats_matches_duckdb_twin(spark, sf_dir):
    from volga_spark.operators.packing import (
        mixture_repeats_oracle_sql,
        mixture_select_with_repeats,
    )
    from volga_spark.oracle import compare_frames, run_oracle
    from volga_spark.tables import load_table

    w = {"src0": 0.6, "src1": 0.3, "src2": 0.1}
    budget = 6000  # src0 budget 3600 >> its sf0.01 corpus → real upsampling
    docs = load_table(spark, sf_dir, "documents")
    got = mixture_select_with_repeats(docs, w, budget).toPandas()
    want = run_oracle(
        mixture_repeats_oracle_sql("SELECT * FROM documents", w, budget),
        sf_dir,
    )
    assert (got["copy_id"] > 0).any()  # the upsampled path is exercised
    assert not compare_frames(got, want)


def test_repeats_deterministic_under_repartition(spark):
    from volga_spark.operators.packing import mixture_select_with_repeats

    d = _docs(spark)
    w = {"a": 0.8, "b": 0.2}
    a = sorted(
        map(tuple, mixture_select_with_repeats(d, w, 1500).collect())
    )
    b = sorted(
        map(
            tuple,
            mixture_select_with_repeats(d.repartition(13), w, 1500).collect(),
        )
    )
    assert a == b and len(a) > 0


def test_repeats_guard_raises_on_degenerate_plan(spark):
    """r14: the pass plan is derived in-plan (no driver collect), so the
    max_repeats guard is an assert_true folded into the plan's n_full
    column — it fires on EXECUTION with the same max_repeats message."""
    import pytest

    from volga_spark.operators.packing import mixture_select_with_repeats

    d = _docs(spark, n=8)  # tiny corpus
    with pytest.raises(Exception, match="max_repeats"):
        mixture_select_with_repeats(d, {"a": 1.0}, 10_000_000).collect()


def test_repeats_exact_multiple_budget_is_full_passes_only(spark):
    """rem == 0 (budget an exact multiple of the domain total): the output
    is exactly n_full full passes — no remainder rows, and the remainder
    window's input is pruned in-plan (the __rem > 0 filter restores the
    old driver-side early-exit)."""
    from volga_spark.operators.packing import mixture_select_with_repeats

    rows = [(i, "t1 t2 t3 t4", "a") for i in range(3)]  # T_a = 12 tokens
    d = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    got = mixture_select_with_repeats(d, {"a": 1.0}, 24).collect()  # 2 x T_a
    assert {r["copy_id"] for r in got} == {0, 1}
    assert len(got) == 6  # every doc exactly twice
    assert sum(r["n_tokens"] for r in got) == 24


def test_repeats_compose_with_pack_sequences(spark):
    """The documented composition: upsampled selection → scalar (doc, copy)
    key → pack_sequences. Spans tile every copy's token run exactly and
    all sequences except the last are full — repeated copies are ordinary
    stream elements."""
    from volga_spark.operators.packing import (
        mixture_select_with_repeats,
        pack_sequences,
    )

    d = _docs(spark)
    up = mixture_select_with_repeats(d, {"a": 0.8, "b": 0.2}, 1500)
    keyed = up.withColumn("sid", F.col("doc_id") * 100 + F.col("copy_id"))
    spans = pack_sequences(keyed, seq_len=64, id_col="sid").toPandas()

    per_sid = spans.groupby("sid").span_len.sum()
    want = {
        r["doc_id"] * 100 + r["copy_id"]: r["n_tokens"] for r in up.collect()
    }
    assert dict(per_sid) == want  # every copy fully placed, nothing twice

    per_seq = spans.groupby("seq_id").span_len.sum().sort_index()
    assert (per_seq.iloc[:-1] == 64).all()  # all but the last full
    assert 0 < per_seq.iloc[-1] <= 64


# --- multi-phase training schedule (r08) ---

PHASES = [
    {"name": "base", "weights": {"src0": 0.5, "src1": 0.3, "src2": 0.2},
     "token_budget": 2400},
    {"name": "anneal", "weights": {"src0": 0.8, "src3": 0.2},
     "token_budget": 900},
]


def test_phase_schedule_matches_duckdb_twin(spark, sf_dir):
    from volga_spark.operators.packing import (
        phase_schedule,
        phase_schedule_oracle_sql,
    )
    from volga_spark.oracle import compare_frames, run_oracle
    from volga_spark.tables import load_table

    sf = sf_dir
    docs = load_table(spark, sf, "documents")
    for seq_len in (None, 64):
        got = phase_schedule(docs, PHASES, seq_len=seq_len).toPandas()
        want = run_oracle(
            phase_schedule_oracle_sql(
                "SELECT * FROM documents", PHASES, seq_len=seq_len
            ),
            sf,
        )
        assert compare_frames(got, want) == [], f"seq_len={seq_len}"


def test_phase_schedule_phases_isolated_and_budgeted(spark):
    """Editing one phase's recipe must not perturb another's selection
    (phase-scoped seeds), and each phase honors its own budgets."""
    from volga_spark.operators.packing import domain_budgets, phase_schedule

    LOCAL_PHASES = [
        {"name": "base", "weights": {"a": 0.5, "b": 0.3, "c": 0.2},
         "token_budget": 240},
        {"name": "anneal", "weights": {"a": 0.8, "b": 0.2},
         "token_budget": 90},
    ]
    docs = _docs(spark)
    a = phase_schedule(docs, LOCAL_PHASES)
    changed = [LOCAL_PHASES[0], {**LOCAL_PHASES[1], "token_budget": 30}]
    b = phase_schedule(docs, changed)
    pa = a.filter("phase = 'base'").orderBy("doc_id").collect()
    pb = b.filter("phase = 'base'").orderBy("doc_id").collect()
    assert pa == pb  # phase 0 untouched by phase 1's edit
    # per-phase, per-domain exclusive-prefix budget bound (the
    # mixture_select invariant, re-checked through the schedule wrapper)
    import collections

    for i, ph in enumerate(LOCAL_PHASES):
        budgets = domain_budgets(ph["weights"], ph["token_budget"])
        rows = a.filter(F.col("phase_idx") == i).collect()
        assert rows, ph["name"]
        by_dom = collections.defaultdict(list)
        for r in rows:
            by_dom[r["domain"]].append((r["rank"], r["n_tokens"]))
        for dom, xs in by_dom.items():
            xs.sort()
            run = 0
            for _, nt in xs:
                assert run < budgets[dom]  # exclusive prefix under budget
                run += nt


def test_phase_schedule_validation(spark):
    from volga_spark.operators.packing import phase_schedule

    docs = _docs(spark)
    import pytest

    with pytest.raises(ValueError):
        phase_schedule(docs, [])
    with pytest.raises(ValueError):
        phase_schedule(docs, [PHASES[0], {**PHASES[1], "name": "base"}])
    # review-pass guards: silent zero-row phases and degenerate seq_len
    with pytest.raises(ValueError):
        phase_schedule(docs, [{"name": "p", "weights": {}, "token_budget": 10}])
    with pytest.raises(ValueError):
        phase_schedule(docs, [{"name": "p", "weights": {"a": 1.0},
                               "token_budget": 0}])
    with pytest.raises(ValueError):
        phase_schedule(docs, PHASES, seq_len=0)
    # None / non-numeric token_budget: the SAME descriptive ValueError,
    # not a TypeError out of int()
    with pytest.raises(ValueError, match="token_budget"):
        phase_schedule(docs, [{"name": "p", "weights": {"a": 1.0},
                               "token_budget": None}])
    with pytest.raises(ValueError, match="token_budget"):
        phase_schedule(docs, [{"name": "p", "weights": {"a": 1.0},
                               "token_budget": "lots"}])


def test_phase_schedule_single_scan(spark, sf_dir):
    """r08 verdict #6: P phases must NOT mean P corpus scans. All phase
    ranks ride one pass; the per-phase selections are branches of the
    pinned narrow frame, so the executed plan of the union holds ZERO
    parquet scans (only the checkpoint RDD scan — the one corpus read
    happened at materialization)."""
    from volga_spark.operators.packing import phase_schedule
    from volga_spark.tables import load_table

    out = phase_schedule(load_table(spark, sf_dir, "documents"), PHASES)
    out.count()  # finalize AQE
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") == 0, plan
    assert "Scan ExistingRDD" in plan


def test_phase_schedule_quoted_name_oracle_safe(spark, sf_dir):
    """A phase name containing a quote must not break (or inject into)
    the DuckDB twin — escaped as a doubled quote."""
    from volga_spark.operators.packing import (
        phase_schedule,
        phase_schedule_oracle_sql,
    )
    from volga_spark.oracle import compare_frames, run_oracle
    from volga_spark.tables import load_table

    phases = [{"name": "don't-anneal", "weights": {"src0": 1.0},
               "token_budget": 500}]
    docs = load_table(spark, sf_dir, "documents")
    got = phase_schedule(docs, phases).toPandas()
    want = run_oracle(
        phase_schedule_oracle_sql("SELECT * FROM documents", phases), sf_dir
    )
    assert compare_frames(got, want) == [] and len(got) > 0


# --- in-context-pretraining ordering (r09) ---


def test_context_order_matches_duckdb_twin(spark, sf_dir):
    from volga_spark.operators.packing import (
        context_order,
        context_order_oracle_sql,
    )
    from volga_spark.oracle import compare_frames, run_oracle
    from volga_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    got = context_order(docs).toPandas()
    want = run_oracle(
        context_order_oracle_sql("SELECT doc_id, text, source FROM documents"),
        sf_dir,
    )
    assert len(got) > 0
    assert compare_frames(got, want) == []


def test_context_order_rank_orders_like_simhash(spark, sf_dir):
    """The 16-hex rank string sorts exactly like the signed simhash bigint
    (the property pack_sequences' string ordering relies on)."""
    from volga_spark.operators.packing import context_order
    from volga_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    rows = context_order(docs).select("rank", "simhash").collect()
    assert all(len(r["rank"]) == 16 for r in rows)
    by_rank = sorted(rows, key=lambda r: r["rank"])
    by_sim = sorted(rows, key=lambda r: (r["simhash"], r["rank"]))
    assert [r["simhash"] for r in by_rank] == [r["simhash"] for r in by_sim]


def test_context_order_improves_sequence_locality(spark, sf_dir):
    """The ICLM point: packing under the simhash order puts lexically
    closer documents adjacent within a sequence than the md5 shuffle does
    (mean Hamming distance of in-sequence neighbors strictly lower)."""
    import itertools

    from volga_spark.operators.packing import (
        context_order,
        pack_boundaries,
        pack_sequences,
    )
    from volga_spark.operators.sampling import _rank
    from volga_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    ctx = context_order(docs)
    sims = {r["doc_id"]: r["simhash"] for r in ctx.select("doc_id", "simhash").collect()}

    def mean_adjacent_hamming(ordered):
        packed = pack_boundaries(pack_sequences(ordered, 512))
        dists = []
        for row in packed.select("bounds").collect():
            ids = [b["doc_id"] for b in row["bounds"]]
            for a, b in itertools.pairwise(ids):
                if a != b:
                    dists.append(bin(sims[a] ^ sims[b]).count("1"))
        return sum(dists) / len(dists)

    shuffled = ctx.withColumn("rank", _rank("doc_id", "vs-ctx-baseline"))
    h_ctx = mean_adjacent_hamming(ctx)
    h_rand = mean_adjacent_hamming(shuffled)
    assert h_ctx < h_rand, (h_ctx, h_rand)


def test_context_order_deterministic_under_repartition(spark, sf_dir):
    from volga_spark.operators.packing import context_order
    from volga_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    a = {r["doc_id"]: r["rank"] for r in context_order(docs).collect()}
    b = {
        r["doc_id"]: r["rank"]
        for r in context_order(docs.repartition(13)).collect()
    }
    assert a == b


def test_context_rank_formula_edge_values(spark):
    """The hi/lo %08x rank arithmetic at int64 extremes: both engines'
    expressions must equal the python reference (sim >> 32 arithmetic) and
    preserve order — the property the packer's string sort relies on."""
    import duckdb

    vals = [
        -(1 << 63), -(1 << 63) + 1, -4294967296, -4294967295, -2, -1,
        0, 1, 4294967295, 4294967296, (1 << 62), (1 << 63) - 1,
    ]

    def py_rank(sim):
        return f"{(sim >> 32) + (1 << 31):08x}{sim & 0xFFFFFFFF:08x}"

    want = [py_rank(v) for v in vals]

    df = spark.createDataFrame([(v,) for v in vals], "simhash long")
    from pyspark.sql import functions as F

    lo = F.expr("simhash & 4294967295")
    hi = F.expr(
        "(simhash - (simhash & 4294967295)) div 4294967296 + 2147483648"
    )
    got_spark = [
        r["r"]
        for r in df.select(
            "simhash",
            F.concat(
                F.format_string("%08x", hi), F.format_string("%08x", lo)
            ).alias("r"),
        )
        .orderBy("simhash")
        .collect()
    ]
    assert got_spark == want

    got_duck = [
        r[0]
        for r in duckdb.sql(
            "SELECT printf('%08x', ((v - (v & 4294967295)) // 4294967296)"
            "              + 2147483648) || printf('%08x', v & 4294967295)"
            " FROM (SELECT unnest(" + str(vals) + ") AS v) ORDER BY v"
        ).fetchall()
    ]
    assert got_duck == want
    assert sorted(want) == want  # rank string order == numeric order


# --- curriculum ordering (r09) ---


def test_curriculum_order_matches_duckdb_twin(spark, sf_dir):
    from volga_spark.operators.packing import (
        curriculum_order,
        curriculum_order_oracle_sql,
    )
    from volga_spark.oracle import compare_frames, run_oracle
    from volga_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    for asc in (True, False):
        got = curriculum_order(docs, "n_chars", ascending=asc).toPandas()
        want = run_oracle(
            curriculum_order_oracle_sql(
                "SELECT doc_id, text, source, n_chars FROM documents",
                "n_chars",
                ascending=asc,
            ),
            sf_dir,
        )
        assert len(got) > 0
        assert compare_frames(got, want) == [], f"ascending={asc}"


def test_curriculum_pack_stream_is_score_sorted(spark, sf_dir):
    """The packed span stream walks the corpus in (score, id) order —
    the curriculum property a trainer consumes."""
    from volga_spark.operators.packing import curriculum_order, pack_sequences
    from volga_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    scores = {r["doc_id"]: r["n_chars"] for r in docs.select("doc_id", "n_chars").collect()}
    spans = pack_sequences(curriculum_order(docs, "n_chars"), 512).collect()
    # global stream position of each span = seq_id * L + seq_offset
    stream = sorted(spans, key=lambda r: (r["seq_id"], r["seq_offset"]))
    doc_first = []
    for r in stream:
        if not doc_first or doc_first[-1] != r["doc_id"]:
            doc_first.append(r["doc_id"])
    keys = [(scores[d], d) for d in doc_first]
    assert keys == sorted(keys)
    # descending flips it
    spans_d = pack_sequences(
        curriculum_order(docs, "n_chars", ascending=False), 512
    ).collect()
    stream_d = sorted(spans_d, key=lambda r: (r["seq_id"], r["seq_offset"]))
    first_d = []
    for r in stream_d:
        if not first_d or first_d[-1] != r["doc_id"]:
            first_d.append(r["doc_id"])
    keys_d = [(-scores[d], d) for d in first_d]
    assert keys_d == sorted(keys_d)


def test_curriculum_order_rejects_float_scores(spark, sf_dir):
    import pytest

    from volga_spark.operators.packing import curriculum_order
    from volga_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "fscore", F.col("n_chars") / 7.0
    )
    with pytest.raises(ValueError, match="integer order column"):
        curriculum_order(docs, "fscore")


def test_int64_rank_sql_property_sweep():
    """Hypothesis sweep: for ANY int64, the DuckDB rendering of
    int64_rank_sql equals the python reference, and string order equals
    numeric order (the contract every rank producer shares)."""
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from volga_spark.operators.packing import int64_rank_sql

    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=-(2**63), max_value=2**63 - 1),
            min_size=2,
            max_size=8,
            unique=True,
        )
    )
    def check(vals):
        rows = duckdb.sql(
            f"SELECT v, {int64_rank_sql('v')} AS r"
            f" FROM (SELECT unnest({vals}) AS v)"
        ).fetchall()
        for v, r in rows:
            assert r == f"{(v >> 32) + (1 << 31):08x}{v & 0xFFFFFFFF:08x}"
        by_rank = sorted(rows, key=lambda t: t[1])
        assert [t[0] for t in by_rank] == sorted(v for v, _ in rows)

    check()


def test_curriculum_rank_spreads_pack_buckets(spark, sf_dir):
    """Regression (r09 review): raw int64 renderings of recipe-scaled
    scores share one hi-half prefix, collapsing pack_sequences' 256-way
    phase-1 decomposition into a single bucket. The score-position bucket
    prefix must spread a ~uniform score domain across many buckets while
    preserving order."""
    from volga_spark.operators.packing import N_BUCKETS_HEX, curriculum_order
    from volga_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    rows = curriculum_order(docs, "n_chars").select("rank", "doc_id").collect()
    prefixes = {r["rank"][:N_BUCKETS_HEX] for r in rows}
    assert len(prefixes) > 16, sorted(prefixes)
    # order still == (score, id) order
    scores = {r["doc_id"]: r["n_chars"] for r in docs.select("doc_id", "n_chars").collect()}
    by_rank = sorted(rows, key=lambda r: (r["rank"], r["doc_id"]))
    keys = [(scores[r["doc_id"]], r["doc_id"]) for r in by_rank]
    assert keys == sorted(keys)


def test_curriculum_oracle_order_property_sweep():
    """Hypothesis sweep over the DuckDB curriculum twin alone: for ANY
    integer score multiset (ties included, both directions), the emitted
    rank strings sort exactly like (key, id) — bucket prefix included."""
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from volga_spark.operators.packing import curriculum_order_oracle_sql

    @settings(max_examples=40, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=-(2**53), max_value=2**53),
            min_size=2,
            max_size=12,
        ),
        st.booleans(),
    )
    def check(scores, asc):
        rows = ", ".join(
            f"({i}, 'w', 'a b c', {s})" for i, s in enumerate(scores)
        )
        sql = curriculum_order_oracle_sql(
            f"SELECT * FROM (VALUES {rows})"
            " t(doc_id, source, text, score)",
            "score",
            ascending=asc,
        )
        got = duckdb.sql(sql).fetchdf()
        by_rank = got.sort_values(["rank", "doc_id"])["doc_id"].tolist()
        key = dict(enumerate(scores))
        want = sorted(
            range(len(scores)),
            key=lambda i: (key[i] if asc else -key[i], i),
        )
        assert by_rank == want, (scores, asc)

    check()
