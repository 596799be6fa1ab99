"""Conversation/SFT prep tier: span-substring invariant, preference-pair
determinism, fingerprint semantics, edge shapes, and plan audits (render +
spans shuffle-free and Python-free; pairs exactly one exchange)."""

from __future__ import annotations

from pyspark.sql import functions as F

from volga_spark.operators.conversations import (
    ChatTemplate,
    conversation_fingerprint,
    loss_spans,
    preference_pairs,
    render_conversations,
    turns_from_documents,
)
from volga_spark.tables import load_table


def _conv(spark, sf_dir, **kw):
    d = load_table(spark, sf_dir, "documents")
    kw.setdefault("system_prompt", "You are a helpful assistant.")
    return turns_from_documents(d, **kw)


def test_span_substring_invariant(spark, sf_dir):
    """Every loss span, cut out of the rendered string, is exactly that
    turn's content — offsets are char-exact, markers stay masked."""
    conv = _conv(spark, sf_dir)
    r = render_conversations(conv)
    j = loss_spans(conv).join(r.select("doc_id", "rendered", "turns"), "doc_id")
    bad = j.select(
        F.expr("substring(rendered, span_start + 1, span_end - span_start)").alias(
            "got"
        ),
        F.expr("filter(turns, t -> t.idx = turn_idx)[0].content").alias("want"),
    ).filter(F.col("got") != F.col("want"))
    assert bad.count() == 0


def test_spans_ordered_disjoint_in_bounds(spark, sf_dir):
    conv = _conv(spark, sf_dir)
    r = render_conversations(conv).select("doc_id", F.length("rendered").alias("n"))
    s = loss_spans(conv, roles=None).join(r, "doc_id")  # all roles
    assert (
        s.filter(
            (F.col("span_start") < 0)
            | (F.col("span_end") < F.col("span_start"))
            | (F.col("span_end") > F.col("n"))
        ).count()
        == 0
    )
    # consecutive turns never overlap: next start >= previous end
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("turn_idx")
    overl = s.withColumn("prev_end", F.lag("span_end").over(w)).filter(
        F.col("prev_end").isNotNull() & (F.col("span_start") < F.col("prev_end"))
    )
    assert overl.count() == 0


def test_unicode_char_offsets(spark):
    """Offsets are CHAR offsets (multi-byte content must not skew them)."""
    rows = [
        (1, "héllo wörld ünïcode déjà vu naïve ça va bien oui et toi alors"),
        (2, "日本語 テスト 多字節 文字 列 の 確認 です ね はい そう です"),
        (3, ""),
        (4, "one"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    conv = turns_from_documents(df, system_prompt="sys", words_per_turn=3)
    r = render_conversations(conv)
    j = loss_spans(conv).join(r.select("doc_id", "rendered", "turns"), "doc_id")
    bad = j.select(
        F.expr("substring(rendered, span_start + 1, span_end - span_start)").alias(
            "got"
        ),
        F.expr("filter(turns, t -> t.idx = turn_idx)[0].content").alias("want"),
    ).filter(F.col("got") != F.col("want"))
    assert bad.count() == 0
    # empty doc still renders: system turn + one empty user turn
    row = r.filter(F.col("doc_id") == 3).select("rendered").first()
    assert row[0] == "<|system|>sys<|end|><|user|><|end|>"


def test_custom_template_and_bos(spark):
    df = spark.createDataFrame([(1, "a b c d")], "doc_id bigint, text string")
    tmpl = ChatTemplate(
        role_open="[", role_close="] ", turn_end="\n", bos="<s>", eos="</s>"
    )
    conv = turns_from_documents(df, words_per_turn=2, system_prompt=None)
    r = render_conversations(conv, template=tmpl)
    assert r.select("rendered").first()[0] == "<s>[user] a b\n[assistant] c d\n</s>"
    j = loss_spans(conv, template=tmpl, roles=("user", "assistant")).join(
        r.select("doc_id", "rendered", "turns"), "doc_id"
    )
    bad = j.select(
        F.expr("substring(rendered, span_start + 1, span_end - span_start)").alias(
            "got"
        ),
        F.expr("filter(turns, t -> t.idx = turn_idx)[0].content").alias("want"),
    ).filter(F.col("got") != F.col("want"))
    assert bad.count() == 0


def test_turn_roles_alternate_and_cap(spark, sf_dir):
    conv = _conv(spark, sf_dir, max_turns=4)
    t = conv.select("doc_id", F.explode("turns").alias("t")).select(
        "doc_id", "t.idx", "t.role"
    )
    assert t.filter(F.col("idx") > 4).count() == 0  # system + <=4 chunks
    wrong = t.filter(
        ((F.col("idx") == 0) & (F.col("role") != "system"))
        | ((F.col("idx") % 2 == 1) & (F.col("idx") > 0) & (F.col("role") != "user"))
        | ((F.col("idx") % 2 == 0) & (F.col("idx") > 0) & (F.col("role") != "assistant"))
    )
    assert wrong.count() == 0


def test_preference_pairs_deterministic_total_order(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    cands = d.select(
        F.expr("doc_id DIV 4").alias("p"),
        F.col("doc_id").alias("c"),
        (F.col("n_chars") % 7).alias("s"),  # plenty of score ties
    )
    a = preference_pairs(cands, prompt_col="p", cand_col="c", score_col="s")
    b = preference_pairs(
        cands.repartition(13).sortWithinPartitions(F.col("c").desc()),
        prompt_col="p",
        cand_col="c",
        score_col="s",
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # chosen strictly dominates rejected in the (score, id) total order
    bad = a.filter(
        (F.col("chosen_score") < F.col("rejected_score"))
        | (
            (F.col("chosen_score") == F.col("rejected_score"))
            & (F.col("chosen_id") <= F.col("rejected_id"))
        )
        | (F.col("margin") != F.col("chosen_score") - F.col("rejected_score"))
    )
    assert bad.count() == 0


def test_preference_pairs_single_candidate_dropped(spark):
    df = spark.createDataFrame(
        [(1, 10, 5), (1, 11, 3), (2, 20, 9)], "p bigint, c bigint, s bigint"
    )
    out = preference_pairs(df, prompt_col="p", cand_col="c", score_col="s")
    rows = {r["p"]: r for r in out.collect()}
    assert set(rows) == {1}
    assert rows[1]["chosen_id"] == 10 and rows[1]["rejected_id"] == 11
    assert rows[1]["margin"] == 2 and rows[1]["n_candidates"] == 2


def _bt_cands(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        F.expr("doc_id DIV 4").alias("p"),
        F.col("doc_id").alias("c"),
        (F.col("n_chars") % 7).alias("s"),  # plenty of score ties
    )


def test_bt_win_counts_rank_identity(spark, sf_dir):
    from volga_spark.operators.conversations import bt_win_counts

    cands = _bt_cands(spark, sf_dir)
    out = bt_win_counts(cands, prompt_col="p", cand_col="c", score_col="s")
    rows = out.collect()
    # wins + losses = n-1; total wins per prompt = C(n,2)
    assert all(r.wins + r.losses == r.n_candidates - 1 for r in rows)
    from collections import defaultdict

    per_p = defaultdict(list)
    for r in rows:
        per_p[r.p].append(r)
    for p, rs in per_p.items():
        n = rs[0].n_candidates
        assert sum(r.wins for r in rs) == n * (n - 1) // 2
        # wins respects the (score, id) total order
        order = sorted(rs, key=lambda r: (r.s, r.c))
        assert [r.wins for r in order] == list(range(n))


def test_bt_margin_pairs_complete_and_twin(spark, sf_dir):
    from volga_spark.operators.conversations import (
        bt_margin_pairs,
        bt_margin_pairs_oracle_sql,
    )
    from volga_spark.oracle import compare_frames, run_oracle

    cands = _bt_cands(spark, sf_dir)
    got = bt_margin_pairs(
        cands, prompt_col="p", cand_col="c", score_col="s", bin_width=2
    )
    # completeness: every prompt emits C(n,2) ordered pairs
    from pyspark.sql import functions as SF

    n_pairs = got.groupBy("p").count()
    n_cands = cands.groupBy("p").agg(SF.count("*").alias("n"))
    j = n_pairs.join(n_cands, "p").filter(
        SF.col("count") != SF.expr("n * (n - 1) div 2")
    )
    assert j.count() == 0
    cands_sql = ("SELECT doc_id // 4 AS p, doc_id AS c, n_chars % 7 AS s"
                 " FROM documents")
    want = run_oracle(
        bt_margin_pairs_oracle_sql(
            cands_sql, prompt_col="p", cand_col="c", score_col="s",
            bin_width=2,
        ),
        sf_dir,
    )
    assert compare_frames(got.toPandas(), want) == []


def test_bt_margin_pairs_stratified_deterministic(spark, sf_dir):
    from volga_spark.operators.conversations import (
        bt_margin_pairs,
        bt_margin_pairs_oracle_sql,
    )
    from volga_spark.oracle import compare_frames, run_oracle

    cands = _bt_cands(spark, sf_dir)
    kw = dict(prompt_col="p", cand_col="c", score_col="s",
              bin_width=2, per_bin=7)
    a = bt_margin_pairs(cands, **kw)
    b = bt_margin_pairs(cands.repartition(13), **kw)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    counts = a.groupBy("margin_bin").count().collect()
    assert all(r["count"] <= 7 for r in counts)
    cands_sql = ("SELECT doc_id // 4 AS p, doc_id AS c, n_chars % 7 AS s"
                 " FROM documents")
    want = run_oracle(
        bt_margin_pairs_oracle_sql(cands_sql, prompt_col="p", cand_col="c",
                                   score_col="s", bin_width=2, per_bin=7),
        sf_dir,
    )
    assert compare_frames(a.toPandas(), want) == []
    import pytest

    with pytest.raises(ValueError, match="bin_width"):
        bt_margin_pairs(cands, prompt_col="p", cand_col="c", score_col="s",
                        bin_width=0)


def test_loss_spans_roles_none_vs_empty(spark):
    """roles=None unmasks every role; roles=() unmasks NOTHING (a
    dynamically-built empty role filter must not silently unmask all)."""
    df = spark.createDataFrame(
        [(1, "a b c d e f")], "doc_id bigint, text string"
    )
    conv = turns_from_documents(df, words_per_turn=3, system_prompt="s")
    assert loss_spans(conv, roles=None).count() == 3  # system + user + asst
    assert loss_spans(conv, roles=()).count() == 0
    assert loss_spans(conv).count() == 1  # default: assistant only


def test_pack_sft_spans_drops_empty_renders(spark):
    """A conversation rendering to '' (empty turns, empty-marker template)
    must not reach the packer: a zero-length stream on a sequence boundary
    would emit a bogus out-of-range segment row."""
    from volga_spark.operators.conversations import pack_sft_spans

    tmpl = ChatTemplate(role_open="", role_close="", turn_end="")
    schema = (
        "doc_id bigint, "
        "turns array<struct<idx:int,role:string,content:string>>"
    )
    rows = [
        (1, []),  # renders to '' — must be excluded entirely
        (2, [(0, "u", "abcd"), (1, "a", "efgh")]),
    ]
    conv = spark.createDataFrame(rows, schema)
    packed, segments = pack_sft_spans(conv, seq_len=4, roles=("a",), template=tmpl)
    seg = segments.collect()
    assert {r["doc_id"] for r in seg} == {2}
    assert all(
        0 <= r["seq_offset"] < 4 and r["span_len"] > 0 for r in seg
    ), seg
    # render = 'uabcd'+'aefgh' (10 chars; markers empty, roles count);
    # the assistant CONTENT 'efgh' spans chars 6..10, straddling the
    # seq_len=4 boundary at 8 — one clipped row per sequence, length
    # conserved (2 + 2 = 4)
    got = {(r["seq_id"], r["seq_start"], r["seq_end"]) for r in packed.collect()}
    assert got == {(1, 2, 4), (2, 0, 2)}, got


def test_pack_sft_spans_property(spark):
    """Hypothesis sweep over random turn shapes, templates (incl. empty
    markers), and seq_len: packed spans conserve unmasked length, stay in
    bounds, and reconstruct every assistant turn's content from the
    assembled sequences — char-exact, across any boundary split."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from volga_spark.operators.conversations import pack_sft_spans

    content = st.text(alphabet="ab é日 ", max_size=8)
    turn = st.tuples(st.sampled_from(["user", "assistant"]), content)
    conv = st.lists(turn, min_size=0, max_size=5)
    marker = st.text(alphabet="<|>#", max_size=3)

    @given(
        st.lists(conv, min_size=1, max_size=6),
        marker,
        marker,
        marker,
        st.integers(min_value=3, max_value=40),
    )
    @settings(max_examples=8, deadline=None)
    def check(convs, ro, rc, te, seq_len):
        tmpl = ChatTemplate(role_open=ro, role_close=rc, turn_end=te)
        rows = [
            (i, [(j, r, c) for j, (r, c) in enumerate(turns)])
            for i, turns in enumerate(convs)
        ]
        df = spark.createDataFrame(
            rows,
            "doc_id bigint, turns array<struct<idx:int,role:string,content:string>>",
        )
        packed, segments = pack_sft_spans(df, seq_len=seq_len, template=tmpl)
        pk = packed.toPandas()
        sg = segments.toPandas()

        # 1. bounds
        assert ((pk.seq_start >= 0) & (pk.seq_start < pk.seq_end)).all()
        assert (pk.seq_end <= seq_len).all()

        # 2. conservation: unmasked chars in == unmasked chars out
        rendered = {
            i: "".join(f"{ro}{r}{rc}{c}{te}" for _, r, c in t) for i, t in rows
        }
        want_unmasked = sum(
            len(c)
            for _, t in rows
            for (_, r, c) in t
            if r == "assistant"
        )
        assert int((pk.seq_end - pk.seq_start).sum()) == want_unmasked

        # 3. reconstruction: lay segments into sequences, then every
        # (doc, turn) span concatenated in stream order == turn content
        seqs: dict[int, list[str]] = {}
        for row in sg.itertuples():
            seqs.setdefault(row.seq_id, []).append(
                (
                    row.seq_offset,
                    rendered[row.doc_id][
                        row.doc_offset : row.doc_offset + row.span_len
                    ],
                )
            )
        seq_text = {
            sid: "".join(s for _, s in sorted(parts))
            for sid, parts in seqs.items()
        }
        got: dict[tuple[int, int], list[str]] = {}
        for row in pk.sort_values(["doc_id", "turn_idx", "seq_id"]).itertuples():
            got.setdefault((row.doc_id, row.turn_idx), []).append(
                seq_text[row.seq_id][row.seq_start : row.seq_end]
            )
        for (did, tidx), pieces in got.items():
            want = next(c for j, r, c in dict(rows)[did] if j == tidx)
            assert "".join(pieces) == want, (did, tidx)

    check()


def test_fingerprint_template_independent_content_sensitive(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e f"), (3, "a b c d e g")],
        "doc_id bigint, text string",
    )
    conv = turns_from_documents(df, words_per_turn=3, system_prompt="s")
    fp = conversation_fingerprint(conv).select("doc_id", "conv_digest").collect()
    d = {r["doc_id"]: r["conv_digest"] for r in fp}
    assert d[1] == d[2] and d[1] != d[3]
    # digest hangs on (role, content) only — not on rendering markers,
    # so it equals itself regardless of the template used downstream
    assert len(d[1]) == 32


def test_plan_render_and_spans_native_shuffle_free(spark, sf_dir):
    conv = _conv(spark, sf_dir)
    for df in (render_conversations(conv), loss_spans(conv)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 0, plan
        assert "Python" not in plan, plan


def test_plan_preference_pairs_single_exchange(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    cands = d.select(
        F.expr("doc_id DIV 4").alias("p"),
        F.col("doc_id").alias("c"),
        F.col("n_chars").alias("s"),
    )
    out = preference_pairs(cands, prompt_col="p", cand_col="c", score_col="s")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert "partial_max" in plan or "partial" in plan.lower(), plan


# ---- packed SFT spans (conversation tier ∘ two-phase packing) ----

_SEQ_LEN = 256


def _packed(spark, sf_dir):
    conv = _conv(spark, sf_dir)
    from volga_spark.operators.conversations import pack_sft_spans

    return pack_sft_spans(conv, seq_len=_SEQ_LEN), conv


def test_packed_spans_conserve_unmasked_length(spark, sf_dir):
    (packed, _), conv = _packed(spark, sf_dir)
    orig = loss_spans(conv)
    total_orig = orig.select(
        F.sum(F.col("span_end") - F.col("span_start")).alias("t")
    ).first()["t"]
    total_packed = packed.select(
        F.sum(F.col("seq_end") - F.col("seq_start")).alias("t")
    ).first()["t"]
    assert total_orig == total_packed and total_orig > 0


def test_packed_spans_in_bounds(spark, sf_dir):
    (packed, _), _ = _packed(spark, sf_dir)
    assert (
        packed.filter(
            (F.col("seq_start") < 0)
            | (F.col("seq_end") <= F.col("seq_start"))
            | (F.col("seq_end") > _SEQ_LEN)
        ).count()
        == 0
    )


def test_packed_spans_reconstruct_turn_content(spark, sf_dir):
    """Cut every packed span out of the ASSEMBLED sequence text; per
    (doc, turn), the pieces concatenated in stream order must equal the
    turn's content exactly — the whole pipeline (render → pack → re-base)
    proved end-to-end on real strings."""
    (packed, segments), conv = _packed(spark, sf_dir)
    r = render_conversations(conv).select("doc_id", "rendered", "turns")
    seq_text = (
        segments.join(r.select("doc_id", "rendered"), "doc_id")
        .select(
            "seq_id",
            "seq_offset",
            F.expr("substring(rendered, doc_offset + 1, span_len)").alias("piece"),
        )
        .groupBy("seq_id")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("seq_offset", "piece"))),
                    lambda s: s["piece"],
                ),
            ).alias("seq_text")
        )
    )
    pieces = (
        packed.join(seq_text, "seq_id")
        .select(
            "doc_id",
            "turn_idx",
            "seq_id",
            "seq_start",
            F.expr(
                "substring(seq_text, seq_start + 1, seq_end - seq_start)"
            ).alias("piece"),
        )
        .groupBy("doc_id", "turn_idx")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("seq_id", "seq_start", "piece"))
                    ),
                    lambda s: s["piece"],
                ),
            ).alias("rebuilt")
        )
    )
    want = conv.select(
        "doc_id", F.explode("turns").alias("t")
    ).select("doc_id", F.col("t.idx").alias("turn_idx"), F.col("t.content").alias("content"))
    bad = pieces.join(want, ["doc_id", "turn_idx"]).filter(
        F.col("rebuilt") != F.col("content")
    )
    assert bad.count() == 0


def test_packed_spans_match_duckdb_twin(spark, sf_dir):
    """Full independence: DuckDB recomputes render, spans, the GLOBAL-window
    packing (vs Spark's two-phase bucket prefix sum), and the interval
    intersection — every packed span must match exactly."""
    from volga_spark.operators.packing import pack_sequences_oracle_sql
    from volga_spark.oracle import compare_frames, run_oracle

    (packed, _), _ = _packed(spark, sf_dir)
    got = packed.toPandas()

    base = """
        WITH w AS (
            SELECT doc_id, string_split(coalesce(text, ''), ' ') AS ws
            FROM documents
        ),
        tok AS (
            SELECT doc_id, unnest(ws) AS word, generate_subscripts(ws, 1) AS i
            FROM w
        ),
        chunk AS (
            SELECT doc_id, CAST((i - 1) // 12 AS INT) AS ci,
                   string_agg(word, ' ' ORDER BY i) AS content
            FROM tok WHERE (i - 1) // 12 < 8
            GROUP BY doc_id, CAST((i - 1) // 12 AS INT)
        ),
        turns AS (
            SELECT doc_id, 0 AS idx, 'system' AS role,
                   'You are a helpful assistant.' AS content FROM w
            UNION ALL
            SELECT doc_id, ci + 1,
                   CASE WHEN ci % 2 = 0 THEN 'user' ELSE 'assistant' END, content
            FROM chunk
        ),
        off AS (
            SELECT doc_id, idx, role, content,
                   coalesce(sum(2 + length(role) + 2 + length(content) + 7)
                       OVER (PARTITION BY doc_id ORDER BY idx
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS pos
            FROM turns
        ),
        rendered AS (
            SELECT doc_id,
                   string_agg('<|' || role || '|>' || content || '<|end|>',
                              '' ORDER BY idx) AS r
            FROM turns GROUP BY doc_id
        )
    """
    selected_sql = (
        base
        + """
        SELECT doc_id, 'sft' AS domain, CAST(length(r) AS BIGINT) AS n_tokens,
               md5('volga-sft-pack:' || CAST(doc_id AS VARCHAR)) AS rank
        FROM rendered
    """
    )
    segs_sql = pack_sequences_oracle_sql(selected_sql, _SEQ_LEN)
    twin = (
        base
        + f""",
        spans AS (
            SELECT doc_id, idx AS turn_idx, role,
                   pos + 2 + length(role) + 2 AS span_start,
                   pos + 2 + length(role) + 2 + length(content) AS span_end
            FROM off WHERE role = 'assistant'
        ),
        segs AS ({segs_sql})
        SELECT g.seq_id, g.doc_id, s.turn_idx, s.role,
               CAST(g.seq_offset + GREATEST(g.doc_offset, s.span_start)
                    - g.doc_offset AS BIGINT) AS seq_start,
               CAST(g.seq_offset
                    + LEAST(g.doc_offset + g.span_len, s.span_end)
                    - g.doc_offset AS BIGINT) AS seq_end
        FROM segs g JOIN spans s ON s.doc_id = g.doc_id
        WHERE LEAST(g.doc_offset + g.span_len, s.span_end)
                > GREATEST(g.doc_offset, s.span_start)
    """
    )
    problems = compare_frames(got, run_oracle(twin, sf_dir))
    assert not problems, problems


def test_conversation_prep_stream_equals_batch(spark, sf_dir):
    """The whole map-side conversation path (turns → render → spans →
    fingerprint) runs UNCHANGED on a Structured Streaming frame and emits
    the identical row set — the one-config-N-modes property: an SFT-prep
    pipeline defined once serves both the backfill scan and the live
    ingest feed."""
    import os
    import shutil
    import tempfile
    import uuid

    from volga_spark.streaming.runner import run_available_now_to_memory

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def prep(df):
        conv = turns_from_documents(df, system_prompt="sys")
        r = conversation_fingerprint(render_conversations(conv))
        spans = loss_spans(conv)
        return spans.join(
            r.select("doc_id", F.length("rendered").alias("rlen"), "conv_digest"),
            "doc_id",
        )

    batch = prep(docs).toPandas()

    root = os.path.join(
        tempfile.gettempdir(), "volga_spark_conv_stream", uuid.uuid4().hex[:8]
    )
    os.makedirs(root, exist_ok=True)
    try:
        pdf = docs.orderBy("doc_id").toPandas()
        per = (len(pdf) + 2) // 3
        for i in range(3):
            spark.createDataFrame(pdf.iloc[i * per : (i + 1) * per]).coalesce(
                1
            ).write.mode("overwrite").parquet(os.path.join(root, f"chunk{i}"))
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(root, "chunk*"))
        )
        streamed = run_available_now_to_memory(
            prep(stream), output_mode="append"
        ).toPandas()
    finally:
        shutil.rmtree(root, ignore_errors=True)

    key = ["doc_id", "turn_idx"]
    b = batch.sort_values(key).reset_index(drop=True)
    s = streamed.sort_values(key).reset_index(drop=True)
    assert len(b) == len(s) > 0
    for col in b.columns:
        assert b[col].tolist() == s[col].tolist(), col


def test_best_of_n_consistent_with_pairs(spark, sf_dir):
    """best_of_n(n=1) picks exactly preference_pairs' chosen candidate (one
    total order across the tier), the keep set is bounded and deterministic
    under repartition, and a DuckDB window twin agrees."""
    from volga_spark.operators.conversations import best_of_n
    from volga_spark.oracle import compare_frames, run_oracle

    d = load_table(spark, sf_dir, "documents")
    cands = d.select(
        F.expr("doc_id DIV 4").alias("p"),
        F.col("doc_id").alias("c"),
        (F.col("n_chars") % 7).alias("s"),
    )
    top1 = best_of_n(cands, prompt_col="p", cand_col="c", score_col="s", n=1)
    pairs = preference_pairs(cands, prompt_col="p", cand_col="c", score_col="s")
    # join on BOTH (p, chosen_id): every pair row's chosen must be the n=1
    # pick for that prompt (a p-only join would count rows regardless)
    agree = (
        top1.select("p", F.col("c").alias("chosen_id"))
        .join(pairs.select("p", "chosen_id"), ["p", "chosen_id"])
        .count()
    )
    n_pairs = pairs.count()
    assert n_pairs > 0 and agree == n_pairs
    # and the reverse direction, restricted to prompts that HAVE a pair
    # (a one-candidate prompt yields a top1 row but legitimately no pair)
    assert (
        top1.select("p", "c")
        .join(pairs.select("p"), "p", "left_semi")
        .exceptAll(pairs.select("p", F.col("chosen_id").alias("c")))
        .count()
        == 0
    )

    top2 = best_of_n(cands, prompt_col="p", cand_col="c", score_col="s", n=2)
    assert top2.groupBy("p").count().filter(F.col("count") > 2).count() == 0
    again = best_of_n(
        cands.repartition(17), prompt_col="p", cand_col="c", score_col="s", n=2
    )
    assert top2.exceptAll(again).count() == 0 and again.exceptAll(top2).count() == 0

    twin = """
        SELECT p, c, s, pick_rank FROM (
            SELECT doc_id // 4 AS p, doc_id AS c, n_chars % 7 AS s,
                   row_number() OVER (PARTITION BY doc_id // 4
                                      ORDER BY n_chars % 7 DESC, doc_id DESC)
                     AS pick_rank
            FROM documents
        ) WHERE pick_rank <= 2
    """
    problems = compare_frames(
        top2.toPandas(),
        run_oracle(twin, sf_dir),
    )
    assert not problems, problems


def test_null_turn_fields_render_and_spans_stay_aligned(spark):
    """ADVICE r07: a NULL role/content in a caller-supplied turns array must
    not desync render vs spans — both coalesce the field to '' so the span
    substring invariant still holds for every later turn."""
    import pyspark.sql.types as T

    turn_t = T.StructType(
        [
            T.StructField("idx", T.IntegerType()),
            T.StructField("role", T.StringType()),
            T.StructField("content", T.StringType()),
        ]
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("turns", T.ArrayType(turn_t)),
        ]
    )
    conv = spark.createDataFrame(
        [
            (
                1,
                [
                    (0, "user", "hello there"),
                    (1, "assistant", None),  # null content mid-stream
                    (2, None, "who said that"),  # null role mid-stream
                    (3, "assistant", "tail answer"),
                ],
            )
        ],
        schema,
    )
    r = render_conversations(conv)
    rendered = r.select("rendered").first()[0]
    assert rendered is not None and "tail answer" in rendered
    spans = loss_spans(conv, roles=None).join(
        r.select("doc_id", "rendered"), "doc_id"
    )
    rows = spans.select(
        "turn_idx",
        F.expr("substring(rendered, span_start + 1, span_end - span_start)").alias(
            "got"
        ),
    ).collect()
    got = {row["turn_idx"]: row["got"] for row in rows}
    # null content renders as '' and the LATER span offsets are still exact
    assert got == {0: "hello there", 1: "", 2: "who said that", 3: "tail answer"}


def test_preference_pairs_null_scores_excluded(spark):
    """ADVICE r07: null-scored candidates must not be picked as `rejected`
    (struct order sorts NULL first) nor count toward min_candidates."""
    cands = spark.createDataFrame(
        [
            ("p1", "c1", 3.0),
            ("p1", "c2", 1.0),
            ("p1", "c3", None),  # unscored — must be invisible
            ("p2", "c4", 5.0),
            ("p2", "c5", None),  # only one scored candidate -> no pair
        ],
        "prompt string, cand_id string, score double",
    )
    out = preference_pairs(
        cands, prompt_col="prompt", cand_col="cand_id", score_col="score"
    ).collect()
    assert len(out) == 1
    row = out[0]
    assert (row["prompt"], row["chosen_id"], row["rejected_id"]) == (
        "p1",
        "c1",
        "c2",
    )
    assert row["rejected_score"] == 1.0 and row["margin"] == 2.0
    assert row["n_candidates"] == 2  # the null-scored candidate didn't count


def test_turns_from_documents_rejects_degenerate_params(spark, sf_dir):
    """ADVICE r07: max_turns=0 would make sequence() count DOWN; guard."""
    import pytest

    d = load_table(spark, sf_dir, "documents")
    with pytest.raises(ValueError):
        turns_from_documents(d, max_turns=0)
    with pytest.raises(ValueError):
        turns_from_documents(d, words_per_turn=0)


# --- agentic trace tier (r08) ---


def _steps(spark):
    rows = []
    for tid in range(6):
        n = 4 + (tid % 4)  # 4..7 steps
        for i in range(n):
            role = ["user", "assistant", "tool_call", "tool_result"][i % 4]
            content = f"t{tid} step {i} payload"
            if role == "tool_result" and tid == 2:
                content = "ERROR: tool exploded"
            rows.append((tid, i, role, content))
    # trace 5: truncated before any tool_result (only 4 steps for tid%4==1
    # is fine; craft one with 3 steps = no tool loop completion)
    rows = [r for r in rows if not (r[0] == 5 and r[1] >= 3)]
    return spark.createDataFrame(
        rows, "trace_id long, step_idx int, role string, content string"
    )


def test_assemble_trajectories_order_invariant(spark):
    """Assembly is deterministic under any partitioning/arrival order: the
    sort_array on (step, role, content) rebuilds the same turns array."""
    from volga_spark.operators.conversations import assemble_trajectories

    steps = _steps(spark)
    a = assemble_trajectories(steps).orderBy("trace_id").collect()
    b = (
        assemble_trajectories(steps.orderBy(F.rand(7)).repartition(13))
        .orderBy("trace_id")
        .collect()
    )
    assert a == b
    by_id = {r["trace_id"]: r["turns"] for r in a}
    assert [t["idx"] for t in by_id[0]] == [0, 1, 2, 3]
    assert [t["role"] for t in by_id[0]] == [
        "user",
        "assistant",
        "tool_call",
        "tool_result",
    ]


def test_trace_outcome_gate_drops_failed_and_incomplete(spark):
    """The outcome gate keeps only traces that completed the tool loop
    (>=1 tool_result) with no ERROR result."""
    from volga_spark.operators.conversations import (
        assemble_trajectories,
        trace_outcome_ok,
    )

    traces = assemble_trajectories(_steps(spark))
    kept = sorted(
        r["trace_id"]
        for r in traces.filter(trace_outcome_ok(F.col("turns"))).collect()
    )
    # trace 2 has an ERROR tool_result; trace 5 never reached a tool_result
    assert kept == [0, 1, 3, 4]


def test_tool_policy_masks_results_trains_calls(spark):
    """Role-scoped masking: spans cover assistant + tool_call turns only —
    tool RESULTS (environment text) and prompts stay masked."""
    from volga_spark.operators.conversations import (
        TOOL_TRAINABLE_ROLES,
        assemble_trajectories,
        loss_spans,
        render_conversations,
    )

    traces = assemble_trajectories(_steps(spark))
    spans = loss_spans(traces, id_col="trace_id", roles=TOOL_TRAINABLE_ROLES)
    roles = {r["role"] for r in spans.collect()}
    assert roles == {"assistant", "tool_call"}
    # and each span still cuts the exact content out of the rendered string
    r = render_conversations(traces)
    j = spans.join(r.select("trace_id", "rendered", "turns"), "trace_id")
    bad = j.select(
        F.expr(
            "substring(rendered, span_start + 1, span_end - span_start)"
        ).alias("got"),
        F.expr("filter(turns, t -> t.idx = turn_idx)[0].content").alias("want"),
    ).filter(F.col("got") != F.col("want"))
    assert bad.count() == 0


def test_assemble_trajectories_stream_equals_batch(spark):
    """Streaming trajectory assembly (native session_window + collect_list,
    watermark-driven emission) produces the SAME turns arrays as batch
    assembly for traces whose steps all fall inside one session gap — and
    splits a trace that idles past the gap into per-session partials."""
    import datetime
    import os
    import shutil
    import tempfile
    import uuid

    from volga_spark.operators.conversations import (
        assemble_trajectories,
        assemble_trajectories_stream,
    )
    from volga_spark.streaming.runner import run_available_now_to_memory

    t0 = datetime.datetime(2026, 1, 1, 12, 0, 0)

    def ts(minute):
        return t0 + datetime.timedelta(minutes=minute)

    rows = []
    for tid in range(5):
        for i in range(4 + tid % 3):
            rows.append((tid, i, ["user", "assistant", "tool_call",
                                  "tool_result"][i % 4],
                         f"t{tid} step {i}", ts(tid + i)))
    # trace 99 idles 60min mid-run -> TWO session partials at gap=30min
    rows += [(99, 0, "user", "q", ts(0)), (99, 1, "assistant", "a", ts(1)),
             (99, 2, "user", "q2", ts(61)), (99, 3, "assistant", "a2", ts(62))]
    # punctuation: the watermark can never pass the max REAL event time, so
    # the last open session would never close (the chunked_file_stream
    # flush-row rule); a far-future sentinel step closes everything
    rows += [(-1, 0, "user", "eos", ts(600)), (-1, 1, "user", "eos", ts(700))]
    schema = ("trace_id long, step_idx int, role string, content string, "
              "ts timestamp")
    steps = spark.createDataFrame(rows, schema)

    batch = {
        r["trace_id"]: r["turns"]
        for r in assemble_trajectories(
            steps.filter("trace_id >= 0").drop("ts")
        ).collect()
    }

    root = os.path.join(
        tempfile.gettempdir(), "volga_spark_trace_stream", uuid.uuid4().hex[:8]
    )
    os.makedirs(root, exist_ok=True)
    try:
        pdf = steps.orderBy("ts").toPandas()
        per = (len(pdf) + 2) // 3
        for i in range(3):
            spark.createDataFrame(
                pdf.iloc[i * per : (i + 1) * per], schema
            ).coalesce(1).write.mode("overwrite").parquet(
                os.path.join(root, f"chunk{i}")
            )
        stream = (
            spark.readStream.schema(steps.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(root, "chunk*"))
        )
        out = assemble_trajectories_stream(stream, gap="30 minutes")
        # watermark-only flush (no punctuation rows): the final sessions
        # only emit on the trailing empty batch, which the harness disables
        # by default since r14 — opt back in for this pipeline
        streamed = run_available_now_to_memory(
            out, output_mode="append", no_data_batches=True
        )
        got = [
            (r["trace_id"], r["trace_start"], r["turns"])
            for r in streamed.filter("trace_id >= 0").collect()
        ]
    finally:
        shutil.rmtree(root, ignore_errors=True)

    # every single-session trace matches batch assembly exactly
    per_trace = {}
    for tid, start, turns in got:
        per_trace.setdefault(tid, []).append((start, turns))
    for tid in range(5):
        assert len(per_trace[tid]) == 1
        assert per_trace[tid][0][1] == batch[tid]
    # the idle trace split into two partials covering all 4 steps in order
    parts = sorted(per_trace[99])
    assert len(parts) == 2
    assert [t["idx"] for t in parts[0][1]] == [0, 1]
    assert [t["idx"] for t in parts[1][1]] == [2, 3]


# --- GRPO group advantage normalization (r09) ---


def test_group_advantages_matches_duckdb_twin(spark, sf_dir):
    from volga_spark.operators.conversations import (
        group_advantages,
        group_advantages_oracle_sql,
    )
    from volga_spark.oracle import compare_frames, run_oracle

    cands = _bt_cands(spark, sf_dir)
    got = group_advantages(
        cands, prompt_col="p", cand_col="c", score_col="s"
    ).toPandas()
    want = run_oracle(
        group_advantages_oracle_sql(
            "SELECT doc_id // 4 AS p, doc_id AS c, n_chars % 7 AS s"
            " FROM documents",
            prompt_col="p",
            cand_col="c",
            score_col="s",
        ),
        sf_dir,
    )
    assert len(got) > 0
    assert compare_frames(got, want) == []


def test_group_advantages_numpy_parity_and_zero_sum(spark, sf_dir):
    """advantage == per-group z-score (population std), and both the exact
    integer numerators and the float advantages sum to ~0 per group."""
    import numpy as np

    from volga_spark.operators.conversations import group_advantages

    cands = _bt_cands(spark, sf_dir)
    rows = group_advantages(
        cands, prompt_col="p", cand_col="c", score_col="s"
    ).collect()
    from collections import defaultdict

    per_p = defaultdict(list)
    for r in rows:
        per_p[r.p].append(r)
    assert per_p
    for p, rs in per_p.items():
        scores = np.array([r.s for r in rs], dtype=np.float64)
        mu, sd = scores.mean(), scores.std()  # population std, ddof=0
        assert sd > 0  # zero-variance groups must have been dropped
        want = (scores - mu) / sd
        got = np.array([r.advantage for r in rs])
        assert np.allclose(got, want, rtol=1e-12, atol=1e-12)
        assert sum(r.adv_num for r in rs) == 0
        assert abs(got.sum()) < 1e-9


def test_group_advantages_degenerate_groups(spark):
    """Zero-variance and sub-min_group prompts drop; null scores drop
    before the stats (not counted toward n_candidates)."""
    from volga_spark.operators.conversations import group_advantages

    rows = [
        ("a", 1, 10),  # group a: variance > 0 -> kept
        ("a", 2, 20),
        ("a", 3, None),  # null score: dropped, n_candidates == 2
        ("b", 4, 5),  # group b: zero variance -> dropped
        ("b", 5, 5),
        ("c", 6, 7),  # group c: single candidate -> dropped
    ]
    df = spark.createDataFrame(rows, "p string, c long, s long")
    out = group_advantages(
        df, prompt_col="p", cand_col="c", score_col="s"
    ).collect()
    assert {r.p for r in out} == {"a"}
    assert {r.n_candidates for r in out} == {2}
    by_c = {r.c: r for r in out}
    # n=2, sum=30, sumsq=500: adv_num = 2*s - 30, var_n2 = 1000 - 900 = 100
    assert by_c[1].adv_num == -10 and by_c[2].adv_num == 10
    assert by_c[1].var_n2 == 100
    assert by_c[1].advantage == -1.0 and by_c[2].advantage == 1.0


def test_group_advantages_rejects_float_scores(spark):
    """A double score column must be refused, not silently truncated
    (0.9 and 0.1 would both cast to 0 and the group would vanish as
    zero-variance)."""
    import pytest

    from volga_spark.operators.conversations import group_advantages

    df = spark.createDataFrame(
        [("a", 1, 0.9), ("a", 2, 0.1)], "p string, c long, s double"
    )
    with pytest.raises(ValueError, match="integer score column"):
        group_advantages(df, prompt_col="p", cand_col="c", score_col="s")


def test_group_advantages_oracle_exact_rational_property():
    """Hypothesis sweep over the DuckDB GRPO twin alone: the integer
    sufficient statistics equal exact-rational arithmetic (Fraction), and
    the emitted advantage equals adv_num / sqrt(var_n2) to the bit."""
    import math
    from fractions import Fraction

    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from volga_spark.operators.conversations import group_advantages_oracle_sql

    @settings(max_examples=40, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=-(10**6), max_value=10**6),
            min_size=1,
            max_size=10,
        )
    )
    def check(scores):
        rows = ", ".join(f"(0, {i}, {s})" for i, s in enumerate(scores))
        sql = group_advantages_oracle_sql(
            f"SELECT * FROM (VALUES {rows}) t(prompt_id, cand, score)"
        )
        got = duckdb.sql(sql).fetchdf()
        n = len(scores)
        mean = Fraction(sum(scores), n)
        var = sum((Fraction(s) - mean) ** 2 for s in scores) / n
        if n < 2 or var == 0:
            assert len(got) == 0, scores
            return
        assert len(got) == n
        for _, r in got.iterrows():
            s = scores[int(r["cand"])]
            assert r["adv_num"] == n * s - sum(scores)
            assert r["var_n2"] == n * n * var  # exact integer identity
            assert r["advantage"] == r["adv_num"] / math.sqrt(r["var_n2"])

    check()
