"""Gopher quality-filter rule set (Rae et al. 2021) — crafted documents hit
each rule individually; the scalar subset is additionally DuckDB-oracled
inside q_text_analysis."""

from __future__ import annotations

from volga_spark.operators.text import gopher_quality_flags


def _flags(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    row = df.select(
        *[v.alias(k) for k, v in gopher_quality_flags("text").items()]
    ).first()
    return row.asDict()


def _good_text():
    # 60 words, alphabetic, several required stop words, no symbols
    base = "the quick brown fox jumps over to be of and that have with lazy dogs "
    return (base * 5).strip()


def test_good_document_passes_all(spark):
    f = _flags(spark, _good_text())
    assert all(f.values()), f


def test_word_count_rule(spark):
    f = _flags(spark, "too short to pass the word count with only these")
    assert not f["g_word_count_ok"] and not f["gopher_pass"]


def test_mean_word_length_rule(spark):
    long_words = " ".join(["supercalifragilistic"] * 60)
    assert not _flags(spark, long_words)["g_mean_word_len_ok"]
    short_words = " ".join(["a"] * 60)
    assert not _flags(spark, short_words)["g_mean_word_len_ok"]


def test_symbol_ratio_rule(spark):
    f = _flags(spark, _good_text() + " " + "# # # # # # # # # # # # # # #")
    assert not f["g_symbol_ratio_ok"]


def test_bullet_and_ellipsis_line_rules(spark):
    body = _good_text()
    bullets = "\n".join(f"- bullet line {i}" for i in range(20))
    f = _flags(spark, bullets + "\n" + body.replace(" ", "_"))
    # 20 of 21 lines are bullets → > 90%? 20/21 = 0.95 of LINES, but the
    # rule normalizes by line count: 20/21 > 0.9 → fail
    assert not f["g_bullet_lines_ok"]

    dots = "\n".join(f"line {i} trailing..." for i in range(10))
    f2 = _flags(spark, dots + "\n" + body)
    # 10 of 11 lines end with ... → fail
    assert not f2["g_ellipsis_lines_ok"]


def test_alpha_word_ratio_rule(spark):
    numbers = " ".join(str(i) for i in range(55))
    f = _flags(spark, _good_text() + " " + numbers)
    assert not f["g_alpha_word_ratio_ok"]


def test_required_words_rule(spark):
    no_req = " ".join(["banana"] * 60)
    f = _flags(spark, no_req)
    assert not f["g_required_words_ok"]
    one_req = "the " + " ".join(["banana"] * 60)
    assert not _flags(spark, one_req)["g_required_words_ok"]
    two_req = "the and " + " ".join(["banana"] * 60)
    assert _flags(spark, two_req)["g_required_words_ok"]
