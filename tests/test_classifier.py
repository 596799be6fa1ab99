"""Learned quality classifier: class separation on crafted corpora, weak
labels consistent with the Gopher rules, determinism, save/load parity,
and a JVM-only scoring-plan audit."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from volga_spark.operators.classifier import (
    quality_filter,
    score_quality,
    train_quality_classifier,
    weak_labels_from_heuristics,
)
from volga_spark.operators.text import gopher_quality_flags
from volga_spark.tables import load_table


def _crafted(spark):
    """40 'good' docs (fluent common-word sentences) and 40 'bad'
    (symbol-ridden fragments), deterministic."""
    good_words = "the quick brown fox jumps over a lazy dog and runs far".split()
    rows = []
    for i in range(40):
        words = [good_words[(i + j) % len(good_words)] for j in range(60)]
        rows.append((i, " ".join(words), 1.0))
    for i in range(40):
        frag = " ".join(f"#x{i}{j}## @@{j}!!" for j in range(8))
        rows.append((100 + i, frag, 0.0))
    return spark.createDataFrame(rows, ["doc_id", "text", "label"])


def test_classifier_separates_crafted_classes(spark):
    df = _crafted(spark)
    train = df.filter((F.col("doc_id") % 4) != 0)
    test = df.filter((F.col("doc_id") % 4) == 0)
    clf = train_quality_classifier(train)
    scored = score_quality(test, clf).select("doc_id", "label", "quality_score")
    rows = scored.collect()
    good = [r["quality_score"] for r in rows if r["label"] == 1.0]
    bad = [r["quality_score"] for r in rows if r["label"] == 0.0]
    assert good and bad
    assert min(good) > max(bad), (min(good), max(bad))

    kept = quality_filter(test, clf, min_score=0.5)
    assert kept.count() == len(good)


def test_weak_labels_match_gopher_flag_conjunction(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(300)
    labeled = weak_labels_from_heuristics(docs)
    flags = gopher_quality_flags("text")
    expected = docs.withColumn(
        "e",
        (
            flags["g_word_count_ok"]
            & flags["g_symbol_ratio_ok"]
            & flags["g_alpha_word_ratio_ok"]
        ).cast("double"),
    )
    mism = (
        labeled.join(expected.select("doc_id", "e"), "doc_id")
        .filter(F.col("label") != F.col("e"))
        .count()
    )
    assert mism == 0
    # both classes must be present for the bootstrap to train on
    classes = {r["label"] for r in labeled.select("label").distinct().collect()}
    assert classes == {0.0, 1.0}, classes


def test_scores_deterministic_and_bounded(spark):
    df = _crafted(spark)
    clf = train_quality_classifier(df)
    a = sorted(map(tuple, score_quality(df, clf).select("doc_id", "quality_score").collect()))
    b = sorted(map(tuple, score_quality(df, clf).select("doc_id", "quality_score").collect()))
    assert a == b
    assert all(0.0 <= s <= 1.0 for _, s in a)


def test_save_load_roundtrip(spark):
    from volga_spark.operators.classifier import QualityClassifier

    df = _crafted(spark)
    clf = train_quality_classifier(df)
    path = os.path.join(tempfile.gettempdir(), "volga_spark_clf")
    clf.save(path)
    clf2 = QualityClassifier.load(path)
    a = sorted(map(tuple, score_quality(df, clf).select("doc_id", "quality_score").collect()))
    b = sorted(map(tuple, score_quality(df, clf2).select("doc_id", "quality_score").collect()))
    assert a == b


def test_scoring_plan_stays_jvm_side(spark):
    df = _crafted(spark)
    clf = train_quality_classifier(df)
    scored = score_quality(df, clf)
    scored.count()
    plan = scored._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "Pandas", "PythonUDF"):
        assert marker not in plan, marker


def test_classifier_scores_stream_identically(spark, tmp_path):
    """The fitted classifier scores a streaming frame exactly as it does
    the batch frame — the batch→stream curation-parity property the other
    curation tiers pin, extended to the learned gate."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from volga_spark.streaming.runner import run_available_now_to_memory

    df = _crafted(spark)
    clf = train_quality_classifier(df)

    d = str(tmp_path / "docs")
    os.makedirs(d)
    pdf = df.select("doc_id", "text").toPandas()
    pq.write_table(
        pa.Table.from_pandas(pdf, preserve_index=False),
        os.path.join(d, "part0.parquet"),
    )
    stream = spark.readStream.schema("doc_id bigint, text string").parquet(d)
    streamed = run_available_now_to_memory(
        score_quality(stream, clf).select("doc_id", "quality_score"),
        output_mode="append",
    )
    got = sorted(map(tuple, streamed.collect()))
    want = sorted(
        map(
            tuple,
            score_quality(df, clf).select("doc_id", "quality_score").collect(),
        )
    )
    assert got == want


def test_scoring_survives_session_observation(spark, sf_dir):
    """Regression: a pyspark Observation lazily creates the session's
    ObservationManager (not Serializable); a freshly-fit LR model retains
    summary -> predictions -> session, so shipping it in the transform
    closure then fails with 'Task not serializable'. train_quality_classifier
    must hand back a summary-detached model (save/load round trip)."""
    from pyspark.sql import Observation

    obs = Observation("obs_regression")
    load_table(spark, sf_dir, "orders").observe(
        obs, F.count(F.lit(1)).alias("n")
    ).count()
    assert obs.get["n"] > 0  # manager now exists on the session

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    labeled = docs.withColumn(
        "label", (F.length("text") > 200).cast("double")
    )
    clf = train_quality_classifier(labeled)
    assert score_quality(docs, clf).count() == docs.count()
