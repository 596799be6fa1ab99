"""Model-based document quality classification (FineWeb-Edu / DCLM shape).

Modern training-data pipelines gate documents on a LEARNED quality score,
not just heuristics: FineWeb-Edu (Penedo et al. 2024) and DCLM (Li et al.
2024) both train a lightweight classifier on labeled/weak-labeled examples
and keep the corpus above a score threshold — the single highest-impact
curation step in both papers' ablations. The production teacher labels
come from an LLM; everything downstream of the labels is exactly this
module.

Spark-native shape:
- featurize: whitespace tokens → hashing-trick term-frequency vector
  (`HashingTF`, the fastText bag-of-words analog) — JVM-side, map-only,
  fixed 2^18-dim sparse output regardless of vocab, so feature extraction
  never shuffles and never needs a fitted vocabulary (no second pass over
  100 TB).
- train (`train_quality_classifier`): MLlib `LogisticRegression` on a
  LABELED SAMPLE (labels: curated-vs-crawl source pairs, LLM teacher
  scores, or heuristic weak labels from `gopher_quality_flags`). Training
  data is the small side — millions of rows, not the corpus.
- score (`score_quality`): the fitted model broadcasts with the task
  closure; scoring is one map-side `transform` emitting P(high-quality).
  Works unchanged on a streaming DataFrame (Transformer-on-stream, same
  property `operators/mllib.py` pins for LSH).

Weak-label bootstrap (`weak_labels_from_heuristics`) turns the existing
Gopher/C4 rule surface into training labels so the whole loop runs without
external labels — the DCLM "fastText on heuristic positives" recipe.

The reference engine has no ML-training tier; beyond-reference
training-data surface (BASELINE north star).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 1 << 18


def _featurize(df: DataFrame, text_col: str) -> DataFrame:
    from pyspark.ml.feature import HashingTF

    toks = df.withColumn("__toks", F.split(F.col(text_col), " "))
    tf = HashingTF(
        inputCol="__toks", outputCol="__features", numFeatures=FEATURE_DIM
    )
    return tf.transform(toks).drop("__toks")


def weak_labels_from_heuristics(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """label=1 for documents passing the Gopher word-count band + symbol
    and alpha-ratio rules, 0 otherwise — the zero-external-labels
    bootstrap. Swap for LLM teacher scores when available; the training
    and scoring path is identical."""
    from volga_spark.operators.text import gopher_quality_flags

    flags = gopher_quality_flags(text_col)
    ok = (
        flags["g_word_count_ok"].cast("int")
        * flags["g_symbol_ratio_ok"].cast("int")
        * flags["g_alpha_word_ratio_ok"].cast("int")
    )
    return docs.withColumn("label", ok.cast("double"))


@dataclass
class QualityClassifier:
    model: object  # fitted pyspark.ml PipelineModel-compatible transformer

    def save(self, path: str) -> None:
        self.model.write().overwrite().save(path)

    @classmethod
    def load(cls, path: str) -> "QualityClassifier":
        from pyspark.ml.classification import LogisticRegressionModel

        return cls(model=LogisticRegressionModel.load(path))


def train_quality_classifier(
    labeled: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    reg_param: float = 1e-4,
    max_iter: int = 50,
    scratch_dir: str | None = None,
) -> QualityClassifier:
    """Fit logistic regression on (text, label). The input should be a
    bounded labeled sample, not the full corpus — sample upstream.

    `scratch_dir`: where the summary-detach save/load round trip (see the
    comment below) writes its transient model artifact. Defaults to a
    driver-local temp dir, which is correct on local mode and any
    single-filesystem deployment; on a multi-node cluster pass a SHARED
    path (the save is a Spark job — executors write the files)."""
    from pyspark.ml.classification import LogisticRegression

    feats = _featurize(labeled, text_col)
    lr = LogisticRegression(
        featuresCol="__features",
        labelCol=label_col,
        regParam=reg_param,
        maxIter=max_iter,
    )
    # Detach the fitted model from its training-summary object graph before
    # it ever ships in a task closure: a freshly-fit model retains summary →
    # predictions DataFrame → SparkSession, and once any pyspark Observation
    # has run on the session, the session holds a non-serializable
    # ObservationManager — scoring then dies with "Task not serializable" on
    # the transform closure. model.copy() does NOT drop the summary (Scala's
    # copy re-attaches it), so round-trip through disk: a loaded model has
    # no summary by construction. The artifact is a coefficient vector
    # (numFeatures doubles) — trivial I/O, and the same path `save`/`load`
    # use for real model persistence. Pinned by
    # test_scoring_survives_session_observation.
    fitted = lr.fit(feats)
    import shutil
    import tempfile

    from pyspark.ml.classification import LogisticRegressionModel

    tmp = scratch_dir or tempfile.mkdtemp(prefix="volga_lr_")
    try:
        path = os.path.join(tmp, "model")
        fitted.write().overwrite().save(path)
        detached = LogisticRegressionModel.load(path)
    finally:
        if scratch_dir is None:
            shutil.rmtree(tmp, ignore_errors=True)
    return QualityClassifier(model=detached)


def score_quality(
    docs: DataFrame,
    clf: QualityClassifier,
    text_col: str = "text",
    score_col: str = "quality_score",
) -> DataFrame:
    """Append P(label=1) as `score_col`. Map-side only: HashingTF + the
    broadcast model's dot product; no shuffle, no Python in the hot path."""
    feats = _featurize(docs, text_col)
    scored = clf.model.transform(feats)
    # probability is a 2-vector [P(0), P(1)]
    from pyspark.ml.functions import vector_to_array

    return scored.withColumn(
        score_col, vector_to_array("probability").getItem(1)
    ).drop("__features", "rawPrediction", "probability", "prediction")


def quality_filter(
    docs: DataFrame,
    clf: QualityClassifier,
    min_score: float,
    text_col: str = "text",
) -> DataFrame:
    """FineWeb-Edu's keep rule: score ≥ threshold (they keep int(score)≥3
    of 5; for a binary classifier the threshold is the precision/recall
    dial — pick it on a held-out labeled split)."""
    return score_quality(docs, clf, text_col=text_col).filter(
        F.col("quality_score") >= F.lit(float(min_score))
    )
