"""Model-based quality filtering: the fasttext-style classifier step of
an LLM curation pipeline (CCNet / LLaMA / GPT-3 all gate web text on a
linear classifier over token features), built on Spark MLlib so both
training and scoring are JVM-side and cluster-parallel.

Reference parity note: the reference engine (rafaelleinio/thoth) has no
classifier stage — this is part of the net-new training-data surface
this repo adds on top of its profiling/anomaly scope.

Scale design:
- Features use the hashing trick (``HashingTF``): fixed-width vectors,
  NO vocabulary build — no global distinct pass, no driver-side dict,
  works identically at 100 TB.
- Training is MLlib LogisticRegression: each L-BFGS iteration is one
  ``treeAggregate`` of gradient partials — partial aggregation map-side,
  bounded driver traffic (feature-width-sized vectors, not data-sized).
  Train on a bounded :func:`thoth_spark.operators.sampling.hash_sample`
  at full scale; score the whole corpus with the broadcast model.
- Scoring is a pure per-row JVM transform (no shuffle): the corpus keeps
  its partitioning, so the filter composes with downstream dedup/mixing
  without an exchange.
- Weak labels come from the heuristic :func:`quality_score` — the
  standard bootstrap when no human labels exist (label the extremes,
  drop the ambiguous middle, learn to generalize).
"""

from __future__ import annotations

from pyspark.ml.classification import LogisticRegression, LogisticRegressionModel
from pyspark.ml.feature import HashingTF, RegexTokenizer
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from thoth_spark.operators.text import quality_score

#: token pattern mirroring text.tokens(): lowercase word runs
_TOKEN_PATTERN = r"[a-z0-9']+"


def weak_labels(
    df: DataFrame,
    text_col: str = "text",
    low: float = 0.45,
    high: float = 0.60,
) -> DataFrame:
    """Label the extremes of the heuristic quality distribution (1 above
    ``high``, 0 below ``low``) and DROP the ambiguous middle — the
    classifier learns token-level signal from confident examples only.
    Adds ``label``; keeps all input columns."""
    if not low < high:
        raise ValueError(f"need low < high, got {low} >= {high}")
    scored = quality_score(df, text_col).select(
        *df.columns, "quality_score"
    )
    return (
        scored.where(
            (F.col("quality_score") <= low) | (F.col("quality_score") >= high)
        )
        .withColumn(
            "label", (F.col("quality_score") >= high).cast("double")
        )
        .drop("quality_score")
    )


def _featurize(df: DataFrame, text_col: str, n_features: int) -> DataFrame:
    tok = RegexTokenizer(
        inputCol=text_col,
        outputCol="__tokens",
        pattern=_TOKEN_PATTERN,
        gaps=False,
        toLowercase=True,
    )
    tf = HashingTF(
        inputCol="__tokens", outputCol="__features", numFeatures=n_features
    )
    return tf.transform(tok.transform(df))


def train_quality_classifier(
    df: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    n_features: int = 1 << 15,
    max_iter: int = 30,
    reg_param: float = 1e-3,
) -> LogisticRegressionModel:
    """Train the linear quality classifier on a (weakly) labeled frame.

    ``n_features`` trades hash collisions for model size (the model is
    broadcast to every task at scoring time — keep it megabytes). At
    100 TB, pass a hash-sampled slice: a linear model saturates long
    before the corpus does."""
    feats = _featurize(df, text_col, n_features)
    lr = LogisticRegression(
        featuresCol="__features",
        labelCol=label_col,
        maxIter=max_iter,
        regParam=reg_param,
        standardization=False,
    )
    return lr.fit(feats)


def score_quality(
    df: DataFrame,
    model: LogisticRegressionModel,
    text_col: str = "text",
) -> DataFrame:
    """Score a corpus with a trained classifier: adds ``quality_prob``
    (P(high quality)) and ``quality_pred`` (0/1). Pure map-side JVM
    transform — the corpus partitioning is untouched."""
    from pyspark.ml.functions import vector_to_array

    n_features = model.numFeatures
    feats = _featurize(df, text_col, n_features)
    scored = model.transform(feats)
    second = F.element_at(vector_to_array("probability"), 2)
    return scored.select(
        *df.columns,
        F.round(second, 6).alias("quality_prob"),
        F.col("prediction").cast("int").alias("quality_pred"),
    )
