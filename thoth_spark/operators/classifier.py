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

import math
from dataclasses import dataclass

from pyspark.ml.classification import LogisticRegression, LogisticRegressionModel
from pyspark.ml.feature import HashingTF, RegexTokenizer
from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from thoth_spark.operators.text import quality_score, tokens as text_tokens

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


#: default hashed-feature width for the Naive Bayes variant
NB_DEFAULT_FEATURES = 4096


def _nb_bucket(col: Column, n_features: int) -> Column:
    """md5-derived feature bucket (first 8 hex chars → int, mod width) —
    the same engine-replayable hashing-trick family the samplers and
    MinHash use, so training AND scoring replay exactly in ANSI SQL."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long") % n_features


def balance_labels(
    labeled: DataFrame,
    label_col: str = "label",
    key_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Equal-size classes by deterministic subsampling: each class keeps
    its ``n_min`` smallest-hash rows (hash, then key as tiebreak — the
    same md5 bucket stream the samplers use, so the subset is
    reproducible across runs AND replayable in SQL). The class-count
    lookup is a bounded 2-row collect.

    Balancing matters for Naive Bayes: with imbalanced classes every
    token carries a systematic prior-direction drift that accumulates
    with document length and swamps the signal (measured on the fixture:
    the unbalanced multinomial model predicted one class for ALL docs).

    Scale note: the per-class ``row_number`` sorts each class in one
    task chain — at full corpus scale, first cut the labeled frame down
    with :func:`thoth_spark.operators.sampling.hash_sample` (a linear
    classifier saturates long before the corpus does), or use rate-based
    per-class sampling for approximate balance without the window."""
    from thoth_spark.operators.sampling import _bucket

    counts = {
        r["y"]: r["c"]
        for r in labeled.groupBy(F.col(label_col).alias("y"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    if len(counts) < 2:
        raise ValueError(f"both classes must be present, got counts {counts}")
    n_min = min(counts.values())
    w = W.partitionBy(label_col).orderBy("__b", key_col)
    return (
        labeled.withColumn("__b", _bucket(F.col(key_col), seed))
        .withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= n_min)
        .drop("__b", "__rk")
    )


@dataclass(frozen=True)
class NBQualityModel:
    """Bernoulli Naive Bayes model over hashed DISTINCT-token presence.

    ``weights`` holds ``(f, w)`` per feature seen in training, with
    ``w = log-odds-ratio of presence`` =
    ``ln(p_f1/p_f0) − ln((1−p_f1)/(1−p_f0))`` where
    ``p_fc = (df_fc + k) / (N_c + 2k)`` (per-class document frequency,
    add-k). ``bias`` folds the class prior and every feature's ABSENCE
    term (``Σ_f ln((1−p_f1)/(1−p_f0))``) into one scalar, so a
    document's log-odds is ``bias + Σ_{distinct f present} w[f]`` —
    one broadcast join; ``default_w`` covers features unseen in
    training (exactly 0 for balanced classes).

    Bernoulli (presence/absence), not multinomial (token counts): the
    multinomial likelihood accumulates a per-token drift whenever class
    token totals differ (longer-document classes win on length alone);
    the Bernoulli event model scores each feature once per document and
    prices absence explicitly, which keeps the decision about WHICH
    tokens appear, not how many."""

    weights: DataFrame
    bias: float
    default_w: float
    n_features: int


def train_nb_quality(
    labeled: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    id_col: str = "doc_id",
    n_features: int = NB_DEFAULT_FEATURES,
    add_k: float = 1.0,
) -> NBQualityModel:
    """Train a Bernoulli Naive Bayes quality classifier on a (weakly)
    labeled frame — pair with :func:`balance_labels` first. Unlike the
    L-BFGS logistic regression (:func:`train_quality_classifier`), NB
    training is CLOSED-FORM — one distinct-feature explode + one
    ``groupBy(feature)`` count — so the whole train+score pipeline is
    deterministic and exactly replayable in an ANSI-SQL oracle (the same
    trade the bigram-LM perplexity scorer makes), while remaining a
    standard fasttext-era baseline for corpus quality filtering.

    Driver traffic is bounded: class counts (2 rows) and the absence-
    term/seen-feature aggregate (1 row); the per-feature weight table
    stays distributed and is broadcast at scoring time.

    Both intermediates that multiple downstream jobs read are
    ``localCheckpoint``ed lazily: the labeled frame (typically a
    weak-label quality scan over the corpus) feeds the class-count
    collect AND the feature explode, and the weight table feeds the
    absence-mass aggregate AND the scoring-time broadcast — without the
    checkpoints each consumer re-runs the whole upstream pipeline
    (measured on the bench corpus: the quality scan executed 3×)."""
    labeled = labeled.localCheckpoint(eager=False)
    y = F.col(label_col).cast("int")
    nd = {
        int(r["y"]): r["c"]
        for r in labeled.groupBy(y.alias("y")).agg(F.count(F.lit(1)).alias("c")).collect()
    }
    if nd.get(0, 0) == 0 or nd.get(1, 0) == 0:
        raise ValueError(
            f"both classes must be present in the training frame, got {nd}"
        )
    n1, n0 = float(nd[1]), float(nd[0])
    feats = (
        labeled.select(
            y.alias("y"),
            F.col(id_col).alias("__id"),
            F.explode(F.array_distinct(text_tokens(F.col(text_col)))).alias("__tok"),
        )
        .select("y", "__id", _nb_bucket(F.col("__tok"), n_features).alias("f"))
        .distinct()
    )
    counts = feats.groupBy("f").agg(
        F.sum(F.when(F.col("y") == 1, 1).otherwise(0)).cast("double").alias("d1"),
        F.sum(F.when(F.col("y") == 0, 1).otherwise(0)).cast("double").alias("d0"),
    )
    p1 = (F.col("d1") + add_k) / F.lit(n1 + 2 * add_k)
    p0 = (F.col("d0") + add_k) / F.lit(n0 + 2 * add_k)
    wgt = counts.select(
        "f",
        (F.log(p1 / p0) - F.log((1 - p1) / (1 - p0))).alias("w"),
        (F.log((1 - p1) / (1 - p0))).alias("__cterm"),
    ).localCheckpoint(eager=False)
    agg = wgt.agg(
        F.sum("__cterm").alias("c"), F.count(F.lit(1)).alias("n_seen")
    ).collect()[0]
    # absence mass of the (n_features − seen) never-observed features,
    # plus the class prior; both vanish exactly for balanced classes
    p1u, p0u = add_k / (n1 + 2 * add_k), add_k / (n0 + 2 * add_k)
    unseen_cterm = math.log(1 - p1u) - math.log(1 - p0u)
    bias = (
        math.log(n1 / n0)
        + float(agg["c"] or 0.0)
        + (n_features - int(agg["n_seen"])) * unseen_cterm
    )
    return NBQualityModel(
        weights=wgt.select("f", "w"),
        bias=bias,
        default_w=(math.log(p1u) - math.log(p0u)) - unseen_cterm,
        n_features=n_features,
    )


def score_nb(
    df: DataFrame,
    model: NBQualityModel,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score a corpus under a trained NB model: adds ``nb_log_odds``
    (rounded, log P(1|d) − log P(0|d)) and ``nb_pred`` (1 iff odds > 0).

    One distinct-feature explode + one broadcast join against the
    ≤ n_features-row model + one ``groupBy(id)`` — the corpus never
    shuffles except the per-document sum, and every document appears in
    the output (tokenization emits ≥ 1 token even for empty text)."""
    tokf = (
        df.select(
            F.col(id_col).alias("__id"),
            F.explode(F.array_distinct(text_tokens(F.col(text_col)))).alias("__tok"),
        )
        .select("__id", _nb_bucket(F.col("__tok"), model.n_features).alias("f"))
        .distinct()
    )
    summed = (
        tokf.join(F.broadcast(model.weights), "f", "left")
        .groupBy("__id")
        .agg(
            (
                F.lit(model.bias)
                + F.sum(F.coalesce(F.col("w"), F.lit(model.default_w)))
            ).alias("__lo")
        )
    )
    return (
        df.join(summed, F.col(id_col) == F.col("__id"))
        .select(
            *df.columns,
            F.round("__lo", 6).alias("nb_log_odds"),
            (F.col("__lo") > 0).cast("int").alias("nb_pred"),
        )
    )


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
