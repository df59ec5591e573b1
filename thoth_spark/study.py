"""Accuracy study — reproduction of the reference's published evaluation.

The reference's de-facto benchmark (BASELINE.md; ``examples/example-02
.ipynb`` cells 31-53, ``example-03.ipynb`` cells 29-51) splits a dataset
into an optimization window and a test window, then assesses test days
under five conditions: A = normal days (expect no alert), B = row count
×3, C = one category dropped, D = numeric column ×2 (distribution
shift), E = nulls injected into a complete column. B-E perturb a SAMPLE
of the test days (25 of 100 / 19 of 76 in the reference) and each
experiment's accuracy counts its own perturbed days (flagged = correct);
experiment A counts unperturbed days (not-flagged = correct). Overall
reference accuracy: 0.97-0.98.

This module runs the same design VECTORIZED: one profiling pass per
experiment and one window-function scoring pass covering every assessed
day at once — where the reference notebook loops ``assess_new_ts`` per
day (a full Spark job each), this computes the identical per-day
decisions in ~6 Spark jobs total, so the study scales to arbitrarily
many test days. Scoring semantics match the sequential loop: each day's
forecast trains on all prior days of the (partially perturbed) series,
exactly like the repository history the reference accumulates via
per-day upserts — including the reference's own contamination dynamics
where a perturbed day enters the next day's history.
"""

from __future__ import annotations

import datetime
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from thoth_spark.anomaly.models import MODEL_REGISTRY
from thoth_spark.anomaly.optimization import (
    OptimizationFailedError,
    optimize,
)
from thoth_spark.profiler import ProfilingBuilder, profile

_KEY = ["entity", "instance", "name"]


def _perturbations(
    value_col: str, category_col: str
) -> dict[str, Callable[[DataFrame], DataFrame]]:
    """Experiment name → transform applied to the sampled test days."""

    def volume_x3(df: DataFrame) -> DataFrame:
        return df.unionAll(df).unionAll(df)

    def drop_category(df: DataFrame) -> DataFrame:
        # drop the lexicographically-first category (deterministic)
        first = df.select(F.min(category_col)).first()[0]
        return df.where(F.col(category_col) != first)

    def shift_x2(df: DataFrame) -> DataFrame:
        return df.withColumn(value_col, F.col(value_col) * 2)

    def inject_nulls(df: DataFrame) -> DataFrame:
        # deterministic ~30% null mask from a row hash (not rand(): the
        # study must be replayable)
        mask = F.pmod(F.xxhash64(*df.columns), F.lit(10)) < 3
        return df.withColumn(
            value_col, F.when(mask, F.lit(None)).otherwise(F.col(value_col))
        )

    return {
        "B_volume_x3": volume_x3,
        "C_category_drop": drop_category,
        "D_shift_x2": shift_x2,
        "E_nulls": inject_nulls,
    }


def _score_test_days(metrics_df: DataFrame, optimization, split_day) -> DataFrame:
    """Per-(metric, day) forecast error for every test day in one pass:
    each model's folds train on all prior points (the sequential-upsert
    history semantics), inner-joined to the metric's optimized best
    model — ``score()`` generalized from the last fold to a fold range."""
    parts = []
    for name in optimization.model_names:
        model = MODEL_REGISTRY[name]()
        folds = model.folds(metrics_df, key_cols=_KEY)
        parts.append(
            folds.where(F.col("ts") >= F.lit(split_day)).select(
                *_KEY,
                F.lit(name).alias("best_model_name"),
                "ts",
                "error",
            )
        )
    scored = parts[0]
    for p in parts[1:]:
        scored = scored.unionByName(p)
    best = optimization.optimization_df.select(*_KEY, "best_model_name", "threshold")
    return scored.join(F.broadcast(best), on=[*_KEY, "best_model_name"])


def _day_flags(scored: DataFrame) -> dict[datetime.datetime, bool]:
    """day → any metric's error above its threshold."""
    rows = (
        scored.groupBy(F.col("ts").alias("d"))
        .agg(F.max((F.col("error") > F.col("threshold")).cast("int")).alias("flag"))
        .collect()
    )
    return {r["d"]: bool(r["flag"]) for r in rows}


def accuracy_study(
    events_df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    category_col: str = "event_type",
    split_proportion: float = 0.6,
    perturb_every: int = 3,
    confidences: tuple[float, ...] = (0.99, 0.95, 0.9, 0.85),
    start_proportion: float | None = 0.2,
    profiling_builder: ProfilingBuilder | None = None,
) -> DataFrame:
    """Run experiments A-E end-to-end; returns one summary row per
    experiment: ``(experiment, expected_anomaly, n_days, n_correct,
    accuracy, confidence)``.

    ``perturb_every``: every k-th test day is perturbed in B-E (the
    reference perturbs a ~25% sample); A assesses the unperturbed days.
    ``confidences`` are tried in order (the reference default 0.99
    first); shorter series legitimately fail the higher confidences
    (reference ``OptimizationFailedError`` semantics), in which case the
    next is used. ``start_proportion=0.2`` widens the CV fold count on
    short fixtures (the reference's heuristic assumes ~100-day windows —
    ``optimization.py:271-281``); pass ``None`` for the heuristic."""
    spark = events_df.sparkSession
    events = events_df.select(ts_col, value_col, category_col)

    days = sorted(
        r[0]
        for r in events.select(F.date_trunc("day", ts_col).alias("d"))
        .distinct()
        .collect()
    )
    split_day = days[int(len(days) * split_proportion)]
    test_days = [d for d in days if d >= split_day]
    perturbed_days = set(test_days[::perturb_every])
    normal_days = [d for d in test_days if d not in perturbed_days]

    day_expr = F.date_trunc("day", ts_col)
    train = events.where(day_expr < F.lit(split_day))
    test = events.where(day_expr >= F.lit(split_day))

    metrics_train = profile(train, ts_col, profiling_builder).cache()
    opt = None
    used_confidence = None
    for conf in confidences:
        try:
            opt = optimize(
                metrics_train,
                confidence=conf,
                start_proportion=start_proportion,
                key_cols=_KEY,
            )
            used_confidence = conf
            break
        except OptimizationFailedError:
            continue
    if opt is None:
        raise OptimizationFailedError(
            f"No confidence in {confidences} produced a valid optimization."
        )

    in_sample = day_expr.isin([F.lit(d) for d in perturbed_days])
    summaries = []

    # Experiment A: unperturbed series, count the normal days
    scored_a = _score_test_days(profile(events, ts_col, profiling_builder), opt, split_day)
    flags_a = _day_flags(scored_a)
    correct_a = sum(1 for d in test_days if not flags_a.get(d, False))
    summaries.append(
        (
            "A_normal",
            False,
            len(test_days),
            correct_a,
            round(correct_a / max(len(test_days), 1), 6),
            float(used_confidence),
        )
    )

    for name, perturb in _perturbations(value_col, category_col).items():
        perturbed = test.where(in_sample)
        untouched = test.where(~in_sample)
        full = train.unionByName(untouched).unionByName(perturb(perturbed))
        scored = _score_test_days(profile(full, ts_col, profiling_builder), opt, split_day)
        flags = _day_flags(scored)
        correct = sum(1 for d in perturbed_days if flags.get(d, False))
        summaries.append(
            (
                name,
                True,
                len(perturbed_days),
                correct,
                round(correct / max(len(perturbed_days), 1), 6),
                float(used_confidence),
            )
        )
    return spark.createDataFrame(
        summaries,
        "experiment string, expected_anomaly boolean, n_days long,"
        " n_correct long, accuracy double, confidence double",
    )
