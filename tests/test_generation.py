"""Synthetic dataset generation: distributed, seeded, replayable.

Mirrors the reference's dataset_generation test surface (generator
shapes, nulls proportions, batch assembly) plus the quickstart flow its
example notebooks drive: generate → profile → optimize → score →
assess_quality, all through the public API.
"""

import datetime

import pytest
from pyspark.sql import functions as F

from thoth_spark.generation import (
    BatchDatasetGenerator,
    CategoryFeature,
    IdFeature,
    NormalPercentageDeviation,
    NumericFeature,
    Seasonality,
    TextFeature,
    TimeSensitiveNumericFeature,
    TimestampFeature,
    Trend,
    inject_anomalies,
    time_series,
)

START = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)


def _generator():
    return BatchDatasetGenerator(
        events_trend=Trend(base_value=100.0, slope=1.0),
        events_seasonality=Seasonality(week_days=[1, 1, 1, 1, 1, 0.6, 0.5]),
        features=[
            IdFeature("event_id", monotonically_increase=True),
            TimestampFeature("ts"),
            IdFeature("user_id", min_id=1, max_id=500),
            CategoryFeature("event_type", ["view", "click", "buy"]),
            NumericFeature("value", base_value=40.0, var=0.3),
            TextFeature("note", max_base_length=60, nulls_proportion=0.2),
        ],
    )


def test_time_series_shape_and_trend(spark):
    ts = time_series(
        spark, START, 30, trend=Trend(base_value=10.0, slope=2.0), seed=7
    )
    rows = ts.orderBy("ts").collect()
    assert len(rows) == 30
    # trend dominates the 5% noise: last day ≈ 10 + 2*29 = 68
    assert rows[-1]["value"] == pytest.approx(68.0, rel=0.25)
    assert rows[0]["ts"] == START.replace(tzinfo=None)


def test_batch_generator_row_counts_follow_trend_and_seasonality(spark):
    df = _generator().generate(spark, START, 14, seed=3).cache()
    per_day = {
        r["d"]: r["n"]
        for r in df.groupBy(F.to_date("ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # weekday days ≈ 100+i, weekend days scaled by 0.6/0.5
    monday = datetime.date(2024, 1, 1)
    saturday = datetime.date(2024, 1, 6)
    assert per_day[monday] == pytest.approx(100, rel=0.3)
    assert per_day[saturday] == pytest.approx(0.6 * 105, rel=0.35)
    df.unpersist()


def test_generation_is_deterministic_and_partition_independent(spark):
    a = _generator().generate(spark, START, 5, seed=11)
    b = _generator().generate(spark, START, 5, seed=11).repartition(7)
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb
    c = _generator().generate(spark, START, 5, seed=12)
    assert sorted(map(tuple, c.collect())) != ra


def test_feature_properties(spark):
    df = _generator().generate(spark, START, 10, seed=1).cache()
    stats = df.agg(
        F.min("user_id").alias("umin"),
        F.max("user_id").alias("umax"),
        F.count_distinct("event_type").alias("ntypes"),
        (F.sum(F.col("note").isNull().cast("int")) / F.count(F.lit(1))).alias(
            "null_frac"
        ),
        F.min(F.to_date("ts")).alias("dmin"),
        F.max(F.to_date("ts")).alias("dmax"),
    ).first()
    assert stats["umin"] >= 1 and stats["umax"] < 500
    assert stats["ntypes"] == 3
    assert 0.1 < stats["null_frac"] < 0.3
    assert stats["dmin"] == datetime.date(2024, 1, 1)
    assert stats["dmax"] == datetime.date(2024, 1, 10)
    # monotonic ids are unique
    assert df.select("event_id").distinct().count() == df.count()
    df.unpersist()


def test_time_sensitive_feature_uses_day_index(spark):
    gen = BatchDatasetGenerator(
        events_trend=Trend(base_value=50.0),
        features=[
            TimestampFeature("ts"),
            TimeSensitiveNumericFeature(
                "value", trend=Trend(base_value=10.0, slope=5.0), var=0.01
            ),
        ],
    )
    df = gen.generate(spark, START, 10, seed=2)
    daily = (
        df.groupBy(F.to_date("ts").alias("d"))
        .agg(F.avg("value").alias("m"))
        .orderBy("d")
        .collect()
    )
    assert daily[9]["m"] > daily[0]["m"] * 3  # 55 vs 10, strong slope


def test_inject_anomalies_volume_and_nulls(spark):
    df = _generator().generate(spark, START, 6, seed=5).cache()
    target = [datetime.date(2024, 1, 3)]
    tripled = inject_anomalies(df, "ts", target, "B_volume_x3")
    base_day = df.where(F.to_date("ts") == target[0]).count()
    assert (
        tripled.where(F.to_date("ts") == target[0]).count() == 3 * base_day
    )
    assert tripled.count() == df.count() + 2 * base_day
    nulled = inject_anomalies(df, "ts", target, "E_nulls")
    frac = (
        nulled.where(F.to_date("ts") == target[0])
        .agg(F.avg(F.col("value").isNull().cast("int")))
        .first()[0]
    )
    assert 0.15 < frac < 0.45
    df.unpersist()


def test_quickstart_generate_profile_optimize_assess(spark):
    """The reference's onboarding flow (example notebooks: generate a
    synthetic dataset, then run the full quality loop) end-to-end on the
    public API."""
    from thoth_spark import assess_quality, optimize, profile, score
    from thoth_spark.profiler import Mean, ProfilingBuilder, Size

    df = _generator().generate(spark, START, 40, seed=9)
    metrics = profile(
        df.select("ts", "value", "event_type"),
        "ts",
        ProfilingBuilder(analyzers=[Size(), Mean("value")]),
    ).cache()
    opt = optimize(metrics, confidence=0.9)
    scoring = score(metrics, opt)
    assert assess_quality(opt.optimization_df, scoring) is True
    metrics.unpersist()
