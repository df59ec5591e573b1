"""Golden-value profiler tests on tiny frames (the reference's test style:
``/root/reference/tests/unit/thoth/test_profiler.py:67-146``)."""

import datetime
import math

import pytest
from pyspark.sql import functions as F

from thoth_spark.profiler import (
    Compliance,
    Correlation,
    DefaultProfilingBuilder,
    Distinctness,
    Entropy,
    ExactQuantiles,
    Granularity,
    Histogram,
    Maximum,
    MaxLength,
    Mean,
    Minimum,
    MinLength,
    MutualInformation,
    PatternMatch,
    ProfilingBuilder,
    Size,
    SimpleProfilingBuilder,
    StandardDeviation,
    Sum,
    Type2Analyzers,
    Uniqueness,
    UniqueValueRatio,
    profile,
)
from thoth_spark.profiler.builder import ExactProfilingBuilder


def _metrics_dict(df):
    return {
        (r["ts"].isoformat(), r["entity"], r["instance"], r["name"]): r["value"]
        for r in df.collect()
    }


@pytest.fixture(scope="module")
def micro_df(spark):
    """6 rows over 2 day-partitions — the reference's golden micro-frame."""
    rows = [
        (1, 1.0, datetime.datetime(2022, 4, 1, 10)),
        (2, 2.0, datetime.datetime(2022, 4, 1, 11)),
        (3, 3.0, datetime.datetime(2022, 4, 1, 12)),
        (10, 10.0, datetime.datetime(2022, 4, 2, 10)),
        (11, 11.0, datetime.datetime(2022, 4, 2, 11)),
        (12, 12.0, datetime.datetime(2022, 4, 2, 12)),
    ]
    return spark.createDataFrame(rows, "f1 bigint, f2 double, ts timestamp")


def test_min_max_size_golden(spark, micro_df):
    builder = ProfilingBuilder(analyzers=[Minimum("f1"), Maximum("f2"), Size()])
    got = _metrics_dict(profile(micro_df, "ts", builder))
    assert got == {
        ("2022-04-01T00:00:00", "Column", "f1", "Minimum"): 1.0,
        ("2022-04-01T00:00:00", "Column", "f2", "Maximum"): 3.0,
        ("2022-04-01T00:00:00", "Dataset", "*", "Size"): 3.0,
        ("2022-04-02T00:00:00", "Column", "f1", "Minimum"): 10.0,
        ("2022-04-02T00:00:00", "Column", "f2", "Maximum"): 12.0,
        ("2022-04-02T00:00:00", "Dataset", "*", "Size"): 3.0,
    }


def test_default_builder_metric_set(spark, micro_df):
    got = profile(micro_df, "ts", DefaultProfilingBuilder())
    names = {
        (r["instance"], r["name"])
        for r in got.select("instance", "name").distinct().collect()
    }
    for col in ("f1", "f2"):
        assert (col, "Mean") in names
        assert (col, "StandardDeviation") in names
        assert (col, "Completeness") in names
        for q in (0.25, 0.5, 0.75):
            assert (col, f"ApproxQuantiles-{q}") in names
    assert ("*", "Size") in names


def test_stddev_is_population(spark, micro_df):
    builder = ProfilingBuilder(analyzers=[StandardDeviation("f1")])
    got = _metrics_dict(profile(micro_df, "ts", builder))
    # population stddev of {1,2,3} = sqrt(2/3), NOT sample stddev 1.0
    assert got[("2022-04-01T00:00:00", "Column", "f1", "StandardDeviation")] == pytest.approx(
        math.sqrt(2.0 / 3.0)
    )


def test_completeness_with_nulls(spark):
    rows = [
        (None, datetime.datetime(2022, 4, 1, 1)),
        (2.0, datetime.datetime(2022, 4, 1, 2)),
        (3.0, datetime.datetime(2022, 4, 1, 3)),
        (4.0, datetime.datetime(2022, 4, 1, 4)),
    ]
    df = spark.createDataFrame(rows, "v double, ts timestamp")
    got = _metrics_dict(profile(df, "ts", SimpleProfilingBuilder()))
    assert got[("2022-04-01T00:00:00", "Column", "v", "Completeness")] == 0.75
    assert got[("2022-04-01T00:00:00", "Column", "v", "Mean")] == 3.0
    assert got[("2022-04-01T00:00:00", "Dataset", "*", "Size")] == 4.0


def test_exact_quantiles(spark):
    rows = [(float(i), datetime.datetime(2022, 4, 1, i)) for i in range(1, 6)]
    df = spark.createDataFrame(rows, "v double, ts timestamp")
    builder = ProfilingBuilder(analyzers=[ExactQuantiles("v", [0.25, 0.5, 0.75])])
    got = _metrics_dict(profile(df, "ts", builder))
    assert got[("2022-04-01T00:00:00", "Column", "v", "ExactQuantiles-0.5")] == 3.0
    assert got[("2022-04-01T00:00:00", "Column", "v", "ExactQuantiles-0.25")] == 2.0


def test_frequency_analyzers(spark):
    ts = datetime.datetime(2022, 4, 1)
    rows = [("a", ts), ("a", ts), ("b", ts), ("c", ts), (None, ts)]
    df = spark.createDataFrame(rows, "s string, ts timestamp")
    builder = ProfilingBuilder(
        analyzers=[
            Uniqueness("s"),
            UniqueValueRatio("s"),
            Distinctness("s"),
            Entropy("s"),
        ]
    )
    got = _metrics_dict(profile(df, "ts", builder))
    key = ("2022-04-01T00:00:00", "Column", "s")
    assert got[(*key, "Uniqueness")] == pytest.approx(2 / 4)  # b,c once / 4 non-null
    assert got[(*key, "UniqueValueRatio")] == pytest.approx(2 / 3)
    assert got[(*key, "Distinctness")] == pytest.approx(3 / 4)
    expected_entropy = -(0.5 * math.log(0.5) + 0.25 * math.log(0.25) * 2)
    assert got[(*key, "Entropy")] == pytest.approx(expected_entropy)


def test_histogram(spark):
    ts = datetime.datetime(2022, 4, 1)
    rows = [("a", ts), ("a", ts), ("b", ts)]
    df = spark.createDataFrame(rows, "s string, ts timestamp")
    got = _metrics_dict(profile(df, "ts", ProfilingBuilder(analyzers=[Histogram("s")])))
    key = ("2022-04-01T00:00:00", "Column", "s")
    assert got[(*key, "Histogram.bins")] == 2.0
    assert got[(*key, "Histogram.abs.a")] == 2.0
    assert got[(*key, "Histogram.ratio.a")] == pytest.approx(2 / 3)
    assert got[(*key, "Histogram.abs.b")] == 1.0


def test_compliance_pattern_lengths_corr(spark):
    ts = datetime.datetime(2022, 4, 1)
    rows = [(1.0, 2.0, "ab", ts), (2.0, 4.0, "abcd", ts), (3.0, 6.0, None, ts)]
    df = spark.createDataFrame(rows, "x double, y double, s string, ts timestamp")
    builder = ProfilingBuilder(
        analyzers=[
            Compliance("x_positive", "x > 1"),
            PatternMatch("s", "^ab"),
            MaxLength("s"),
            MinLength("s"),
            Correlation("x", "y"),
            Sum("x"),
        ]
    )
    got = _metrics_dict(profile(df, "ts", builder))
    assert got[("2022-04-01T00:00:00", "Dataset", "x_positive", "Compliance")] == pytest.approx(2 / 3)
    assert got[("2022-04-01T00:00:00", "Column", "s", "PatternMatch")] == pytest.approx(2 / 3)
    assert got[("2022-04-01T00:00:00", "Column", "s", "MaxLength")] == 4.0
    assert got[("2022-04-01T00:00:00", "Column", "s", "MinLength")] == 2.0
    assert got[("2022-04-01T00:00:00", "Multicolumn", "x,y", "Correlation")] == pytest.approx(1.0)
    assert got[("2022-04-01T00:00:00", "Column", "x", "Sum")] == 6.0


def test_mutual_information(spark):
    ts = datetime.datetime(2022, 4, 1)
    # perfectly dependent: MI = H(a) = ln 2
    rows = [("a", "x", ts), ("a", "x", ts), ("b", "y", ts), ("b", "y", ts)]
    df = spark.createDataFrame(rows, "u string, v string, ts timestamp")
    got = _metrics_dict(
        profile(df, "ts", ProfilingBuilder(analyzers=[MutualInformation("u", "v")]))
    )
    assert got[("2022-04-01T00:00:00", "Multicolumn", "u,v", "MutualInformation")] == pytest.approx(
        math.log(2)
    )


def test_granularities(spark):
    rows = [
        (1.0, datetime.datetime(2022, 4, 1, 10, 15)),
        (2.0, datetime.datetime(2022, 4, 1, 10, 45)),
        (3.0, datetime.datetime(2022, 4, 1, 11, 15)),
    ]
    df = spark.createDataFrame(rows, "v double, ts timestamp")
    hourly = profile(df, "ts", ProfilingBuilder(analyzers=[Size()]), Granularity.HOUR)
    assert {(r["ts"].hour, r["value"]) for r in hourly.collect()} == {(10, 2.0), (11, 1.0)}
    monthly = profile(df, "ts", ProfilingBuilder(analyzers=[Size()]), Granularity.MONTH)
    assert [r["value"] for r in monthly.collect()] == [3.0]


def test_profile_is_single_job_for_single_pass_analyzers(spark, events_df):
    """The single-pass plan must contain exactly one shuffle (the groupBy on
    the time bucket) — no per-partition scans."""
    m = profile(events_df.select("ts", "value"), "ts", SimpleProfilingBuilder())
    plan = m._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 2  # partial->final agg exchange (+AQE read)
