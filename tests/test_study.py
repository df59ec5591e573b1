"""E2E accuracy-study test — the rebuild's version of the reference's
published evaluation (BASELINE.md: example-02/03 experiments A-E,
overall accuracy 0.97-0.98 on ~100-day windows).

The sf0.01 events fixture spans 30 days (18 optimize / 12 test), so the
bar here is overall ≥ 0.9 with every injected-anomaly experiment ≥ 0.75
— the fixture's shorter optimization window produces noisier thresholds
than the reference's 100-day windows (numbers recorded in SCALE.md)."""

import pytest

from thoth_spark.sources import load_table
from thoth_spark.study import accuracy_study

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def study_rows(spark):
    events = load_table(spark, SF_DIR, "events")
    return accuracy_study(events).collect()


def test_overall_accuracy_bar(study_rows):
    total_days = sum(r["n_days"] for r in study_rows)
    total_ok = sum(r["n_correct"] for r in study_rows)
    assert total_ok / total_days >= 0.9


def test_per_experiment_floor(study_rows):
    by_name = {r["experiment"]: r for r in study_rows}
    assert set(by_name) == {
        "A_normal",
        "B_volume_x3",
        "C_category_drop",
        "D_shift_x2",
        "E_nulls",
    }
    # every injected anomaly class must be detected on most of its days
    for name in ("B_volume_x3", "C_category_drop", "D_shift_x2", "E_nulls"):
        assert by_name[name]["accuracy"] >= 0.75, name
    # normal days must not alarm too often
    assert by_name["A_normal"]["accuracy"] >= 0.75


def test_uses_reference_default_confidence_first(study_rows):
    """On the 18-day optimize window the reference default 0.99 holds."""
    assert all(r["confidence"] >= 0.85 for r in study_rows)


@pytest.fixture(scope="module")
def long_study_rows(spark):
    """Round 5: the reference's published numbers (0.97-0.98) were
    measured on ~100-day windows; this reproduces that protocol on a
    generated 100-day fixture (60 optimize / 40 test days) instead of
    the 30-day sf0.01 slice — generator settings mirror the reference's
    example datasets (mild weekly seasonality, small noise)."""
    import datetime

    from thoth_spark.generation import (
        BatchDatasetGenerator,
        CategoryFeature,
        IdFeature,
        NumericFeature,
        Seasonality,
        TimestampFeature,
        Trend,
    )

    gen = BatchDatasetGenerator(
        events_trend=Trend(base_value=150.0, slope=1.0),
        events_seasonality=Seasonality(week_days=[1, 1, 1, 1, 1, 0.9, 0.85]),
        events_var=0.03,
        features=[
            TimestampFeature("ts"),
            IdFeature("user_id", min_id=1, max_id=400),
            CategoryFeature("event_type", ["view", "click", "buy"]),
            NumericFeature("value", base_value=40.0, var=0.1),
        ],
    )
    df = gen.generate(
        spark, datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc), 100, seed=17
    ).cache()
    rows = accuracy_study(df).collect()
    df.unpersist()
    return rows


def test_long_window_reference_parity(long_study_rows):
    """On the reference-length window the repo must meet the published
    bar: overall ≥ 0.95, normal days ≥ 0.9, at the reference's default
    confidence 0.99 (no fallback). Measured: 1.0 overall (SCALE.md)."""
    by_name = {r["experiment"]: r for r in long_study_rows}
    total = sum(r["n_days"] for r in long_study_rows)
    ok = sum(r["n_correct"] for r in long_study_rows)
    assert ok / total >= 0.95
    assert by_name["A_normal"]["accuracy"] >= 0.9
    assert all(r["confidence"] == 0.99 for r in long_study_rows)
    for name in ("B_volume_x3", "C_category_drop", "D_shift_x2", "E_nulls"):
        assert by_name[name]["accuracy"] >= 0.9, name
