"""Synthetic-data onboarding: generate → profile → optimize → assess →
dashboard, with zero external data.

Run:  python examples/synthetic_onboarding.py  [output_html]

Mirrors the reference's example-02 notebook workflow (generate a dataset
with the dataset-generation utilities, onboard it, inject an anomaly,
watch it flag) using :mod:`thoth_spark.generation` — every value is
hash-derived, so reruns reproduce the same dataset byte-for-byte.
"""

from __future__ import annotations

import datetime
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from thoth_spark import (
    LogHandler,
    assess_new_ts,
    export_dashboard_html,
    get_spark,
    init_db,
    profile_create_optimize,
)
from thoth_spark.generation import (
    BatchDatasetGenerator,
    CategoryFeature,
    IdFeature,
    NumericFeature,
    Seasonality,
    TimestampFeature,
    Trend,
)

START = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)


def main() -> None:
    out_html = sys.argv[1] if len(sys.argv) > 1 else "/tmp/thoth_synthetic_dash.html"
    spark = get_spark(app_name="thoth-spark-synthetic-onboarding")
    spark.sparkContext.setLogLevel("ERROR")
    repo = init_db(spark, tempfile.mkdtemp(prefix="thoth_synth_"))

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
    df = gen.generate(spark, START, 61, seed=17).cache()
    last_day = df.agg(F.date_trunc("day", F.max("ts"))).collect()[0][0]
    history = df.where(F.date_trunc("day", "ts") < F.lit(last_day))
    new_batch = df.where(F.date_trunc("day", "ts") == F.lit(last_day))

    profile_create_optimize(
        history.select("ts", "value", "event_type"),
        "synthetic://events",
        "ts",
        repo,
        confidence=0.99,
    )

    ok = assess_new_ts(
        new_batch.select("ts", "value", "event_type"),
        last_day,
        "synthetic://events",
        repo,
        notification_handlers=[LogHandler()],
    )
    print(f"normal synthetic day flagged anomalous: {not ok}")

    anomalous = new_batch.withColumn("value", F.col("value") * 2)
    ok = assess_new_ts(
        anomalous.select("ts", "value", "event_type"),
        last_day,
        "synthetic://events",
        repo,
        notification_handlers=[LogHandler()],
    )
    print(f"shifted (value x2) day flagged anomalous: {not ok}")

    path = export_dashboard_html(repo, "synthetic://events", out_html)
    print(f"dashboard written to {path}")


if __name__ == "__main__":
    main()
