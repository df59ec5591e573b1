"""Quickstart: the three flows end-to-end on the bundled test data.

Run:  python examples/quickstart.py  [sf_dir]

Mirrors the reference's example-01 notebook workflow
(onboard a dataset → monitor a new batch) on the `events` table.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from thoth_spark import (
    LogHandler,
    MetricsRepository,
    assess_new_ts,
    get_spark,
    profile_create_optimize,
)
from thoth_spark.sources import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="thoth-spark-quickstart")
    spark.sparkContext.setLogLevel("ERROR")
    repo = MetricsRepository(spark, tempfile.mkdtemp(prefix="thoth_quickstart_"))

    events = load_table(spark, sf_dir, "events").select("ts", "value", "event_type")
    last_day = events.agg(F.date_trunc("day", F.max("ts"))).collect()[0][0]

    # Flow A + B: profile the history, optimize a model + threshold per metric
    history = events.where(F.date_trunc("day", "ts") < F.lit(last_day))
    metrics_df, optimization_df = profile_create_optimize(
        history, "events://quickstart", "ts", repo, confidence=0.85
    )
    print("--- optimized thresholds ---")
    optimization_df.show(truncate=False)

    # Flow C: a new batch arrives — profile, score, assess
    new_batch = events.where(F.date_trunc("day", "ts") == F.lit(last_day))
    ok = assess_new_ts(
        new_batch, last_day, "events://quickstart", repo,
        notification_handlers=[LogHandler()],
    )
    print(f"new batch normal: {ok}")

    # same batch with an injected anomaly (values x5) must alert
    anomalous = new_batch.withColumn("value", F.col("value") * 5)
    ok = assess_new_ts(
        anomalous, last_day, "events://quickstart", repo,
        notification_handlers=[LogHandler()],
    )
    print(f"anomalous batch normal: {ok}")


if __name__ == "__main__":
    main()
