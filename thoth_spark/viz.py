"""Dashboard data views — the plot-ready DataFrames behind the reference's
Streamlit/plotly dashboard (``/root/reference/ui.py:97-293``,
``/root/reference/thoth/util/viz.py:14-138``), kept engine-side so any BI
tool (or the original plotly code) can consume them. No plotting deps here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

_KEY = ["entity", "instance", "name"]


def timeseries_view(metrics_df: DataFrame) -> DataFrame:
    """Per-metric profiling series, ordered for line plots
    (``viz.plot_ts``): one row per (metric, ts), plus the metric's ordinal
    position so dashboards render metrics in the reference's sorted order.

    The ordinal is ranked on the DISTINCT metric keys (rows = #metrics,
    driver-scale) and broadcast back — ranking directly on the series
    frame would funnel every (metric, ts) row through one partition."""
    keys = metrics_df.select(*_KEY).distinct()
    ranked = keys.withColumn(
        "metric_position", F.dense_rank().over(W.orderBy(*_KEY))
    )
    return (
        metrics_df.select(*_KEY, "ts", "value")
        .join(F.broadcast(ranked), on=_KEY)
        .orderBy(*_KEY, "ts")
    )


def scoring_view(scoring_df: DataFrame, optimization_df: DataFrame) -> DataFrame:
    """Score-vs-threshold band data (``viz.plot_metric_scoring``): each
    scoring event with its optimized threshold and the anomaly flag."""
    thresholds = optimization_df.select(*_KEY, "threshold", "best_model_name")
    return scoring_df.join(F.broadcast(thresholds), on=_KEY).select(
        *_KEY,
        "ts",
        F.col("error").alias("score"),
        "threshold",
        "best_model_name",
        (F.col("error") > F.col("threshold")).alias("is_anomalous"),
    )


def forecast_interval_view(
    scoring_df: DataFrame, optimization_df: DataFrame
) -> DataFrame:
    """Observed-vs-expected interval data (``viz.plot_predicted_values``):
    the acceptance band is ``predicted / (1 ± threshold)`` — the exact
    inversion of the clamped-APE score (reference ``viz.py:102-103``)."""
    thresholds = optimization_df.select(*_KEY, "threshold")
    return scoring_df.join(F.broadcast(thresholds), on=_KEY).select(
        *_KEY,
        "ts",
        F.col("value").alias("observed"),
        "predicted",
        (F.col("predicted") / (1 + F.col("threshold"))).alias("expected_min"),
        (F.col("predicted") / (1 - F.col("threshold"))).alias("expected_max"),
    )


def rolling_band_view(
    metrics_df: DataFrame,
    window: int = 7,
    k: float = 2.0,
) -> DataFrame:
    """Trailing rolling-statistics band per metric series: the smoothed
    dashboard overlay (rolling mean ± k·stddev plus the rolling median)
    that turns a noisy daily series into a readable trend with a shaded
    normal band.

    Trailing ``window``-ROW frame partitioned per metric key — the
    window runs over the aggregate-sized metrics frame (days × metrics),
    so per-series ordering cost is bounded by series length, never by
    input rows. ``band_n`` reports how many points each statistic saw
    (< window during ramp-up). Population stddev (matching the
    profiler's StandardDeviation convention); single-point frames yield
    stddev 0, keeping the band defined from the first row."""
    w = (
        W.partitionBy(*_KEY)
        .orderBy("ts")
        .rowsBetween(-(int(window) - 1), W.currentRow)
    )
    mean = F.avg("value").over(w)
    sd = F.coalesce(F.stddev_pop(F.col("value")).over(w), F.lit(0.0))
    return metrics_df.select(
        *_KEY,
        "ts",
        "value",
        F.count(F.lit(1)).over(w).alias("band_n"),
        mean.alias("roll_mean"),
        F.expr(
            f"percentile(value, 0.5) OVER (PARTITION BY entity, instance, name "
            f"ORDER BY ts ROWS BETWEEN {int(window) - 1} PRECEDING AND CURRENT ROW)"
        ).alias("roll_median"),
        (mean - F.lit(float(k)) * sd).alias("band_lo"),
        (mean + F.lit(float(k)) * sd).alias("band_hi"),
    )
