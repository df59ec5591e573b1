"""Robust statistical outlier detection over metric series.

The model-based scorers (`anomaly/models.py`) need training windows and
CV; this is their cheap, assumption-free sibling — the median/MAD rule
(Hampel filter): a point is anomalous when

    |x - median| > k * 1.4826 * MAD,   MAD = median(|x - median|)

1.4826 scales MAD to the standard deviation under normality; unlike
mean/stddev, both statistics have a 50% breakdown point, so a burst of
genuine anomalies cannot drag the threshold toward itself.

Scale shape: this runs on the PROFILED metric series (days × metrics
rows — thousands, not billions), never on raw events; the medians are
per-group exact percentiles, two aggregation passes with the per-group
statistics broadcast back. Everything is built-in expressions, fully
replayable in an ANSI-SQL oracle (quantile_cont ≙ percentile).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: MAD → sigma consistency constant under the normal distribution.
MAD_SIGMA = 1.4826


def mad_outliers(
    series: DataFrame,
    value_col: str,
    group_cols: list[str],
    k: float = 3.0,
) -> DataFrame:
    """Flag per-group robust outliers: adds ``grp_median``, ``grp_mad``
    and ``is_outlier`` columns to ``series``.

    Two exact-percentile aggregation passes over the (small) series
    frame; group statistics rejoin via broadcast. Groups whose MAD is 0
    (over half the points identical) only flag points strictly different
    from the median — the standard Hampel degeneracy handling."""
    med = series.groupBy(*group_cols).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("grp_median")
    )
    with_med = series.join(F.broadcast(med), group_cols)
    mad = (
        with_med.withColumn("__ad", F.abs(F.col(value_col) - F.col("grp_median")))
        .groupBy(*group_cols)
        .agg(F.expr("percentile(__ad, 0.5)").alias("grp_mad"))
    )
    out = with_med.join(F.broadcast(mad), group_cols)
    dev = F.abs(F.col(value_col) - F.col("grp_median"))
    thresh = F.lit(k) * F.lit(MAD_SIGMA) * F.col("grp_mad")
    flag = F.when(
        F.col("grp_mad") > 0, dev > thresh
    ).otherwise(dev > 0)
    return out.withColumn("is_outlier", flag)
