"""Forecast error metrics as Spark column expressions."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Below this magnitude the APE denominator is considered degenerate
#: (parity with ``/root/reference/thoth/anomaly/error_metrics.py:4-13``,
#: which raises for ``true_value < 1e-4``).
APE_MIN_TRUE_VALUE = 1e-4


def ape_column(true_value: Column, predicted: Column) -> Column:
    """Absolute percentage error clamped to 1.0; null when the prediction
    is null (undefined fold) — the vectorized form of the reference's
    ``ape``. Degenerate denominators (< 1e-4) are rejected up front by
    :func:`thoth_spark.anomaly.optimization.validate_series` rather than
    raising per-row inside an executor."""
    return F.when(
        predicted.isNotNull(),
        F.least(F.abs(true_value - predicted) / true_value, F.lit(1.0)),
    )
