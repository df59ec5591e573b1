"""Vectorized anomaly optimization & scoring over long-format metric series.

Flow B of the reference (``/root/reference/thoth/anomaly/``): each metric's
history is a univariate time series; a forecaster is cross-validated with
forward chaining, an error threshold is grid-searched at a confidence
level, and new points are scored by forecast error (APE).

The reference loops folds × models × metrics in driver Python
(``optimization.py:162-191``); here the whole cross-validation for every
metric is ONE Spark job of window functions partitioned by metric key —
embarrassingly parallel across metrics, which is what scales when a
dataset has thousands of profiled columns.
"""

from thoth_spark.anomaly.error_metrics import ape_column
from thoth_spark.anomaly.models import (
    DEFAULT_WINDOWS,
    MODEL_REGISTRY,
    PythonModelAdapter,
    SimpleModel,
    metric_key_columns,
    simple_model_folds,
)
from thoth_spark.anomaly.optimization import (
    AnomalyOptimization,
    OptimizationFailedError,
    find_best_threshold,
    find_start_proportion_column,
    optimize,
)
from thoth_spark.anomaly.scoring import score

__all__ = [
    "DEFAULT_WINDOWS",
    "MODEL_REGISTRY",
    "AnomalyOptimization",
    "OptimizationFailedError",
    "PythonModelAdapter",
    "SimpleModel",
    "ape_column",
    "find_best_threshold",
    "find_start_proportion_column",
    "metric_key_columns",
    "optimize",
    "score",
]
