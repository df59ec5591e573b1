"""Forecast models over per-metric series.

``SimpleModel`` — the reference's rolling-mean forecaster
(``/root/reference/thoth/anomaly/models.py:78-164``) — is expressed here as
pure window functions: for every fold *i* of every metric series, the model
trains on points ``[:i]``, picks the window length with the smallest mean
training APE, and predicts point *i* as the mean of the previous ``w``
values. All folds of all metrics compute in one Spark job.

Exact semantics replicated from the reference:

- candidate windows at fold *i* are those with ``w < i`` (train length);
  a window's rolling prediction at train row *j* is defined only for
  ``j >= w`` (pandas ``shift(1).rolling(w)`` yields NaN before that);
- the training error of window ``w`` at fold *i* is the mean APE over
  train rows ``j in [w, i-1]``;
- ties in training error resolve to the earliest window in the
  configured list (pandas first-min, ``models.py:137-139``);
- the forecast for fold *i* is the mean of values ``[i-w, i-1]`` for the
  chosen ``w``.

``PythonModelAdapter`` is the extension point for driver-style Python
forecasters (Prophet/SARIMA et al.): per-metric ``applyInPandas`` so each
series trains on one executor — model state never crosses nodes, groups
parallelize freely. The Merlion-backed AutoProphet/AutoSarima of the
reference are not bundled (heavy optional deps); any callable
``(ts array, values array) -> float`` plugs in.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from thoth_spark.anomaly.error_metrics import ape_column

#: Reference default window lengths (``models.py:89``).
DEFAULT_WINDOWS = [3, 5, 7, 30]

#: Canonical metric-series key columns (long metrics schema).
METRIC_KEY = ["entity", "instance", "name"]


def collect_timeseries(metrics_df: DataFrame, key_cols: list[str] | None = None) -> DataFrame:
    """The reference's ``convert_to_timeseries``
    (``/root/reference/thoth/base.py:29-47``): pivot the long metrics frame
    to one row per metric with its chronologically sorted (ts, value)
    points, ordered by metric key. In the long layout this is only needed
    at API boundaries (driver-side consumers, dashboards) — the engine
    itself operates on the long frame with window functions."""
    key_cols = key_cols or metric_key_columns(metrics_df)
    return (
        metrics_df.groupBy(*key_cols)
        .agg(F.sort_array(F.collect_list(F.struct("ts", "value"))).alias("points"))
        .orderBy(*key_cols)
    )


def metric_key_columns(df: DataFrame) -> list[str]:
    """Series key = (dataset_uri?, entity, instance, name) — whichever of
    those columns the frame carries."""
    return [c for c in ("dataset_uri", "entity", "instance", "name") if c in df.columns]


def simple_model_folds(
    metrics_df: DataFrame,
    windows: list[int] | None = None,
    key_cols: list[str] | None = None,
    value_col: str = "value",
    ts_col: str = "ts",
) -> DataFrame:
    """Compute every forward-chaining fold of SimpleModel for every metric.

    Adds columns: ``__idx`` (0-based position), ``__n`` (series length),
    ``predicted`` (best-window forecast for this fold), ``error`` (APE,
    clamped to 1.0), ``best_window``. ``predicted``/``error`` are null for
    folds where no window qualifies (``i <= min(windows)``).

    One shuffle keyed by the metric key; everything else is window
    functions within partitions.
    """
    windows = windows or DEFAULT_WINDOWS
    key_cols = key_cols or metric_key_columns(metrics_df)
    w_ord = W.partitionBy(*key_cols).orderBy(ts_col)
    value = F.col(value_col)

    df = metrics_df.withColumn("__idx", F.row_number().over(w_ord) - 1).withColumn(
        "__n", F.count(F.lit(1)).over(W.partitionBy(*key_cols))
    )

    candidates = []
    for pos, w in enumerate(windows):
        pred_w = F.when(
            F.col("__idx") >= w,
            F.avg(value).over(w_ord.rowsBetween(-w, -1)),
        )
        ape_w = ape_column(value, pred_w)
        df = df.withColumn(f"__pred_{w}", pred_w).withColumn(f"__ape_{w}", ape_w)
        # mean training APE of window w at this fold = mean of the window's
        # APEs over all PRIOR rows (nulls — undefined rows — are skipped by
        # avg, matching pandas .mean()).
        cum_w = F.avg(F.col(f"__ape_{w}")).over(
            w_ord.rowsBetween(W.unboundedPreceding, -1)
        )
        candidates.append(
            F.struct(
                cum_w.alias("train_error"),
                F.lit(pos).alias("pos"),
                F.lit(w).alias("w"),
                F.col(f"__pred_{w}").alias("pred"),
            )
        )

    # Pick the candidate with min (train_error, position-in-list); windows
    # with no defined training rows yet (w >= i) have null train_error and
    # are filtered out — exactly the reference's _check_series_length skip.
    arr = F.filter(F.array(*candidates), lambda c: c["train_error"].isNotNull())
    best = F.get(F.array_sort(arr), 0)  # null when no window qualifies yet

    df = (
        df.withColumn("best_window", best["w"])
        .withColumn("predicted", best["pred"])
        .withColumn("error", ape_column(value, best["pred"]))
    )
    return df.drop(*[c for w in windows for c in (f"__pred_{w}", f"__ape_{w}")])


class SimpleModel:
    """Registry wrapper for the vectorized rolling-mean forecaster."""

    name = "SimpleModel"

    def __init__(self, windows: list[int] | None = None):
        self.windows = windows or DEFAULT_WINDOWS

    def folds(self, metrics_df: DataFrame, key_cols: list[str] | None = None) -> DataFrame:
        return simple_model_folds(metrics_df, self.windows, key_cols)


class PythonModelAdapter:
    """Run an arbitrary per-series Python forecaster distributed by metric.

    ``forecaster(ts_values, train_values) -> predicted_next`` is called for
    each fold inside ``applyInPandas`` — the whole series for one metric is
    local to one executor task (the only sane distribution for stateful
    models like Prophet/SARIMA), and distinct metrics run in parallel.
    """

    def __init__(
        self,
        name: str,
        forecaster: Callable[[list, list], float],
        min_train_length: int = 4,
    ):
        self.name = name
        self.forecaster = forecaster
        self.min_train_length = min_train_length

    def folds(self, metrics_df: DataFrame, key_cols: list[str] | None = None) -> DataFrame:
        key_cols = key_cols or metric_key_columns(metrics_df)
        forecaster = self.forecaster
        min_train = self.min_train_length
        out_schema = (
            ", ".join(f"{c} string" for c in key_cols)
            + ", ts timestamp, value double, __idx int, __n int,"
            + " best_window int, predicted double, error double"
        )

        def run(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values("ts").reset_index(drop=True)
            n = len(pdf)
            preds: list[float | None] = [None] * n
            for i in range(min_train, n):
                preds[i] = forecaster(
                    list(pdf["ts"][:i]), [float(v) for v in pdf["value"][:i]]
                )
            pdf["__idx"] = range(n)
            pdf["__n"] = n
            pdf["best_window"] = None
            pdf["predicted"] = pd.Series(preds, dtype="float64")
            err = (pdf["value"] - pdf["predicted"]).abs() / pdf["value"]
            pdf["error"] = err.clip(upper=1.0)
            return pdf[[*key_cols, "ts", "value", "__idx", "__n", "best_window", "predicted", "error"]]

        return (
            metrics_df.select(*key_cols, "ts", "value")
            .groupBy(*key_cols)
            .applyInPandas(run, schema=out_schema)
        )


def seasonal_naive_forecaster(period: int = 7) -> Callable[[list, list], float]:
    """Forecast = the value one season ago (falls back to the last value
    while the train series is shorter than a season)."""

    def forecast(ts: list, values: list) -> float:
        return values[-period] if len(values) >= period else values[-1]

    return forecast


def holt_forecaster(alpha: float = 0.5, beta: float = 0.3) -> Callable[[list, list], float]:
    """Holt double-exponential smoothing (level + trend), pure python —
    the stand-in for heavyweight stateful forecasters (Prophet/SARIMA in
    the reference's Merlion models, ``models.py:184-241``): sequential
    over one series, embarrassingly parallel across series via
    ``applyInPandas``."""

    def forecast(ts: list, values: list) -> float:
        level, trend = values[0], values[1] - values[0] if len(values) > 1 else 0.0
        for v in values[1:]:
            prev_level = level
            level = alpha * v + (1 - alpha) * (level + trend)
            trend = beta * (level - prev_level) + (1 - beta) * trend
        return level + trend

    return forecast


def _seasonal_naive_factory() -> PythonModelAdapter:
    return PythonModelAdapter("SeasonalNaive7", seasonal_naive_forecaster(7))


def _holt_factory() -> PythonModelAdapter:
    return PythonModelAdapter("HoltLinear", holt_forecaster())


#: name → model factory; parity with the reference's model registry
#: (``models.py:244-277``). Merlion AutoProphet/AutoSarima are not bundled
#: (heavy optional deps); SeasonalNaive7/HoltLinear exercise the same
#: per-series ``applyInPandas`` execution path. Register a
#: PythonModelAdapter to add further models.
MODEL_REGISTRY: dict[str, Callable[[], object]] = {
    "SimpleModel": SimpleModel,
    "SeasonalNaive7": _seasonal_naive_factory,
    "HoltLinear": _holt_factory,
}

#: Models :func:`thoth_spark.anomaly.optimization.optimize` tries when none
#: are named — SimpleModel alone, matching the reference's default factory
#: minus the unbundled Prophet member.
DEFAULT_MODEL_NAMES = ["SimpleModel"]
