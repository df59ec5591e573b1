"""Spark-native synthetic dataset generation.

Reference parity: ``/root/reference/thoth/util/dataset_generation.py``
(Trend/Seasonality/noise 25-80, TimeSeriesGenerator 88-114,
feature generators 163-328, BatchDatasetGenerator 330-420) — the
reference builds every record in a driver-side Python loop and ships the
list to Spark, which caps it at notebook scale. This module generates
the SAME shapes distributively:

- ``spark.range(n_days)`` seeds the day axis; per-day row counts come
  from the trend×seasonality×noise product as column expressions;
- rows materialize via a two-level chunked ``explode(sequence(...))`` —
  bounded arrays (``_CHUNK`` elements max) so a billion-row day never
  builds a billion-element array on one executor, and the chunk frame is
  repartitioned so generation parallelism is cluster-wide, not
  one-task-per-day;
- all randomness is HASH-derived (xxhash64 → uniform → Box-Muller
  normal), never ``rand()``/``secrets`` — the same (seed, row, feature)
  always yields the same value on any cluster/partitioning, so generated
  fixtures are replayable byte-for-byte (same rationale as the study's
  deterministic null mask, study.py).

The reference's ``TextFeatureGenerator`` uses faker lorem text; that
dependency isn't available here, so text is deterministic lorem built
from an inline word list — same shape (words, length jitter), stdlib
only.
"""

from __future__ import annotations

import datetime
import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: max rows materialized per exploded sequence array
_CHUNK = 65536

_TWO_PI = 2.0 * math.pi

_LOREM = (
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod "
    "tempor incididunt ut labore et dolore magna aliqua enim ad minim veniam "
    "quis nostrud exercitation ullamco laboris nisi aliquip ex ea commodo"
)


def _uniform(*cols: Column) -> Column:
    """Deterministic U(0,1] from a row-hash — replayable on any
    partitioning (unlike ``F.rand``, which depends on partition layout)."""
    h = F.pmod(F.xxhash64(*cols), F.lit(2**31))
    return (h + F.lit(1.0)) / F.lit(2.0**31)


def _normal(mean: float, std: float, *cols: Column) -> Column:
    """Deterministic N(mean, std) via Box-Muller over two hash-uniforms."""
    u1 = _uniform(F.lit(0xA5), *cols)
    u2 = _uniform(F.lit(0x5A), *cols)
    z = F.sqrt(-2.0 * F.log(u1)) * F.cos(F.lit(_TWO_PI) * u2)
    return F.lit(mean) + F.lit(std) * z


class Trend:
    """value(day) = base_value + slope · days_since_start
    (reference dataset_generation.py:25-32)."""

    def __init__(self, base_value: float = 0.0, slope: float = 0.0):
        self.base_value = base_value
        self.slope = slope

    def column(self, day_index: Column) -> Column:
        return F.lit(self.base_value) + F.lit(self.slope) * day_index


class Seasonality:
    """Multiplicative weekday / month-period / year-month constants
    (reference dataset_generation.py:35-64; same bucket rules: day>20 →
    period 3, day>10 → period 2, else period 1)."""

    def __init__(
        self,
        week_days: list[float] | None = None,
        month_period: list[float] | None = None,
        year_months: list[float] | None = None,
    ):
        self.week_days = week_days or [1.0] * 7
        self.month_period = month_period or [1.0] * 3
        self.year_months = year_months or [1.0] * 12

    def column(self, ts: Column) -> Column:
        wd = F.element_at(
            F.array(*[F.lit(float(x)) for x in self.week_days]), F.weekday(ts) + 1
        )
        dom = F.dayofmonth(ts)
        mp_arr = F.array(*[F.lit(float(x)) for x in self.month_period])
        mp = F.when(dom > 20, F.element_at(mp_arr, 3)).when(
            dom > 10, F.element_at(mp_arr, 2)
        ).otherwise(F.element_at(mp_arr, 1))
        ym = F.element_at(
            F.array(*[F.lit(float(x)) for x in self.year_months]), F.month(ts)
        )
        return wd * mp * ym


class NormalPercentageDeviation:
    """|N(1, var)| multiplicative noise (reference
    dataset_generation.py:73-80), hash-derived for replayability."""

    def __init__(self, var: float = 0.05):
        self.var = var

    def column(self, *key: Column) -> Column:
        return F.abs(_normal(1.0, self.var, *key))


def time_series(
    spark: SparkSession,
    start_ts: datetime.datetime,
    n: int,
    trend: Trend | None = None,
    seasonality: Seasonality | None = None,
    noise: NormalPercentageDeviation | None = None,
    seed: int = 0,
) -> DataFrame:
    """Distributed twin of the reference ``TimeSeriesGenerator.generate``
    (dataset_generation.py:88-114): one row per day, ``(ts, value)``,
    value = trend × seasonality × |noise|."""
    trend = trend or Trend()
    seasonality = seasonality or Seasonality()
    noise = noise or NormalPercentageDeviation()
    days = spark.range(n).select(
        F.col("id").alias("day_index"),
        F.timestamp_seconds(
            F.lit(int(start_ts.timestamp())) + F.col("id") * 86400
        ).alias("ts"),
    )
    return days.select(
        "ts",
        (
            trend.column(F.col("day_index"))
            * seasonality.column(F.col("ts"))
            * noise.column(F.lit(seed), F.col("day_index"))
        ).alias("value"),
    )


class FeatureGenerator:
    """Base: a named column expression over (day ts, row key, seed);
    ``nulls_proportion`` masks that fraction of rows deterministically."""

    def __init__(self, name: str, nulls_proportion: float = 0.0):
        self.name = name
        self.nulls_proportion = nulls_proportion

    def _value(self, ts: Column, row_key: Column, seed: Column) -> Column:
        raise NotImplementedError

    def column(self, ts: Column, row_key: Column, seed: Column) -> Column:
        value = self._value(ts, row_key, seed)
        if self.nulls_proportion > 0:
            mask = _uniform(F.lit(self.name), F.lit("null"), row_key, seed)
            value = F.when(mask < F.lit(self.nulls_proportion), F.lit(None)).otherwise(
                value
            )
        return value.alias(self.name)

    def _u(self, ts: Column, row_key: Column, seed: Column, salt: str = "") -> Column:
        return _uniform(F.lit(self.name + salt), row_key, seed)


class IdFeature(FeatureGenerator):
    """Integer ids, uniform in [min_id, max_id) or monotonically
    increasing (reference IdFeatureGenerator, 163-192)."""

    def __init__(
        self,
        name: str,
        min_id: int = 1,
        max_id: int = 1_000_000_000,
        monotonically_increase: bool = False,
        nulls_proportion: float = 0.0,
    ):
        super().__init__(name, nulls_proportion)
        self.min_id, self.max_id = min_id, max_id
        self.monotonically_increase = monotonically_increase

    def _value(self, ts, row_key, seed):
        if self.monotonically_increase:
            return (F.lit(self.min_id) + row_key).cast("long")
        span = self.max_id - self.min_id
        return (F.lit(self.min_id) + F.floor(self._u(ts, row_key, seed) * span)).cast(
            "long"
        )


class TimestampFeature(FeatureGenerator):
    """Day start + uniform seconds within the day (reference
    TimestampFeatureGenerator, 194-220)."""

    def _value(self, ts, row_key, seed):
        secs = F.floor(self._u(ts, row_key, seed) * 86400)
        return F.timestamp_seconds(F.unix_timestamp(ts) + secs)


class NumericFeature(FeatureGenerator):
    """base_value × |N(1, var)| (reference NumericFeatureGenerator,
    222-246)."""

    def __init__(
        self,
        name: str,
        base_value: float,
        var: float = 0.05,
        nulls_proportion: float = 0.0,
    ):
        super().__init__(name, nulls_proportion)
        self.base_value = base_value
        self.var = var

    def _value(self, ts, row_key, seed):
        return F.lit(self.base_value) * F.abs(
            _normal(1.0, self.var, F.lit(self.name), row_key, seed)
        )


class TimeSensitiveNumericFeature(FeatureGenerator):
    """trend(day) × seasonality(day) × |noise| per ROW (reference
    TimeSensitiveNumericFeatureGenerator, 248-278)."""

    def __init__(
        self,
        name: str,
        trend: Trend,
        seasonality: Seasonality | None = None,
        var: float = 0.05,
        nulls_proportion: float = 0.0,
    ):
        super().__init__(name, nulls_proportion)
        self.trend = trend
        self.seasonality = seasonality or Seasonality()
        self.var = var

    def _value(self, ts, row_key, seed):
        # day index is supplied by BatchDatasetGenerator through the
        # __day_index__ column (no window/shuffle needed).
        return (
            self.trend.column(F.col("__day_index__"))
            * self.seasonality.column(ts)
            * F.abs(_normal(1.0, self.var, F.lit(self.name), row_key, seed))
        )


class CategoryFeature(FeatureGenerator):
    """Uniform choice from a category list (reference
    CategoryFeatureGenerator, 308-328)."""

    def __init__(self, name: str, categories: list[str], nulls_proportion: float = 0.0):
        super().__init__(name, nulls_proportion)
        self.categories = categories

    def _value(self, ts, row_key, seed):
        arr = F.array(*[F.lit(c) for c in self.categories])
        idx = F.floor(self._u(ts, row_key, seed) * len(self.categories)) + 1
        return F.element_at(arr, idx.cast("int"))


class TextFeature(FeatureGenerator):
    """Deterministic lorem text with length jitter (reference
    TextFeatureGenerator, 280-306, minus the faker dependency)."""

    def __init__(self, name: str, max_base_length: int, nulls_proportion: float = 0.0):
        super().__init__(name, nulls_proportion)
        self.max_base_length = max_base_length

    def _value(self, ts, row_key, seed):
        jitter = F.abs(_normal(1.0, 0.05, F.lit(self.name), row_key, seed))
        length = F.greatest(
            F.lit(1), F.floor(F.lit(float(self.max_base_length)) * jitter)
        ).cast("int")
        repeated = F.repeat(
            F.lit(_LOREM + " "),
            (length / len(_LOREM) + 1).cast("int"),
        )
        return F.substring(repeated, 1, length)


class BatchDatasetGenerator:
    """Distributed twin of the reference ``BatchDatasetGenerator``
    (dataset_generation.py:330-420): per-day row counts from a
    time-sensitive series, then one row per event with every feature as
    a column expression — a single narrow plan, no driver loop."""

    def __init__(
        self,
        events_trend: Trend,
        features: list[FeatureGenerator],
        events_seasonality: Seasonality | None = None,
        events_var: float = 0.05,
    ):
        self.events_trend = events_trend
        self.events_seasonality = events_seasonality or Seasonality()
        self.events_var = events_var
        self.features = features

    def generate(
        self,
        spark: SparkSession,
        start_ts: datetime.datetime,
        n_days: int,
        seed: int = 0,
    ) -> DataFrame:
        seed_c = F.lit(seed)
        days = spark.range(n_days).select(
            F.col("id").alias("__day_index__"),
            F.timestamp_seconds(
                F.lit(int(start_ts.timestamp())) + F.col("id") * 86400
            ).alias("__day_ts__"),
        )
        n_rows = F.greatest(
            F.lit(0),
            F.floor(
                self.events_trend.column(F.col("__day_index__"))
                * self.events_seasonality.column(F.col("__day_ts__"))
                * F.abs(_normal(1.0, self.events_var, F.lit("__n__"), F.col("__day_index__"), seed_c))
            ),
        ).cast("long")
        days = days.withColumn("__n_rows__", n_rows)
        # two-level chunked explode: arrays stay ≤ _CHUNK elements, and
        # the chunk frame is repartitioned so a huge day parallelizes
        chunks = (
            days.where(F.col("__n_rows__") > 0)
            .select(
                "__day_index__",
                "__day_ts__",
                "__n_rows__",
                F.explode(
                    F.sequence(
                        F.lit(0), F.ceil(F.col("__n_rows__") / _CHUNK).cast("long") - 1
                    )
                ).alias("__chunk__"),
            )
            .repartition(max(spark.sparkContext.defaultParallelism, 1))
        )
        rows = chunks.select(
            "__day_index__",
            "__day_ts__",
            "__chunk__",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.least(
                        F.lit(_CHUNK),
                        F.col("__n_rows__") - F.col("__chunk__") * _CHUNK,
                    ).cast("long")
                    - 1,
                )
            ).alias("__i__"),
        ).select(
            "__day_index__",
            "__day_ts__",
            (
                F.col("__day_index__") * F.lit(2**40)
                + F.col("__chunk__") * F.lit(_CHUNK)
                + F.col("__i__")
            ).alias("__row_key__"),
        )
        feature_cols = [
            f.column(F.col("__day_ts__"), F.col("__row_key__"), seed_c)
            for f in self.features
        ]
        return rows.select(*feature_cols)


def inject_anomalies(
    df: DataFrame,
    ts_col: str,
    days: list[datetime.date],
    kind: str,
    value_col: str = "value",
    category_col: str = "event_type",
) -> DataFrame:
    """Apply one of the study's perturbations (B_volume_x3 /
    C_category_drop / D_shift_x2 / E_nulls — study.py experiment
    definitions) to the listed days only; other days pass through
    unchanged. Used to build labeled anomaly fixtures from generated
    datasets."""
    from thoth_spark.study import _perturbations

    fn = _perturbations(value_col, category_col)[kind]
    d = F.date_trunc("day", F.col(ts_col)).cast("date")
    day_lits = F.array(*[F.lit(x) for x in days])
    target = df.where(F.array_contains(day_lits, d))
    rest = df.where(~F.array_contains(day_lits, d))
    return rest.unionByName(fn(target))
