"""Profiling analyzers as composable Spark aggregate expressions.

Each analyzer contributes JVM-side aggregate expressions to ONE shared
``groupBy(ts).agg(...)`` pass (no Python UDFs anywhere on the hot path).
Analyzers that need per-value frequencies (Uniqueness, Entropy, Histogram,
MutualInformation, UniqueValueRatio) are ``GroupingAnalyzer`` subclasses:
they share a single ``groupBy(ts, column).count()`` pre-aggregation per
distinct column, then reduce to per-``ts`` metrics.

Naming parity with the reference's metric keys (entity, instance, name) —
see ``/root/reference/thoth/profiler.py:138-156`` (``Metric``) and the
Deequ analyzer names it stores (e.g. ``ApproxQuantiles-0.25``, entity
"Column"/"Dataset"/"Multicolumn", instance = column name or ``*``).

Null semantics (this engine's contract, documented per analyzer):
frequency-based analyzers operate on non-null values; Completeness and
PatternMatch use the full row count as denominator.
"""

from __future__ import annotations

import re
from abc import ABC, abstractmethod

from pyspark.sql import Column as C
from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

LONG_SCHEMA = "ts timestamp, entity string, instance string, name string, value double"


def _safe(s: str) -> str:
    return re.sub(r"\W", "_", s)


class Analyzer(ABC):
    """A profiling metric computed per time partition.

    Subclasses declare aggregate expressions via :meth:`agg_exprs` (run
    inside the shared single-pass aggregation) and post-aggregation scalar
    outputs via :meth:`outputs`.
    """

    entity = "Column"

    def __init__(self, column: str):
        self.column = column

    @property
    def instance(self) -> str:
        return self.column

    def key(self) -> str:
        """Unique, alias-safe identifier for this analyzer instance."""
        return _safe(f"{type(self).__name__}__{self.instance}")

    @abstractmethod
    def agg_exprs(self) -> list[tuple[str, C]]:
        """(alias, aggregate expression) pairs for the shared agg pass."""

    @abstractmethod
    def outputs(self) -> list[tuple[str, C]]:
        """(metric name, post-agg expression over the aliases) pairs."""


class Size(Analyzer):
    """Row count of the partition (Deequ ``Size``)."""

    entity = "Dataset"

    def __init__(self) -> None:
        super().__init__("*")

    def agg_exprs(self):
        return [(self.key(), F.count(F.lit(1)))]

    def outputs(self):
        return [("Size", F.col(self.key()))]


class Completeness(Analyzer):
    """Fraction of non-null values: count(c) / count(*)."""

    def agg_exprs(self):
        k = self.key()
        return [(k + "_nn", F.count(self.column)), (k + "_n", F.count(F.lit(1)))]

    def outputs(self):
        k = self.key()
        return [("Completeness", F.col(k + "_nn") / F.col(k + "_n"))]


class _SimpleAgg(Analyzer):
    """Analyzer backed by one built-in aggregate function."""

    _fn: staticmethod
    _name: str

    def agg_exprs(self):
        return [(self.key(), self._fn(self.column))]

    def outputs(self):
        return [(self._name, F.col(self.key()))]


class Mean(_SimpleAgg):
    _fn, _name = staticmethod(F.mean), "Mean"


class StandardDeviation(_SimpleAgg):
    """Population stddev — Deequ's StandardDeviation uses the n-denominator
    (biased) estimator, so ``stddev_pop`` and NOT ``stddev_samp``."""

    _fn, _name = staticmethod(F.stddev_pop), "StandardDeviation"


class Minimum(_SimpleAgg):
    _fn, _name = staticmethod(F.min), "Minimum"


class Maximum(_SimpleAgg):
    _fn, _name = staticmethod(F.max), "Maximum"


class Sum(_SimpleAgg):
    _fn, _name = staticmethod(F.sum), "Sum"


class CountDistinct(_SimpleAgg):
    """Exact distinct count. NOTE: exact distinct is an expensive expand at
    scale — prefer :class:`ApproxCountDistinct` (HLL++) for 100 TB inputs;
    exact kept for reference parity (Deequ CountDistinct is exact)."""

    _fn, _name = staticmethod(F.countDistinct), "CountDistinct"


class ApproxCountDistinct(_SimpleAgg):
    """HyperLogLog++ distinct count — the scale path."""

    _fn, _name = staticmethod(F.approx_count_distinct), "ApproxCountDistinct"


class ApproxTopK(Analyzer):
    """Sketch-based heavy hitters (Spark ``approx_top_k``): emits
    ``ApproxTopK.abs.<item>`` = estimated count for the up-to-``k`` most
    frequent values of the column per time bucket.

    The scale path for "most frequent values": :class:`Histogram`
    materializes the FULL per-value frequency table (shuffle rows ∝
    distinct values), while this tracks at most ``max_tracked`` counters
    per bucket inside the shared single-pass aggregation — bounded state
    at any cardinality, mergeable map-side. Estimates are EXACT while a
    bucket's distinct count stays ≤ ``max_tracked`` (the fixture regime
    the oracle pins); beyond that they carry the usual space-saving
    over-count bias. Buckets with fewer than ``k`` distinct values emit
    only the existing ones (null slots are dropped by the profiler)."""

    def __init__(self, column: str, k: int = 8, max_tracked: int = 10000):
        super().__init__(column)
        if k < 1:
            raise ValueError(f"k must be >= 1, got {k}")
        if max_tracked < k:
            raise ValueError(
                f"max_tracked ({max_tracked}) must be >= k ({k}): the sketch "
                "cannot report more items than it tracks"
            )
        self.k = k
        self.max_tracked = max_tracked

    def agg_exprs(self):
        return [
            (
                self.key(),
                F.expr(
                    f"approx_top_k(`{self.column}`, {self.k}, {self.max_tracked})"
                ),
            )
        ]

    def outputs(self):
        arr = F.col(self.key())
        out = []
        for i in range(1, self.k + 1):
            # try_element_at: ranks past the bucket's distinct count are
            # empty slots (null name → dropped), not ANSI index errors
            e = F.try_element_at(arr, F.lit(i))
            out.append(
                (
                    F.concat(F.lit("ApproxTopK.abs."), e["item"].cast("string")),
                    e["count"],
                )
            )
        return out


class MaxLength(Analyzer):
    def agg_exprs(self):
        return [(self.key(), F.max(F.length(self.column)))]

    def outputs(self):
        return [("MaxLength", F.col(self.key()))]


class MinLength(Analyzer):
    def agg_exprs(self):
        return [(self.key(), F.min(F.length(self.column)))]

    def outputs(self):
        return [("MinLength", F.col(self.key()))]


class ApproxQuantiles(Analyzer):
    """Approximate quantiles (Greenwald-Khanna sketch via
    ``percentile_approx``); emits one metric per quantile named
    ``ApproxQuantiles-<q>`` — parity with Deequ's naming
    (``/root/reference/thoth/profiler.py:97-99``)."""

    def __init__(self, column: str, quantiles: list[float] | None = None, accuracy: int = 10000):
        super().__init__(column)
        self.quantiles = quantiles or [0.25, 0.5, 0.75]
        self.accuracy = accuracy

    def key(self) -> str:
        qs = "_".join(str(q) for q in self.quantiles)
        return _safe(f"ApproxQuantiles__{self.instance}__{qs}")

    def agg_exprs(self):
        arr = F.array(*[F.lit(q) for q in self.quantiles])
        return [(self.key(), F.percentile_approx(self.column, arr, F.lit(self.accuracy)))]

    def outputs(self):
        return [
            (f"ApproxQuantiles-{q}", F.col(self.key())[i]) for i, q in enumerate(self.quantiles)
        ]


class KLLQuantiles(Analyzer):
    """KLL sketch quantiles (Apache DataSketches via Spark 4's
    ``kll_sketch_agg_double``) — true parity with Deequ's ``KLLSketch``
    analyzer (``/root/reference/thoth/profiler.py:20``, pydeequ import),
    which round 1 only aliased to the GK family. Emits one metric per
    quantile named ``KLLSketch-<q>``.

    Unlike GK (``percentile_approx``), KLL sketches are MERGEABLE with
    proven error bounds: per-partition sketches union into coarser
    granularities without rescanning — see
    :mod:`thoth_spark.profiler.sketches` for the rollup pipeline built
    on this property."""

    def __init__(self, column: str, quantiles: list[float] | None = None, k: int = 200):
        super().__init__(column)
        self.quantiles = quantiles or [0.25, 0.5, 0.75]
        self.k = k

    def key(self) -> str:
        qs = "_".join(str(q) for q in self.quantiles)
        return _safe(f"KLLSketch__{self.instance}__{qs}")

    def agg_exprs(self):
        sketch = F.kll_sketch_agg_double(
            F.col(self.column).cast("double"), F.lit(self.k)
        )
        return [(self.key(), sketch)]

    def outputs(self):
        return [
            (
                f"KLLSketch-{q}",
                F.kll_sketch_get_quantile_double(F.col(self.key()), F.lit(float(q))),
            )
            for q in self.quantiles
        ]


class ExactQuantiles(Analyzer):
    """Exact interpolated quantiles (``percentile``) — deterministic and
    oracle-checkable; costs a sort of each group's values, so prefer
    :class:`ApproxQuantiles` at extreme scale."""

    def __init__(self, column: str, quantiles: list[float] | None = None):
        super().__init__(column)
        self.quantiles = quantiles or [0.25, 0.5, 0.75]

    def key(self) -> str:
        qs = "_".join(str(q) for q in self.quantiles)
        return _safe(f"ExactQuantiles__{self.instance}__{qs}")

    def agg_exprs(self):
        arr = F.array(*[F.lit(q) for q in self.quantiles])
        return [(self.key(), F.percentile(self.column, arr))]

    def outputs(self):
        return [
            (f"ExactQuantiles-{q}", F.col(self.key())[i]) for i, q in enumerate(self.quantiles)
        ]


class Distinctness(Analyzer):
    """#distinct non-null values / #non-null values."""

    def agg_exprs(self):
        k = self.key()
        return [(k + "_d", F.countDistinct(self.column)), (k + "_nn", F.count(self.column))]

    def outputs(self):
        k = self.key()
        return [("Distinctness", F.col(k + "_d") / F.col(k + "_nn"))]


class Compliance(Analyzer):
    """Fraction of rows satisfying a SQL boolean predicate (entity Dataset,
    instance = the constraint's given name; rows where the predicate is
    null/false count as non-compliant)."""

    entity = "Dataset"

    def __init__(self, name: str, predicate: str):
        super().__init__(name)
        self.predicate = predicate

    def key(self) -> str:
        return _safe(f"Compliance__{self.instance}")

    def agg_exprs(self):
        cond = F.coalesce(F.expr(self.predicate).cast("boolean"), F.lit(False))
        return [(self.key(), F.avg(cond.cast("double")))]

    def outputs(self):
        return [("Compliance", F.col(self.key()))]


class PatternMatch(Analyzer):
    """Fraction of rows whose value matches a regex (nulls don't match)."""

    def __init__(self, column: str, pattern: str):
        super().__init__(column)
        self.pattern = pattern

    def key(self) -> str:
        return _safe(f"PatternMatch__{self.instance}__{abs(hash(self.pattern)) % 10**8}")

    def agg_exprs(self):
        cond = F.coalesce(F.col(self.column).rlike(self.pattern), F.lit(False))
        return [(self.key(), F.avg(cond.cast("double")))]

    def outputs(self):
        return [("PatternMatch", F.col(self.key()))]


class Correlation(Analyzer):
    """Pearson correlation of two numeric columns (entity Multicolumn,
    instance "c1,c2")."""

    entity = "Multicolumn"

    def __init__(self, column_a: str, column_b: str):
        super().__init__(f"{column_a},{column_b}")
        self.column_a, self.column_b = column_a, column_b

    def agg_exprs(self):
        return [(self.key(), F.corr(self.column_a, self.column_b))]

    def outputs(self):
        return [("Correlation", F.col(self.key()))]


class InferredTypes(Analyzer):
    """Type histogram of a string column: fraction of non-null values that
    parse as Integral / Fractional / Boolean, remainder String. Emits
    ``DataType.<kind>.ratio`` metrics."""

    _INT = r"^-?\d+$"
    _FRAC = r"^-?\d*\.\d+([eE][-+]?\d+)?$"
    _BOOL = r"^(?i)(true|false)$"

    def agg_exprs(self):
        k = self.key()
        c = F.col(self.column)
        nn = F.count(self.column)
        return [
            (k + "_int", F.sum(F.coalesce(c.rlike(self._INT), F.lit(False)).cast("long"))),
            (k + "_frac", F.sum(F.coalesce(c.rlike(self._FRAC), F.lit(False)).cast("long"))),
            (k + "_bool", F.sum(F.coalesce(c.rlike(self._BOOL), F.lit(False)).cast("long"))),
            (k + "_nn", nn),
        ]

    def outputs(self):
        k = self.key()
        nn = F.col(k + "_nn")
        i, fr, b = F.col(k + "_int"), F.col(k + "_frac"), F.col(k + "_bool")
        return [
            ("DataType.Integral.ratio", i / nn),
            ("DataType.Fractional.ratio", fr / nn),
            ("DataType.Boolean.ratio", b / nn),
            ("DataType.String.ratio", (nn - i - fr - b) / nn),
        ]


# --------------------------------------------------------------------------
# Two-level (frequency-based) analyzers
# --------------------------------------------------------------------------


class GroupingAnalyzer(Analyzer):
    """Analyzer needing per-value frequencies.

    The profiler computes ONE ``groupBy(ts, column).count()`` per distinct
    column and hands the counts frame (columns ``__ts__``, ``__val__``
    (string-cast value), ``cnt``) to every grouping analyzer on that
    column, which reduces it to long-format metric rows.
    """

    grouping: tuple[str, ...]

    def __init__(self, column: str):
        super().__init__(column)
        self.grouping = (column,)

    def agg_exprs(self):  # not part of the shared single pass
        return []

    def outputs(self):
        return []

    @abstractmethod
    def long_rows(self, counts: DataFrame) -> DataFrame:
        """Reduce the counts frame to (ts, entity, instance, name, value)."""

    def _emit(self, df: DataFrame, name_col: C, value_col: C) -> DataFrame:
        return df.select(
            F.col("__ts__").alias("ts"),
            F.lit(self.entity).alias("entity"),
            F.lit(self.instance).alias("instance"),
            name_col.alias("name"),
            value_col.cast("double").alias("value"),
        )


class Uniqueness(GroupingAnalyzer):
    """#non-null values occurring exactly once / #non-null values."""

    def long_rows(self, counts: DataFrame) -> DataFrame:
        agg = counts.groupBy("__ts__").agg(
            (
                F.sum(F.when(F.col("cnt") == 1, 1).otherwise(0)) / F.sum("cnt")
            ).alias("v")
        )
        return self._emit(agg, F.lit("Uniqueness"), F.col("v"))


class UniqueValueRatio(GroupingAnalyzer):
    """#values occurring exactly once / #distinct values."""

    def long_rows(self, counts: DataFrame) -> DataFrame:
        agg = counts.groupBy("__ts__").agg(
            (
                F.sum(F.when(F.col("cnt") == 1, 1).otherwise(0)) / F.count(F.lit(1))
            ).alias("v")
        )
        return self._emit(agg, F.lit("UniqueValueRatio"), F.col("v"))


class Entropy(GroupingAnalyzer):
    """Shannon entropy (natural log) of the non-null value distribution."""

    def long_rows(self, counts: DataFrame) -> DataFrame:
        p = F.col("cnt") / F.sum("cnt").over(W.partitionBy("__ts__"))
        agg = (
            counts.withColumn("p", p)
            .groupBy("__ts__")
            .agg((-F.sum(F.col("p") * F.log(F.col("p")))).alias("v"))
        )
        return self._emit(agg, F.lit("Entropy"), F.col("v"))


class Histogram(GroupingAnalyzer):
    """Per-value histogram: emits ``Histogram.bins`` plus, for the top
    ``max_bins`` values by count (ties broken by value), ``Histogram.abs.<v>``
    and ``Histogram.ratio.<v>`` (ratio over non-null rows)."""

    def __init__(self, column: str, max_bins: int = 1000):
        super().__init__(column)
        self.max_bins = max_bins

    def long_rows(self, counts: DataFrame) -> DataFrame:
        w = W.partitionBy("__ts__")
        rank_w = W.partitionBy("__ts__").orderBy(F.col("cnt").desc(), F.col("__val__"))
        enriched = (
            counts.withColumn("total", F.sum("cnt").over(w))
            .withColumn("nbins", F.count(F.lit(1)).over(w))
            .withColumn("rk", F.row_number().over(rank_w))
            .where(F.col("rk") <= self.max_bins)
        )
        abs_rows = self._emit(
            enriched, F.concat(F.lit("Histogram.abs."), F.col("__val__")), F.col("cnt")
        )
        ratio_rows = self._emit(
            enriched,
            F.concat(F.lit("Histogram.ratio."), F.col("__val__")),
            F.col("cnt") / F.col("total"),
        )
        bins_rows = self._emit(
            enriched.where(F.col("rk") == 1), F.lit("Histogram.bins"), F.col("nbins")
        )
        return bins_rows.unionByName(abs_rows).unionByName(ratio_rows)


class MutualInformation(GroupingAnalyzer):
    """Mutual information of two columns (natural log), over rows where
    both are non-null: sum over (a,b) of p_ab * ln(p_ab / (p_a * p_b))."""

    entity = "Multicolumn"

    def __init__(self, column_a: str, column_b: str):
        Analyzer.__init__(self, f"{column_a},{column_b}")
        self.column_a, self.column_b = column_a, column_b
        self.grouping = (column_a, column_b)

    def long_rows(self, counts: DataFrame) -> DataFrame:
        w = W.partitionBy("__ts__")
        wa = W.partitionBy("__ts__", "__val__")
        wb = W.partitionBy("__ts__", "__val2__")
        enriched = (
            counts.withColumn("total", F.sum("cnt").over(w))
            .withColumn("cnt_a", F.sum("cnt").over(wa))
            .withColumn("cnt_b", F.sum("cnt").over(wb))
        )
        p_ab = F.col("cnt") / F.col("total")
        p_a = F.col("cnt_a") / F.col("total")
        p_b = F.col("cnt_b") / F.col("total")
        agg = enriched.groupBy("__ts__").agg(
            F.sum(p_ab * F.log(p_ab / (p_a * p_b))).alias("v")
        )
        return self._emit(agg, F.lit("MutualInformation"), F.col("v"))
