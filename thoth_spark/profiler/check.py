"""Declarative data-quality constraint verification (the Deequ
``VerificationSuite``/``Check`` surface that complements the reference's
profiling analyzers — same metric definitions, applied as gates).

A :class:`Check` collects constraints; :func:`run_check` evaluates EVERY
constraint metric in ONE ``agg(...)`` pass over the data (the same
single-pass philosophy as the profiler — one scan, one job, regardless
of how many constraints there are) and returns one row per constraint:
``(constraint, metric, passed)``.

Constraints carry scalar bounds (``min_value``/``max_value``), not
callables — which keeps the whole verification replayable in an
ANSI-SQL oracle and serializable for audit trails. ``passed`` is a
closed-interval test: ``min_value <= metric <= max_value`` (either side
unbounded when omitted).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class _Constraint:
    name: str
    expr: Column  # aggregate expression producing the metric (double)
    min_value: float | None
    max_value: float | None


class Check:
    """A named collection of data-quality constraints. Builder methods
    return ``self`` for chaining; every metric matches the definition of
    the analyzer of the same name (Completeness = non-null fraction,
    Uniqueness = fraction of non-null values occurring exactly once,
    Compliance = fraction of ALL rows satisfying a predicate, ...)."""

    def __init__(self, name: str):
        self.name = name
        self.constraints: list[_Constraint] = []

    def _add(
        self,
        name: str,
        expr: Column,
        min_value: float | None = None,
        max_value: float | None = None,
    ) -> "Check":
        if min_value is None and max_value is None:
            raise ValueError(f"constraint {name!r} needs min_value or max_value")
        self.constraints.append(
            _Constraint(name, expr.cast("double"), min_value, max_value)
        )
        return self

    # --- dataset-level -----------------------------------------------------
    def has_size(self, min_value=None, max_value=None) -> "Check":
        return self._add("Size", F.count(F.lit(1)), min_value, max_value)

    # --- column-level ------------------------------------------------------
    def has_completeness(self, column: str, min_value=None, max_value=None) -> "Check":
        return self._add(
            f"Completeness({column})",
            F.count(column) / F.count(F.lit(1)),
            min_value,
            max_value,
        )

    def is_complete(self, column: str) -> "Check":
        return self.has_completeness(column, min_value=1.0)

    def has_distinctness(self, column: str, min_value=None, max_value=None) -> "Check":
        """Distinctness = #distinct non-null values / #non-null values."""
        return self._add(
            f"Distinctness({column})",
            F.count_distinct(F.col(column)) / F.count(column),
            min_value,
            max_value,
        )

    def is_unique(self, column: str) -> "Check":
        """Every non-null value occurs exactly once (distinctness 1.0)."""
        return self.has_distinctness(column, min_value=1.0)

    def has_min(self, column: str, min_value=None, max_value=None) -> "Check":
        return self._add(f"Minimum({column})", F.min(column), min_value, max_value)

    def has_max(self, column: str, min_value=None, max_value=None) -> "Check":
        return self._add(f"Maximum({column})", F.max(column), min_value, max_value)

    def has_mean(self, column: str, min_value=None, max_value=None) -> "Check":
        return self._add(f"Mean({column})", F.mean(column), min_value, max_value)

    def has_sum(self, column: str, min_value=None, max_value=None) -> "Check":
        return self._add(f"Sum({column})", F.sum(column), min_value, max_value)

    def has_standard_deviation(
        self, column: str, min_value=None, max_value=None
    ) -> "Check":
        return self._add(
            f"StandardDeviation({column})",
            F.stddev_pop(column),
            min_value,
            max_value,
        )

    def is_non_negative(self, column: str) -> "Check":
        """Compliance(column >= 0) == 1.0 over non-null values, Deequ
        semantics (nulls don't violate)."""
        return self._add(
            f"NonNegative({column})",
            F.sum(F.when(F.col(column) >= 0, 1).when(F.col(column).isNull(), 1).otherwise(0))
            / F.count(F.lit(1)),
            min_value=1.0,
        )

    def has_compliance(
        self, name: str, predicate: Column, min_value=None, max_value=None
    ) -> "Check":
        """Fraction of ALL rows where ``predicate`` holds (null-safe:
        nulls count as non-compliant), as the Compliance analyzer."""
        return self._add(
            f"Compliance({name})",
            F.sum(F.when(predicate, 1).otherwise(0)) / F.count(F.lit(1)),
            min_value,
            max_value,
        )

    def is_contained_in(self, column: str, values: list) -> "Check":
        """Every non-null value belongs to ``values``."""
        pred = F.col(column).isin(values) | F.col(column).isNull()
        return self._add(
            f"ContainedIn({column})",
            F.sum(F.when(pred, 1).otherwise(0)) / F.count(F.lit(1)),
            min_value=1.0,
        )

    def has_pattern(
        self, column: str, pattern: str, min_value=None, max_value=None
    ) -> "Check":
        """Fraction of ALL rows whose value matches ``pattern``."""
        return self._add(
            f"PatternMatch({column})",
            F.sum(F.when(F.col(column).rlike(pattern), 1).otherwise(0))
            / F.count(F.lit(1)),
            min_value,
            max_value,
        )


def run_check(df: DataFrame, check: Check) -> DataFrame:
    """Evaluate every constraint of ``check`` in ONE aggregation pass.

    Returns ``(check, constraint, metric, passed)`` — one row per
    constraint, ``passed`` = 1 iff the metric lies in the constraint's
    closed interval. The plan is a single partial+final hash aggregate
    over one scan however many constraints there are; the result frame
    is #constraints rows (metadata-scale).
    """
    if not check.constraints:
        raise ValueError("check has no constraints")
    aliases = [f"__c{i}" for i in range(len(check.constraints))]
    agged = df.agg(
        *[c.expr.alias(a) for c, a in zip(check.constraints, aliases)]
    )
    structs = []
    for c, a in zip(check.constraints, aliases):
        metric = F.col(a)
        cond = F.lit(True)
        if c.min_value is not None:
            cond = cond & (metric >= F.lit(float(c.min_value)))
        if c.max_value is not None:
            cond = cond & (metric <= F.lit(float(c.max_value)))
        structs.append(
            F.struct(
                F.lit(check.name).alias("check"),
                F.lit(c.name).alias("constraint"),
                F.round(metric, 6).alias("metric"),
                F.coalesce(cond, F.lit(False)).cast("int").alias("passed"),
            )
        )
    return agged.select(F.explode(F.array(*structs)).alias("r")).select("r.*")
