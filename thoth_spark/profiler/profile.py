"""The one-pass profiling pipeline.

``profile(df, ts_column)`` →  long metrics DataFrame
``(ts, entity, instance, name, value)``.

Execution shape (scale rationale):

- ONE ``groupBy(date_trunc(ts)).agg(every analyzer expression)`` job for
  all single-pass analyzers of all columns — a partial+final hash
  aggregation with whole-stage codegen; one shuffle keyed by the time
  bucket regardless of how many partitions/columns/analyzers there are.
  (The reference runs one Deequ job per time partition in a driver loop —
  ``/root/reference/thoth/profiler.py:313-336`` — which is O(#partitions)
  jobs; at 100 TB with years of history that's thousands of scans.)
- Plus one ``groupBy(ts, column)`` job per column that has
  frequency-based analyzers attached (shared across all such analyzers on
  the same column).
- Exact ``countDistinct`` over many columns triggers Spark's expand-based
  multi-distinct plan; the builder keeps it for reference parity, and
  :class:`~thoth_spark.profiler.analyzers.ApproxCountDistinct` is the
  documented scale path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from thoth_spark.profiler.analyzers import Analyzer, GroupingAnalyzer
from thoth_spark.profiler.builder import DefaultProfilingBuilder, ProfilingBuilder


class Granularity:
    """Time-partition granularities (the reference implements only DAY —
    ``/root/reference/thoth/profiler.py:222-240``; HOUR/WEEK/MONTH are a
    natural generalization via ``date_trunc``)."""

    DAY = "DAY"
    HOUR = "HOUR"
    WEEK = "WEEK"
    MONTH = "MONTH"

    _TRUNC = {"DAY": "day", "HOUR": "hour", "WEEK": "week", "MONTH": "month"}


def truncate_ts(col: Column | str, granularity: str = Granularity.DAY) -> Column:
    """Truncate a timestamp column to the granularity bucket (session TZ;
    sessions default to UTC via :func:`thoth_spark.session.get_spark`)."""
    return F.date_trunc(Granularity._TRUNC[granularity.upper()], col)


def profile(
    df: DataFrame,
    ts_column: str,
    profiling_builder: ProfilingBuilder | None = None,
    granularity: str = Granularity.DAY,
) -> DataFrame:
    """Profile every column of ``df`` per time partition.

    Args:
        df: input data; every column except ``ts_column`` is profiled.
        ts_column: timestamp column defining the partitions.
        profiling_builder: analyzer set; defaults to
            :class:`DefaultProfilingBuilder`.
        granularity: one of :class:`Granularity`.

    Returns:
        Long metrics DataFrame ``(ts timestamp, entity string,
        instance string, name string, value double)`` — lazy; nothing is
        collected to the driver.
    """
    builder = profiling_builder or DefaultProfilingBuilder()
    analyzers = builder.build_analyzers(df.drop(ts_column).schema.fields)
    if not analyzers:
        raise ValueError("ProfilingBuilder produced no analyzers for this schema.")
    base = df.withColumn("__ts__", truncate_ts(F.col(ts_column), granularity))

    singles = [a for a in analyzers if not isinstance(a, GroupingAnalyzer)]
    groupings = [a for a in analyzers if isinstance(a, GroupingAnalyzer)]

    parts: list[DataFrame] = []
    if singles:
        parts.append(_single_pass(base, singles))
    for grouping_cols, alist in _group_by_grouping(groupings).items():
        counts = _value_counts(base, grouping_cols)
        for analyzer in alist:
            parts.append(analyzer.long_rows(counts))

    result = parts[0]
    for p in parts[1:]:
        result = result.unionByName(p)
    return result


def _single_pass(base: DataFrame, singles: list[Analyzer]) -> DataFrame:
    """All single-pass analyzers in ONE groupBy(ts).agg(...)."""
    agg_map: dict[str, Column] = {}
    for a in singles:
        for alias, expr in a.agg_exprs():
            agg_map.setdefault(alias, expr)
    agged = base.groupBy("__ts__").agg(
        *[expr.alias(alias) for alias, expr in agg_map.items()]
    )
    structs = [
        F.struct(
            F.lit(a.entity).alias("entity"),
            F.lit(a.instance).alias("instance"),
            F.lit(name).alias("name"),
            expr.cast("double").alias("value"),
        )
        for a in singles
        for name, expr in a.outputs()
    ]
    return agged.select(
        F.col("__ts__").alias("ts"), F.explode(F.array(*structs)).alias("m")
    ).select("ts", "m.*")


def _group_by_grouping(
    groupings: list[GroupingAnalyzer],
) -> dict[tuple[str, ...], list[GroupingAnalyzer]]:
    by_group: dict[tuple[str, ...], list[GroupingAnalyzer]] = {}
    for a in groupings:
        by_group.setdefault(a.grouping, []).append(a)
    return by_group


def _value_counts(base: DataFrame, grouping_cols: tuple[str, ...]) -> DataFrame:
    """Shared per-value frequency frame for one column (or column pair):
    ``(__ts__, __val__[, __val2__], cnt)`` over non-null values."""
    val_aliases = ["__val__", "__val2__"][: len(grouping_cols)]
    cond = F.lit(True)
    for c in grouping_cols:
        cond = cond & F.col(c).isNotNull()
    sel = [F.col(c).cast("string").alias(a) for c, a in zip(grouping_cols, val_aliases)]
    return (
        base.where(cond)
        .groupBy(F.col("__ts__"), *sel)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
