"""Relational building blocks Spark lacks as single operators.

- :func:`asof_join` — most-recent-match join via the union+window trick:
  ONE shuffle on (key, ts) instead of the O(n·m) range-join explosion a
  naive ``left.ts >= right.ts`` theta-join produces.
- :func:`sessionize` — gap-based session ids with lag + running sum.
- :func:`top_k_per_group` — rank-and-filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.ts <= left.ts`` (backward as-of, per join key).

    Implementation: tag both sides, union, sort within key by (ts, tag)
    and carry the last non-null right values forward with
    ``last(ignorenulls)`` — a single shuffle keyed by ``on``, linear in
    rows, no range-join blowup. Right rows at exactly left.ts match
    (ties: right sorts before left at equal ts).
    """
    value_cols = value_cols or [
        c for c in right.columns if c not in on and c != right_ts
    ]
    l_tagged = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in value_cols],
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
    )
    r_tagged = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
        F.lit(None)
        .cast(l_tagged.schema["__lrow"].dataType)
        .alias("__lrow"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    w = (
        W.partitionBy(*on)
        .orderBy("__ts", "__side")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    filled = unioned.select(
        "__side",
        "__lrow",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__r_{c}")
            for c in value_cols
        ],
    ).where(F.col("__side") == 1)
    return filled.select(
        F.col("__lrow.*"),
        *[F.col(f"__r_{c}").alias(f"{c}{suffix}") for c in value_cols],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_lo: str,
    right_hi: str,
    bin_width: float,
    on: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval join (``right_lo <= left_point <= right_hi``)
    as a shuffled EQUI-join instead of the O(n·m) nested-loop plan a
    theta-join produces.

    Spark turns a bare inequality join into BroadcastNestedLoopJoin (or
    a cartesian product) — every left row is compared against every
    right row, which is unrunnable at 100 TB. The classic bin trick
    makes it an equi-join: bucket the number line into ``bin_width``-wide
    bins; a left point belongs to exactly one bin, a right interval is
    exploded onto every bin it overlaps, and the pair can only meet in
    the point's bin — so joining on bin (plus any ``on`` equi-keys) finds
    every candidate exactly once (no post-join dedup needed), and an
    exact containment filter removes same-bin near-misses.

    Scale: one shuffle on (bin, *on); the right side grows by
    ``interval_width / bin_width + 1``×, so pick ``bin_width`` near the
    TYPICAL interval width — explode factor stays O(1) while each bin's
    population stays bounded. Point and bound columns must be numeric
    (cast dates/timestamps via ``unix_date``/``unix_timestamp`` first).
    Supports ``inner`` and ``left_semi``.
    """
    if bin_width <= 0:
        raise ValueError(f"bin_width must be positive, got {bin_width}")
    if how not in ("inner", "left_semi"):
        raise ValueError(f"range_join supports inner/left_semi, got {how!r}")
    on = on or []
    l_binned = left.withColumn(
        "__bin", F.floor(F.col(left_point).cast("double") / bin_width)
    )
    r_binned = right.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(right_lo).cast("double") / bin_width),
                F.floor(F.col(right_hi).cast("double") / bin_width),
            )
        ),
    )
    contained = (F.col(f"l.{left_point}") >= F.col(f"r.{right_lo}")) & (
        F.col(f"l.{left_point}") <= F.col(f"r.{right_hi}")
    )
    cond = contained & (F.col("l.__bin") == F.col("r.__bin"))
    for k in on:
        cond = cond & (F.col(f"l.{k}") == F.col(f"r.{k}"))
    joined = l_binned.alias("l").join(r_binned.alias("r"), cond, how)
    if how == "left_semi":
        return joined.drop("__bin")
    return joined.select(
        *[F.col(f"l.{c}") for c in left.columns],
        *[
            F.col(f"r.{c}")
            for c in right.columns
            if c not in on and c not in left.columns
        ],
    )


def sessionize(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Assign gap-based session ids per key: a new session starts when the
    time since the previous event exceeds ``gap_seconds``. Adds
    ``session_id`` (1-based per key). One shuffle on the key.
    ``tiebreak_cols`` make ordering of equal timestamps deterministic."""
    w = W.partitionBy(*key_cols).orderBy(ts_col, *(tiebreak_cols or []))
    gap = F.col(ts_col).cast("double") - F.lag(F.col(ts_col).cast("double")).over(w)
    new_session = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    return df.withColumn(
        "session_id",
        F.sum(new_session).over(w.rowsBetween(W.unboundedPreceding, 0)),
    )


def top_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    k: int,
    ascending: bool = False,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Top-k rows per group by ``order_col`` (deterministic with
    tiebreaks). Adds ``rank``."""
    order = [F.col(order_col).asc() if ascending else F.col(order_col).desc()]
    order += [F.col(c) for c in (tiebreak_cols or [])]
    w = W.partitionBy(*group_cols).orderBy(*order)
    return df.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: hot keys no longer land in one task.

    The (large, skewed) left side gets a uniform random salt in
    ``[0, salt_buckets)``; the (smaller) right side is exploded
    ``salt_buckets``× so every salted key finds its match. Each hot key's
    rows spread across ``salt_buckets`` tasks at the cost of replicating
    the right side — the classic manual remedy when AQE's skew-join split
    can't kick in (e.g. the skew only materializes after upstream
    transforms). Result equals ``left.join(right, on, how)`` row-for-row.

    Supports ``inner`` and ``left`` joins (semantics of other types don't
    survive salting unchanged).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salted_l = left.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    salted_r = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    return salted_l.join(salted_r, on=[*on, "__salt"], how=how).drop("__salt")


def global_rank(
    df: DataFrame,
    order_cols: list[Column | str],
    rank_col: str = "rank",
    num_partitions: int | None = None,
    keep_total: bool = False,
) -> DataFrame:
    """Dense total-order row numbering WITHOUT a single-partition sort.

    ``row_number().over(Window.orderBy(...))`` funnels every row through
    one task — the classic scale killer for global analytics. Instead:
    range-repartition on the order keys (parallel sort), rank locally
    per partition, then add each partition's cumulative row offset
    (a tiny per-partition count aggregate, broadcast back).

    ``order_cols`` should end with a unique tiebreak column — range
    boundaries are sampled, so equal keys can straddle partitions; a
    total order keeps the result exact and deterministic regardless.
    """
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(parts, *order_cols).withColumn(
        "__pid", F.spark_partition_id()
    )
    local = ranged.withColumn(
        "__lr", F.row_number().over(W.partitionBy("__pid").orderBy(*order_cols))
    )
    offsets = (
        local.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("__n"))
        .withColumn(
            "__off",
            F.coalesce(
                F.sum("__n").over(
                    W.orderBy("__pid").rowsBetween(W.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("__pid", "__off", F.sum("__n").over(W.partitionBy(F.lit(1))).alias("__total"))
    )
    out = (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(rank_col, F.col("__off") + F.col("__lr"))
        .drop("__pid", "__lr", "__off")
    )
    return out if keep_total else out.drop("__total")


def distributed_ntile(
    df: DataFrame,
    order_cols: list[Column | str],
    n: int,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Exact ``ntile(n)`` semantics (first N%n buckets get one extra row)
    built on :func:`global_rank` — no single-partition exchange anywhere
    in the plan."""
    ranked = global_rank(df, order_cols, rank_col="__gr", keep_total=True)
    base = F.floor(F.col("__total") / n)
    rem = F.col("__total") % n
    big_span = rem * (base + 1)
    bucket = F.when(
        F.col("__gr") <= big_span, F.floor((F.col("__gr") - 1) / (base + 1)) + 1
    ).otherwise(rem + F.floor((F.col("__gr") - big_span - 1) / base) + 1)
    return ranked.withColumn(bucket_col, bucket.cast("int")).drop("__gr", "__total")


def funnel(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    step_col: str,
    steps: list[str],
) -> DataFrame:
    """Ordered-funnel analysis: per key, the furthest stage reached where
    each stage's event must occur strictly AFTER the previous stage's
    earliest qualifying event (signup → click → purchase, in order).

    Returns one row per key with ``stage_i_ts`` (earliest qualifying
    timestamp per stage, null once the funnel breaks) and
    ``stages_completed``. The per-stage conversion table is then a tiny
    ``groupBy(stages_completed)`` away.

    Physical shape: events filter map-side to the step set, then ONE
    shuffle keyed by the funnel key; the stage recursion
    (``stage_k = min(ts WHERE step = steps[k] AND ts > stage_{k-1})``)
    folds over the per-key event list with JVM array expressions — no
    windows, no joins, no per-stage passes regardless of funnel length.
    Memory bound: the per-key list holds only FUNNEL-STEP events inside
    the analysis window (ObjectHashAggregate spills past
    ``spark.sql.objectHashAggregate.sortBased.fallbackThreshold``); a
    key with pathologically many funnel events degrades to a sort-based
    fold, not an OOM. If per-key funnel volume is truly unbounded,
    chain k filtered min-aggregations instead (k shuffles, O(1)
    state)."""
    relevant = df.where(F.col(step_col).isin(steps))
    grouped = relevant.groupBy(*key_cols).agg(
        F.collect_list(F.struct(F.col(ts_col).alias("t"), F.col(step_col).alias("s"))).alias(
            "__ev"
        )
    )
    # fold the ordered-stage recursion over the collected event list with
    # array expressions (JVM-side; per-key event counts are session-scale)
    def _first_pred(step):
        return lambda e: e["s"] == F.lit(step)

    def _chain_pred(step, prev_col):
        return lambda e: (e["s"] == F.lit(step)) & (e["t"] > prev_col)

    cols = []
    prev = None
    for i, step in enumerate(steps):
        pred = _first_pred(step) if prev is None else _chain_pred(step, prev)
        expr = F.array_min(
            F.transform(F.filter(F.col("__ev"), pred), lambda e: e["t"])
        )
        alias = f"stage{i + 1}_ts"
        grouped = grouped.withColumn(alias, expr)
        prev = F.col(alias)
        cols.append(alias)
    completed = sum(
        (F.when(F.col(c).isNotNull(), 1).otherwise(0) for c in cols), F.lit(0)
    )
    return grouped.select(*key_cols, *cols, completed.alias("stages_completed"))


def cohort_retention(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    bucket: str = "week",
) -> DataFrame:
    """Cohort retention triangle: users bucketed by their FIRST-activity
    period, then for each (cohort, period-offset) the fraction of the
    cohort active in that period.

    Returns (cohort, offset, active, cohort_size, retention_rate) with
    offset 0 = the cohort's first period (retention 1.0 by construction).

    Physical shape: one ``groupBy(key)`` min for cohort assignment, one
    distinct over (key, period) for activity — both shuffle on the user
    key and AQE coalesces them — then the retention aggregation runs on
    the (users × active periods) frame and cohort sizes (a
    #cohorts-row aggregate) broadcast back. Nothing is ever keyed by the
    (tiny, hot) cohort value until the data is already aggregate-sized."""
    period = F.date_trunc(bucket, F.col(ts_col)).cast("date")
    first = df.groupBy(*key_cols).agg(F.min(period).alias("cohort"))
    active = df.select(*key_cols, period.alias("__p")).distinct()
    joined = active.join(first, key_cols).withColumn(
        "offset", F.datediff(F.col("__p"), F.col("cohort"))
    )
    counts = joined.groupBy("cohort", "offset").agg(
        F.count(F.lit(1)).alias("active")
    )
    sizes = first.groupBy("cohort").agg(F.count(F.lit(1)).alias("cohort_size"))
    return (
        counts.join(F.broadcast(sizes), "cohort")
        .select(
            "cohort",
            "offset",
            "active",
            "cohort_size",
            F.round(F.col("active") / F.col("cohort_size"), 6).alias("retention_rate"),
        )
    )


def grouped_global_rank(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column | str],
    rank_col: str = "rank",
    num_partitions: int | None = None,
    keep_group_total: bool = False,
) -> DataFrame:
    """Per-group total-order ranking WITHOUT per-group windows.

    ``row_number().over(Window.partitionBy(group).orderBy(...))`` puts
    each group in ONE task — a group owning half the corpus (one crawl
    source, one language) serializes through a single sort. Instead:
    range-repartition on (group, order) so groups SPAN partitions while
    staying contiguous, rank locally, then add per-(group, partition)
    cumulative offsets — a #groups × #partitions-row aggregate,
    broadcast back. Output is exact: rank 1..n within each group.

    ``order_cols`` should end with a unique tiebreak column (range
    boundaries are sampled; a total order keeps results deterministic).
    """
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    gcols = [F.col(c) for c in group_cols]
    ranged = df.repartitionByRange(parts, *gcols, *order_cols).withColumn(
        "__pid", F.spark_partition_id()
    )
    local = ranged.withColumn(
        "__lr",
        F.row_number().over(
            W.partitionBy("__pid", *group_cols).orderBy(*order_cols)
        ),
    )
    offsets = (
        local.groupBy("__pid", *group_cols)
        .agg(F.count(F.lit(1)).alias("__n"))
        .withColumn(
            "__off",
            F.coalesce(
                F.sum("__n").over(
                    W.partitionBy(*group_cols)
                    .orderBy("__pid")
                    .rowsBetween(W.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .withColumn(
            "__gtotal", F.sum("__n").over(W.partitionBy(*group_cols))
        )
        .select("__pid", *group_cols, "__off", "__gtotal")
    )
    out = (
        local.join(F.broadcast(offsets), ["__pid", *group_cols])
        .withColumn(rank_col, F.col("__off") + F.col("__lr"))
        .drop("__pid", "__lr", "__off")
    )
    return out if keep_group_total else out.drop("__gtotal")
