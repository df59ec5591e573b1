"""Mergeable sketch profiling — incremental rollups without rescans.

The 100 TB problem with plain profiling: a weekly/monthly distinct count
or quantile CANNOT be derived from daily scalar metrics (distinct counts
don't add), so every new granularity costs another full scan of the raw
data. DataSketches sketches (HLL for distinct, KLL for quantiles —
Apache DataSketches, bundled with Spark 4) are MERGEABLE: union of two
sketches = sketch of the union, with proven error bounds. Profile the
raw data ONCE into per-bucket binary sketches, persist them (bytes per
bucket, not data-proportional), then answer any coarser granularity by
merging sketch bytes — a metadata-scale aggregation.

This is the engine-side equivalent of a timeseries-database "hypertable
rollup": continuous daily sketching + on-demand weekly/monthly rollup.

Pipeline::

    daily = sketch_profile(df, "ts", distinct_cols=[...], quantile_cols=[...])
    daily.write.parquet(...)            # sketches persist as binary columns
    weekly = rollup_sketches(daily, "week")   # NO raw-data access
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: supported rollup granularities (must be coarser than the sketch bucket)
_GRANULARITIES = {"day", "week", "month", "quarter", "year"}


def sketch_profile(
    df: DataFrame,
    ts_col: str,
    distinct_cols: list[str] | None = None,
    quantile_cols: list[str] | None = None,
    granularity: str = "day",
    kll_k: int = 200,
    hll_lgk: int = 12,
) -> DataFrame:
    """One pass over the raw data → one row per time bucket carrying
    binary sketches: ``hll_<col>`` (distinct-count sketch) per
    ``distinct_cols`` entry, ``kll_<col>`` (quantile sketch) per
    ``quantile_cols`` entry, plus exact ``row_count`` (counts ARE
    additive, no sketch needed)."""
    if granularity.lower() not in _GRANULARITIES:
        raise ValueError(f"granularity must be one of {sorted(_GRANULARITIES)}")
    aggs = [F.count(F.lit(1)).alias("row_count")]
    for c in distinct_cols or []:
        aggs.append(F.hll_sketch_agg(F.col(c), F.lit(hll_lgk)).alias(f"hll_{c}"))
    for c in quantile_cols or []:
        aggs.append(
            F.kll_sketch_agg_double(
                F.col(c).cast("double"), F.lit(kll_k)
            ).alias(f"kll_{c}")
        )
    return (
        df.groupBy(F.date_trunc(granularity, F.col(ts_col)).alias("ts"))
        .agg(*aggs)
    )


def rollup_sketches(
    sketch_df: DataFrame,
    granularity: str,
    quantiles: list[float] | None = None,
) -> DataFrame:
    """Merge finer-grained sketch rows into a coarser granularity and
    evaluate them: distinct-count estimates from HLL unions, quantile
    estimates from KLL merges, exact row counts from sums. Touches ONLY
    the sketch table — never the raw data."""
    if granularity.lower() not in _GRANULARITIES:
        raise ValueError(f"granularity must be one of {sorted(_GRANULARITIES)}")
    quantiles = quantiles or [0.5]
    aggs = [F.sum("row_count").alias("row_count")]
    outs = []
    for field in sketch_df.schema.fields:
        if field.name.startswith("hll_"):
            col = field.name[4:]
            aggs.append(F.hll_union_agg(field.name).alias(field.name))
            outs.append(
                F.hll_sketch_estimate(F.col(field.name)).alias(f"approx_distinct_{col}")
            )
        elif field.name.startswith("kll_"):
            col = field.name[4:]
            # kll_sketch_merge_double is a binary scalar (no aggregate
            # form) — fold it over the group's sketches; a week/month
            # merges a handful of KB-sized sketch blobs, driver-free
            aggs.append(
                F.expr(
                    f"aggregate(collect_list({field.name}),"
                    " cast(null as binary),"
                    " (acc, x) -> CASE WHEN acc IS NULL THEN x"
                    " ELSE kll_sketch_merge_double(acc, x) END)"
                ).alias(field.name)
            )
            outs.extend(
                F.kll_sketch_get_quantile_double(
                    F.col(field.name), F.lit(float(q))
                ).alias(f"q{q}_{col}")
                for q in quantiles
            )
    merged = sketch_df.groupBy(
        F.date_trunc(granularity, F.col("ts")).alias("ts")
    ).agg(*aggs)
    return merged.select("ts", "row_count", *outs)


#: bucket-spacing units for the trailing-window range predicate, keyed by
#: the SAME granularity set :func:`sketch_profile` accepts (_GRANULARITIES)
#: — r7 advice: the old map omitted quarter/year (so trailing_distinct
#: raised on quarterly/yearly sketch tables sketch_profile happily
#: produces) and included hour (which sketch_profile rejects). Spark
#: intervals have no quarter unit, so each entry is (multiplier, unit):
#: a quarter step is 3 months.
_GRANULARITY_INTERVAL = {
    "day": (1, "days"),
    "week": (1, "weeks"),
    "month": (1, "months"),
    "quarter": (3, "months"),
    "year": (1, "years"),
}


def trailing_distinct(
    sketch_df: DataFrame,
    hll_cols: list[str] | None = None,
    window_buckets: int = 7,
    granularity: str = "day",
) -> DataFrame:
    """Trailing-window distinct counts from stored per-bucket sketches —
    the WAU/MAU pattern: day d's trailing-7 distinct users = the HLL
    union of days d-6..d, so a year of daily actives costs 365 sketch
    merges instead of 365 rescans of raw events (at 100 TB the
    difference between a dashboard query and a cluster-day). Distinct
    counts don't sum — overlapping users would double-count — which is
    exactly what the mergeable sketch solves.

    Self-joins the bucket-level sketch table (one row per bucket:
    aggregate-sized metadata, broadcast) on a bucket-range predicate,
    then one ``hll_union_agg`` per trailing window. Trailing row counts
    come from exact sums (counts ARE additive).

    Returns ``(ts, trailing_buckets, trailing_rows,
    trailing_distinct_<col>...)`` — ramp-up rows at the series start
    use however many buckets exist (their count is reported).

    ``granularity`` must name the bucket spacing of ``sketch_df``
    (the granularity it was :func:`sketch_profile`-d at) — the range
    predicate is built in those units, so a monthly sketch table with
    ``granularity="month"`` yields true trailing-N-month windows
    instead of silently matching only each bucket itself."""
    step = _GRANULARITY_INTERVAL.get(str(granularity).lower())
    if step is None:
        raise ValueError(
            f"granularity must be one of {sorted(_GRANULARITY_INTERVAL)},"
            f" got {granularity!r}"
        )
    mult, unit = step
    hll_cols = hll_cols or [
        f.name[4:] for f in sketch_df.schema.fields if f.name.startswith("hll_")
    ]
    anchor = sketch_df.select(F.col("ts").alias("__d")).distinct()
    lo = F.col("__d") - F.expr(
        f"interval {mult * (int(window_buckets) - 1)} {unit}"
    )
    joined = anchor.join(
        sketch_df, (F.col("ts") >= lo) & (F.col("ts") <= F.col("__d"))
    )
    aggs = [
        F.count(F.lit(1)).alias("trailing_buckets"),
        F.sum("row_count").alias("trailing_rows"),
    ]
    outs = [F.col("__d").alias("ts"), "trailing_buckets", "trailing_rows"]
    for c in hll_cols:
        aggs.append(F.hll_union_agg(f"hll_{c}").alias(f"__u_{c}"))
        outs.append(
            F.hll_sketch_estimate(F.col(f"__u_{c}")).alias(f"trailing_distinct_{c}")
        )
    return joined.groupBy("__d").agg(*aggs).select(*outs)


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005) — mergeable heavy-hitter
# counting with a HARD one-sided error: estimates never undercount.
# ---------------------------------------------------------------------------


def _cms_pos(key, r: int, width: int):
    """Row-``r`` counter position for ``key`` — the repo-standard
    engine-portable md5 scheme (same as membership.hash_position), so
    the sketch CONTENT, collisions included, is deterministic and
    SQL-replayable."""
    from thoth_spark.operators.membership import hash_position

    return hash_position(key, r, width)


def cms_build(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Build a count-min sketch over the ``key_col`` STREAM (one row =
    one occurrence): returns the sketch as ``(row, pos, cnt)`` — at
    most ``depth × width`` cells regardless of corpus size, produced by
    one explode(depth) + one partial-aggregable groupBy. Where
    approx_top_k answers "which keys are heavy", CMS answers "how heavy
    is THIS key" for any key, post hoc, from a fixed-size table.

    Mergeable: CMS cells add — :func:`cms_merge` unions sketches of
    disjoint slices (shards, days) into the sketch of the whole, the
    same no-rescan contract as the HLL/KLL rollups above."""
    k = F.col(key_col)
    cell = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(r).alias("row"), _cms_pos(k, r, width).alias("pos")
                )
                for r in range(depth)
            ]
        )
    )
    return (
        df.select(cell.alias("c"))
        .select("c.row", "c.pos")
        .groupBy("row", "pos")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Union CMS sketches built with the SAME (depth, width): cells add."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "pos").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    broadcast: bool = True,
) -> DataFrame:
    """Point-estimate every probe key against a :func:`cms_build`
    sketch: ``est = min over rows of the key's counter`` — ≥ the true
    count ALWAYS (one-sided), ≤ true + εN with probability 1−δ for
    ε = e/width, δ = e^−depth. Returns ``(key_col, est)``. The sketch
    side is ≤ depth×width rows — broadcast by default; probes can be
    corpus-sized."""
    p = probes.select(F.col(key_col)).distinct()
    legs = p.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _cms_pos(F.col(key_col), r, width).alias("pos"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("c"),
    ).select(key_col, "c.row", "c.pos")
    s = F.broadcast(sketch) if broadcast else sketch
    return (
        legs.join(s, ["row", "pos"], "left")
        .select(key_col, F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt"))
        .groupBy(key_col)
        .agg(F.min("cnt").alias("est"))
    )
