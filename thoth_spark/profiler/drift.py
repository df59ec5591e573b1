"""Distribution-drift detection against a frozen reference window: the
per-bucket Population Stability Index (:func:`psi_daily`) and the
two-sample binned Kolmogorov–Smirnov distance (:func:`ks_daily`,
round 5) of a numeric column.

The anomaly layer (thoth_spark.anomaly) watches point metrics (mean,
count, distinct...) over time; these watch the SHAPE of the value
distribution — a mean-preserving regime change (e.g. variance doubling,
bimodality appearing) sails through a mean monitor but moves both
immediately. PSI reads as a log-weighted divergence index (< 0.1
stable, 0.1–0.25 drifting, > 0.25 population shift); KS reads in
probability units (max CDF gap) and carries a distribution-free
critical value, so it alarms on principled significance rather than a
rule of thumb.

Scale design (100 TB):
- Reference quantile edges are ONE exact-percentile aggregation over the
  reference window (a bounded slice), produced as a 1-row frame and
  broadcast — no driver-side collect in the plan.
- Bucketing is a JVM higher-order function (``size(filter(edges, ...))``)
  — no UDF, no shuffle; the only exchanges are the two tiny
  ``(bucket)`` / ``(day, bucket)`` count aggregations, whose volume is
  O(#days × n_bins), independent of input rows.
- Laplace smoothing (+0.5 per bucket) keeps PSI finite when a bucket
  empties — the formula stays a pure column expression, replayable in
  ANSI SQL (see ORACLE_PSI_DRIFT in entry_queries.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

#: Kolmogorov critical-value coefficient c(α) at α = 0.05: reject
#: equality when D > c(α)·sqrt((n+m)/(n·m)) (two-sample asymptotic).
KS_COEFF_05 = 1.358


def quantile_edges(
    ref: DataFrame, value_col: str, n_bins: int = 10, round_to: int = 6
) -> DataFrame:
    """1-row frame with ``edges``: the ``n_bins - 1`` interior exact
    quantiles of ``value_col`` over ``ref``, rounded so an independent
    engine (the DuckDB oracle) derives bit-identical bucket boundaries."""
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    probs = F.array(*[F.lit(i / n_bins) for i in range(1, n_bins)])
    return ref.agg(
        F.transform(
            F.percentile(F.col(value_col), probs),
            lambda e: F.round(e, round_to),
        ).alias("edges")
    )


def bucket_of(value: Column, edges: Column) -> Column:
    """Bucket index in [0, n_bins): number of edges strictly below the
    value — a JVM higher-order function, no UDF."""
    return F.size(F.filter(edges, lambda e: value > e))


def freeze_reference(
    ref: DataFrame, value_col: str, n_bins: int = 10
) -> tuple[DataFrame, DataFrame]:
    """Freeze a drift reference: the quantile ``edges`` (1 row) and the
    reference bucket counts ``ref_b`` (≤ n_bins rows). Both are
    metadata-scale and broadcastable — compute them ONCE over the
    reference window, then score any number of current slices (batch
    days or streaming micro-batches) against them without rescanning
    the reference."""
    # lazy checkpoints: edges and the bucket counts each feed SEVERAL
    # consumers downstream (reference bucketing, day bucketing, the
    # dense grid, totals) — without the barrier every consumer re-plans
    # the whole reference scan + percentile aggregation (measured: 11
    # FileScans in one ks_daily plan), which at 100 TB re-reads the
    # reference window per consumer. Values are unchanged (the frames
    # are materialized once and reread), so oracle hashes are unaffected.
    edges = quantile_edges(ref, value_col, n_bins).localCheckpoint(eager=False)
    ref_b = (
        ref.crossJoin(F.broadcast(edges))
        .select(bucket_of(F.col(value_col), F.col("edges")).alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("rc"))
        .localCheckpoint(eager=False)
    )
    return edges, ref_b


def psi_daily(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    ref_end: str,
    n_bins: int = 10,
    eps: float = 0.5,
) -> DataFrame:
    """Per-day PSI of ``value_col`` against the reference window
    ``ts < ref_end``; returns ``(d, n, psi)`` for days at/after
    ``ref_end``. ``eps`` is the Laplace count added to every bucket."""
    clean = df.where(F.col(value_col).isNotNull()).select(ts_col, value_col)
    ref = clean.where(F.col(ts_col) < F.lit(ref_end).cast("timestamp"))
    cur = clean.where(F.col(ts_col) >= F.lit(ref_end).cast("timestamp"))
    edges, ref_b = freeze_reference(ref, value_col, n_bins)
    return psi_against_reference(cur, ts_col, value_col, edges, ref_b, n_bins, eps)


def ks_daily(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    ref_end: str,
    n_bins: int = 20,
    alpha_coeff: float = KS_COEFF_05,
) -> DataFrame:
    """Per-day two-sample Kolmogorov–Smirnov drift of ``value_col``
    against the reference window ``ts < ref_end``: the max |ΔCDF|
    between each day and the reference, evaluated on the reference's
    frozen ``n_bins``-quantile grid (binned KS — the grid bounds the
    statistic's resolution at 1/n_bins, which is exactly the drift
    magnitude worth alarming on; raise ``n_bins`` for finer
    sensitivity). Complements PSI: KS reads in probability units
    (max CDF gap) with a distribution-free critical value, while PSI
    weights tail buckets logarithmically.

    Returns ``(d, n, ks, ks_alarm)`` where ``ks_alarm`` applies the
    asymptotic α=0.05 rejection bound ``c(α)·sqrt((n+m)/(n·m))``.

    Same scale shape as :func:`psi_daily`: one exact-percentile pass
    over the bounded reference, bucketing as a JVM higher-order
    function, and every post-count frame is O(#days × n_bins)
    metadata (the CDF cumulative windows run on that tiny grid, never
    on input rows)."""
    clean = df.where(F.col(value_col).isNotNull()).select(ts_col, value_col)
    ref = clean.where(F.col(ts_col) < F.lit(ref_end).cast("timestamp"))
    cur = clean.where(F.col(ts_col) >= F.lit(ref_end).cast("timestamp"))
    edges, ref_b = freeze_reference(ref, value_col, n_bins)
    return ks_against_reference(
        cur, ts_col, value_col, edges, ref_b, n_bins, alpha_coeff
    )


def ks_against_reference(
    cur: DataFrame,
    ts_col: str,
    value_col: str,
    edges: DataFrame,
    ref_b: DataFrame,
    n_bins: int = 20,
    alpha_coeff: float = KS_COEFF_05,
) -> DataFrame:
    """Per-day binned KS of ``cur`` against a FROZEN reference (see
    :func:`freeze_reference` — pass the same ``n_bins``)."""
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    day_b = (
        cur.crossJoin(F.broadcast(edges))
        .select(
            F.date_trunc("day", F.col(ts_col)).alias("d"),
            bucket_of(F.col(value_col), F.col("edges")).alias("b"),
        )
        .groupBy("d", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        # three consumers (grid days, the count join, day totals) — one
        # barrier instead of three scans of the current-side input
        .localCheckpoint(eager=False)
    )
    grid = (
        day_b.select("d")
        .distinct()
        .crossJoin(
            F.broadcast(
                edges.select(
                    F.explode(F.sequence(F.lit(0), F.lit(n_bins - 1))).alias("b")
                )
            )
        )
    )
    ref_tot = ref_b.agg(F.sum("rc").alias("rn"))
    day_tot = day_b.groupBy("d").agg(F.sum("c").alias("n"))
    # CDF gap at each interior quantile edge e_{b+1} = |prefix-share
    # difference through bucket b|; the final bucket's prefix is 1 for
    # both sides, so it is excluded from the max. The cumulative windows
    # partition by day over n_bins rows — metadata-scale, never input.
    wcum = W.partitionBy("d").orderBy("b").rowsBetween(W.unboundedPreceding, 0)
    gap = F.abs(
        F.sum("c_full").over(wcum) / F.col("n")
        - F.sum("rc_full").over(wcum) / F.col("rn")
    )
    # counts as doubles BEFORE multiplying: n·m on longs overflows once
    # day × reference row counts pass ~9.2e18 (real at 100 TB)
    nn, mm = F.col("n").cast("double"), F.col("rn").cast("double")
    crit = F.lit(alpha_coeff) * F.sqrt((nn + mm) / (nn * mm))
    return (
        grid.join(day_b, ["d", "b"], "left")
        .withColumn("c_full", F.coalesce(F.col("c"), F.lit(0)).cast("double"))
        .join(F.broadcast(ref_b), "b", "left")
        .withColumn("rc_full", F.coalesce(F.col("rc"), F.lit(0)).cast("double"))
        .join(F.broadcast(day_tot), "d")
        .crossJoin(F.broadcast(ref_tot))
        .withColumn("__gap", F.when(F.col("b") < n_bins - 1, gap))
        .groupBy("d")
        .agg(
            F.max("n").cast("long").alias("n"),
            F.round(F.max("__gap"), 6).alias("ks"),
            (F.max("__gap") > F.max(crit)).cast("int").alias("ks_alarm"),
        )
    )


def psi_against_reference(
    cur: DataFrame,
    ts_col: str,
    value_col: str,
    edges: DataFrame,
    ref_b: DataFrame,
    n_bins: int = 10,
    eps: float = 0.5,
) -> DataFrame:
    """Per-day PSI of ``cur`` against a FROZEN reference (see
    :func:`freeze_reference`) — the shared core of batch
    :func:`psi_daily` and the streaming foreachBatch drift monitor."""
    day_b = (
        cur.crossJoin(F.broadcast(edges))
        .select(
            F.date_trunc("day", F.col(ts_col)).alias("d"),
            bucket_of(F.col(value_col), F.col("edges")).alias("b"),
        )
        .groupBy("d", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        # three consumers (grid days, the count join, day totals) — one
        # barrier instead of three scans of the current-side input
        .localCheckpoint(eager=False)
    )
    # dense (day × bucket) grid so empty buckets still contribute their
    # smoothed term; the grid is O(#days × n_bins) rows — metadata-scale
    grid = (
        day_b.select("d")
        .distinct()
        .crossJoin(
            F.broadcast(
                edges.select(
                    F.explode(F.sequence(F.lit(0), F.lit(n_bins - 1))).alias("b")
                )
            )
        )
    )
    ref_tot = ref_b.agg(F.sum("rc").alias("rn"))
    day_tot = day_b.groupBy("d").agg(F.sum("c").alias("n"))
    p = F.col("c_full") + F.lit(eps)
    q = F.col("rc_full") + F.lit(eps)
    pn = F.col("n") + F.lit(eps * n_bins)
    qn = F.col("rn") + F.lit(eps * n_bins)
    term = (p / pn - q / qn) * F.log((p / pn) / (q / qn))
    return (
        grid.join(day_b, ["d", "b"], "left")
        .withColumn("c_full", F.coalesce(F.col("c"), F.lit(0)))
        .join(F.broadcast(ref_b), "b", "left")
        .withColumn("rc_full", F.coalesce(F.col("rc"), F.lit(0)))
        .join(F.broadcast(day_tot), "d")
        .crossJoin(F.broadcast(ref_tot))
        .groupBy("d")
        .agg(
            F.max("n").alias("n"),
            F.round(F.sum(term), 6).alias("psi"),
        )
    )


def profile_diff(
    old_metrics: DataFrame,
    new_metrics: DataFrame,
    key_cols: list[str] | None = None,
    rel_tol: float = 0.0,
) -> DataFrame:
    """Metric-level diff between two profiling runs — the data-quality
    twin of the corpus snapshot diff: after changing a pipeline (new
    parser, new dedup setting), profile the output and diff against the
    previous run's metrics to see exactly WHICH statistic moved on WHICH
    day. Returns one row per metric point with status
    ``added`` / ``removed`` / ``changed`` / ``unchanged`` and both
    values; ``rel_tol`` treats relative changes up to the tolerance as
    unchanged (0 = exact).

    One full-outer join on the metric key — both sides are
    aggregate-sized metric frames (days × metrics), so this is
    driver-cheap at any raw-data scale."""
    key_cols = key_cols or ["ts", "entity", "instance", "name"]
    o = old_metrics.select(*key_cols, F.col("value").alias("old_value"))
    n = new_metrics.select(*key_cols, F.col("value").alias("new_value"))
    j = o.join(n, key_cols, "full_outer")
    same = (
        F.col("old_value").eqNullSafe(F.col("new_value"))
        if rel_tol == 0
        else (
            F.col("old_value").eqNullSafe(F.col("new_value"))
            | (
                F.abs(F.col("new_value") - F.col("old_value"))
                <= rel_tol * F.abs(F.col("old_value"))
            )
        )
    )
    status = (
        F.when(F.col("old_value").isNull() & F.col("new_value").isNotNull(), "added")
        .when(F.col("new_value").isNull() & F.col("old_value").isNotNull(), "removed")
        .when(same, "unchanged")
        .otherwise("changed")
    )
    return j.select(*key_cols, "old_value", "new_value", status.alias("status"))


#: synthetic category absorbing current values unseen in the reference.
CHI2_OTHER = "__other__"


def freeze_categorical_reference(
    ref: DataFrame, cat_col: str, eps: float = 0.5
) -> DataFrame:
    """Frozen per-category reference probabilities for chi-square drift:
    ``(c, p)`` over the reference's categories PLUS a ``__other__`` slot
    holding the Laplace mass for categories never seen in the reference
    — so a future batch introducing a brand-new category (the loudest
    drift there is) gets a finite, loud expected count instead of being
    silently dropped or dividing by zero. Probabilities are
    ``(count + eps) / (n + eps*(k+1))`` — they sum to 1 across the k
    reference categories plus the other-slot.

    Computed ONCE (one groupBy over the bounded reference window) and
    broadcast into every later comparison — the streaming monitor never
    rescans the reference."""
    ref_n = ref.count()
    rc = ref.groupBy(F.col(cat_col).alias("c")).agg(F.count(F.lit(1)).alias("rc"))
    k = rc.count()
    denom = float(ref_n) + float(eps) * (k + 1)
    probs = rc.select(
        "c", ((F.col("rc") + F.lit(float(eps))) / F.lit(denom)).alias("p")
    )
    other = ref.sparkSession.createDataFrame(
        [(CHI2_OTHER, float(eps) / denom)], "c string, p double"
    )
    return probs.unionByName(other)


def chi2_against_reference(
    cur: DataFrame,
    ts_col: str,
    cat_col: str,
    probs: DataFrame,
    critical: float = 11.070497693516351,
) -> DataFrame:
    """Per-day chi-square statistic of ``cat_col``'s category mix
    against frozen reference probabilities from
    :func:`freeze_categorical_reference`:
    ``chi2 = sum_c (o_c - n*p_c)^2 / (n*p_c)`` over the frozen category
    set, with current values unseen in the reference mapped to the
    ``__other__`` slot. ``critical`` is the ``chi2_alarm`` rejection
    bound — default is the α=0.05 quantile for df=5 (five reference
    categories + other-slot − 1); pass the value for your df.

    Scale shape: one ``groupBy(day, category)`` over current rows (a
    low-cardinality-keyed shuffle with map-side partial aggregation);
    every later frame is O(days × categories) metadata and the frozen
    probabilities broadcast into the mapping join AND the dense grid.

    Returns ``(d, n, chi2, chi2_alarm)``."""
    known = probs.where(F.col("c") != CHI2_OTHER).select("c")
    mapped = (
        cur.where(F.col(cat_col).isNotNull())
        .select(
            F.date_trunc("day", F.col(ts_col)).alias("d"),
            F.col(cat_col).alias("c"),
        )
        .join(F.broadcast(known.withColumn("__k", F.lit(True))), "c", "left")
        .select(
            "d", F.when(F.col("__k").isNotNull(), F.col("c")).otherwise(CHI2_OTHER).alias("c")
        )
    )
    day_counts = mapped.groupBy("d", "c").agg(F.count(F.lit(1)).alias("o"))
    days = day_counts.groupBy("d").agg(F.sum("o").alias("n"))
    dense = days.crossJoin(F.broadcast(probs)).join(day_counts, ["d", "c"], "left")
    o = F.coalesce(F.col("o"), F.lit(0)).cast("double")
    e = F.col("n") * F.col("p")
    return (
        dense.groupBy("d", "n")
        .agg(F.sum((o - e) * (o - e) / e).alias("chi2"))
        .select(
            "d",
            "n",
            "chi2",
            (F.col("chi2") > F.lit(float(critical))).alias("chi2_alarm"),
        )
    )


def chi2_daily(
    df: DataFrame,
    ts_col: str,
    cat_col: str,
    ref_end: str,
    eps: float = 0.5,
    critical: float = 11.070497693516351,
) -> DataFrame:
    """Per-day chi-square drift of a CATEGORICAL column against the
    reference window ``ts < ref_end`` — completes the drift family:
    PSI (log-weighted, numeric bins), KS (max CDF gap, numeric), chi2
    (the classic goodness-of-fit test for category mixes: event-type
    shares, language mix, source mix). Freeze + compare composition —
    the same frozen probabilities drive the streaming monitor
    (:func:`thoth_spark.streaming.stream.chi2_foreach_batch`), so batch
    and streaming readings agree (chi2 to within float-summation order)."""
    clean = df.where(F.col(cat_col).isNotNull()).select(ts_col, cat_col)
    ref = clean.where(F.col(ts_col) < F.lit(ref_end).cast("timestamp"))
    cur = clean.where(F.col(ts_col) >= F.lit(ref_end).cast("timestamp"))
    probs = freeze_categorical_reference(ref, cat_col, eps)
    return chi2_against_reference(cur, ts_col, cat_col, probs, critical)


def embedding_drift(
    ref: DataFrame,
    cur: DataFrame,
    vec_col: str = "embedding",
    dim: int | None = None,
    max_shift: float = 0.5,
    max_energy_dev: float = 0.5,
    round_to: int = 6,
) -> DataFrame:
    """Embedding-SPACE drift between two corpus snapshots — the check an
    LLM-data pipeline runs when a new crawl batch, a re-encoded corpus,
    or a swapped embedding model lands: PSI/KS/chi2 above watch scalar
    and categorical columns; this watches the vector column itself.

    Two statistics, both stable under the isotropy of real embedding
    clouds (the DIRECTION of a mean vector is noise when embeddings
    are near-isotropic — its magnitude and the cloud's energy are
    not):

    - ``l2_shift`` = ‖mean(ref) − mean(cur)‖₂ — a translation of the
      cloud (new dominant topic/domain, encoder drift);
    - ``energy_ratio`` = mean‖x‖²(cur) / mean‖x‖²(ref) — a scale
      change (normalization regressions, truncated vectors, fp16
      clipping).

    ``drifted`` = l2_shift > max_shift OR |energy_ratio − 1| >
    max_energy_dev. Returns ONE row ``(n_ref, n_cur, l2_shift,
    energy_ratio, drifted)``.

    Scale shape: the per-dimension mean is ONE ``Summarizer.mean``
    vector aggregate (JVM-side, partial-aggregable — a dim-length
    accumulator per partition, map-side combined), the energies one
    ``aggregate`` expression — TWO single-row total aggregations (one
    reduce each, no UDF), crossJoined 1×1; cost is one scan of each
    snapshot regardless of corpus size. The r11 form emitted ``dim``
    scalar ``avg`` columns — one scan too, but the single-row agg
    carried thousands of expressions at dim 1024-4096 (planner cost,
    codegen-width cost); expression count is now O(1) in dim (pinned
    by the dim-1024 smoke test). ``dim`` is retained for API
    compatibility and no longer read. The l2 distance between the two
    mean vectors is a ``zip_with``/``aggregate`` fold — ANSI-SQL
    replayable (ORACLE_EMBEDDING_DRIFT in entry_queries.py)."""
    from pyspark.ml.functions import array_to_vector, vector_to_array
    from pyspark.ml.stat import Summarizer

    v = F.col(vec_col).cast("array<double>")
    energy = F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x)

    def side(df: DataFrame, tag: str) -> DataFrame:
        return df.agg(
            vector_to_array(
                Summarizer.mean(array_to_vector(v))
            ).alias(f"__{tag}_m"),
            F.count(F.lit(1)).alias(f"n_{tag}"),
            F.avg(energy).alias(f"__{tag}_e"),
        )

    both = side(ref, "ref").crossJoin(side(cur, "cur"))
    shift = F.sqrt(
        F.aggregate(
            F.zip_with(
                F.col("__ref_m"),
                F.col("__cur_m"),
                lambda a, b: (a - b) * (a - b),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    ratio = F.col("__cur_e") / F.col("__ref_e")
    return both.select(
        "n_ref",
        "n_cur",
        F.round(shift, round_to).alias("l2_shift"),
        F.round(ratio, round_to).alias("energy_ratio"),
        (
            (shift > F.lit(max_shift))
            | (F.abs(ratio - F.lit(1.0)) > F.lit(max_energy_dev))
        ).alias("drifted"),
    )
