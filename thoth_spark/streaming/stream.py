"""Streaming implementations: watermarked profiling, stateful scoring,
foreachBatch assessment."""

from __future__ import annotations

from collections.abc import Callable
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from thoth_spark.profiler.analyzers import Analyzer, GroupingAnalyzer
from thoth_spark.profiler.builder import DefaultProfilingBuilder, ProfilingBuilder
from thoth_spark.profiler.profile import Granularity

#: granularity → F.window duration (epoch-aligned, so DAY/HOUR buckets
#: coincide exactly with ``date_trunc`` in a UTC session).
_WINDOW_DURATION = {Granularity.DAY: "1 day", Granularity.HOUR: "1 hour"}


def profile_stream(
    df: DataFrame,
    ts_column: str,
    profiling_builder: ProfilingBuilder | None = None,
    granularity: str = Granularity.DAY,
    watermark_delay: str = "1 day",
) -> DataFrame:
    """Streaming equivalent of :func:`thoth_spark.profiler.profile`.

    Groups by ``F.window(ts, bucket)`` under a watermark instead of
    ``date_trunc`` so append-mode sinks emit each finalized time bucket
    exactly once (late rows within ``watermark_delay`` still land in
    their bucket; later ones are dropped — the streaming trade the
    reference never had to make because it reprocessed whole partitions).

    Only single-pass analyzers are supported: frequency-based analyzers
    (Uniqueness/Entropy/Histogram/…) need a second chained aggregation,
    which Structured Streaming disallows — run those through
    :func:`assess_foreach_batch` instead. Exact ``CountDistinct`` is
    likewise rejected by Spark on streams; the builder's
    ``ApproxCountDistinct`` is the streaming path.
    """
    granularity = granularity.upper()
    if granularity not in _WINDOW_DURATION:
        raise ValueError(
            f"Streaming profiling supports {sorted(_WINDOW_DURATION)} granularities; "
            f"got {granularity}. (WEEK/MONTH buckets are not fixed-width windows.)"
        )
    builder = profiling_builder or DefaultProfilingBuilder()
    analyzers = builder.build_analyzers(df.drop(ts_column).schema.fields)
    singles = [a for a in analyzers if not isinstance(a, GroupingAnalyzer)]
    if len(singles) != len(analyzers):
        bad = [type(a).__name__ for a in analyzers if isinstance(a, GroupingAnalyzer)]
        raise ValueError(
            f"Frequency-based analyzers not supported on streams: {bad}. "
            "Use assess_foreach_batch for those."
        )
    if not singles:
        raise ValueError("ProfilingBuilder produced no analyzers for this schema.")

    agg_map = {}
    for a in singles:
        for alias, expr in a.agg_exprs():
            agg_map.setdefault(alias, expr)
    agged = (
        df.withWatermark(ts_column, watermark_delay)
        .groupBy(F.window(F.col(ts_column), _WINDOW_DURATION[granularity]))
        .agg(*[expr.alias(alias) for alias, expr in agg_map.items()])
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
        F.col("window.start").alias("ts"), F.explode(F.array(*structs)).alias("m")
    ).select("ts", "m.*")


def sketch_profile_stream(
    df: DataFrame,
    ts_column: str,
    distinct_cols: list[str] | None = None,
    quantile_cols: list[str] | None = None,
    granularity: str = Granularity.DAY,
    watermark_delay: str = "1 day",
    kll_k: int = 200,
    hll_lgk: int = 12,
) -> DataFrame:
    """Streaming twin of :func:`thoth_spark.profiler.sketches.sketch_profile`:
    continuous per-bucket MERGEABLE sketches under a watermark.

    This is the continuous-ingestion half of the rescan-free rollup
    story: the stream emits one finalized row per time bucket carrying
    binary HLL/KLL sketches (KBs each); appended to the sketch table,
    they make any coarser granularity a sketch-merge
    (:func:`rollup_sketches`) — the raw stream is touched exactly once,
    ever. (A plain streaming distinct-count could never be rolled up
    later; sketches are what make profile history mergeable.)
    """
    granularity = granularity.upper()
    if granularity not in _WINDOW_DURATION:
        raise ValueError(
            f"Streaming sketch profiling supports {sorted(_WINDOW_DURATION)} "
            f"granularities; got {granularity}."
        )
    aggs = [F.count(F.lit(1)).alias("row_count")]
    for c in distinct_cols or []:
        aggs.append(F.hll_sketch_agg(F.col(c), F.lit(hll_lgk)).alias(f"hll_{c}"))
    for c in quantile_cols or []:
        aggs.append(
            F.kll_sketch_agg_double(F.col(c).cast("double"), F.lit(kll_k)).alias(
                f"kll_{c}"
            )
        )
    return (
        df.withWatermark(ts_column, watermark_delay)
        .groupBy(F.window(F.col(ts_column), _WINDOW_DURATION[granularity]))
        .agg(*aggs)
        .select(F.col("window.start").alias("ts"), "*")
        .drop("window")
    )


#: output schema of :func:`running_score_stream`
_SCORE_SCHEMA = (
    "entity string, instance string, name string, ts timestamp, "
    "value double, predicted double, error double"
)
_STATE_SCHEMA = "values array<double>"


def running_score_stream(
    metrics_stream: DataFrame,
    window: int = 7,
    key_cols: tuple[str, ...] = ("entity", "instance", "name"),
) -> DataFrame:
    """Incremental anomaly scoring as a custom stateful streaming operator.

    ``applyInPandasWithState`` keyed by metric: the state is the last
    ``window`` metric values; every arriving point is forecast as the
    mean of the state (SimpleModel's rolling-mean semantics,
    one fixed window) and scored with clamped APE, then pushed into the
    state. State size is O(window) doubles per metric — bounded, spillable
    to the state store, and independent of stream length; metrics
    partition across executors by key.
    """

    def score_group(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (values,) = state.get if state.exists else ([],)
        values = list(values)
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values("ts")
            for row in pdf.itertuples(index=False):
                pred = sum(values) / len(values) if values else None
                err = (
                    min(abs(row.value - pred) / row.value, 1.0)
                    if pred is not None and row.value != 0
                    else None
                )
                out.append((*key, row.ts, row.value, pred, err))
                values.append(float(row.value))
                if len(values) > window:
                    values.pop(0)
        state.update((values,))
        yield pd.DataFrame(
            out, columns=[*key_cols, "ts", "value", "predicted", "error"]
        )

    return (
        metrics_stream.select(*key_cols, "ts", "value")
        .groupBy(*key_cols)
        .applyInPandasWithState(
            score_group,
            outputStructType=_SCORE_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def sessionize_stream(
    stream: DataFrame,
    key_cols: tuple[str, ...] = ("user_id",),
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    tiebreak_cols: tuple[str, ...] = ("event_id",),
) -> DataFrame:
    """Streaming gap-based sessionization as a custom stateful operator:
    the continuous twin of
    :func:`thoth_spark.operators.relational.sessionize`, emitting a
    PER-EVENT 1-based ``session_id`` per key.

    Why not Spark's built-in ``session_window`` aggregation: it produces
    per-SESSION aggregate rows under a watermark, but cannot tag each
    event with its session id in append mode — the id assignment needs
    per-key running state, which is exactly what
    ``applyInPandasWithState`` provides. State per key is two scalars
    (last event time, current session index) — O(1), spillable,
    independent of stream length.

    Ordering contract: events must arrive in (ts, tiebreak) order per
    key ACROSS micro-batches (within a batch they are sorted here) —
    the replay/backfill cadence where file slices arrive oldest-first.
    For genuinely out-of-order production streams, use the watermarked
    ``session_window`` aggregation for session-level rollups instead;
    per-event ids under reordering are not well-defined until the
    watermark closes a session. Once a finite stream drains, the output
    equals the batch ``sessionize`` result bit-for-bit (asserted in
    tests and replayed by the driver oracle).
    """
    cols = [*key_cols, *tiebreak_cols, ts_col]
    fields = {f.name: f for f in stream.schema.fields}
    out_schema = (
        ", ".join(f"{c} {fields[c].dataType.simpleString()}" for c in cols)
        + ", session_id bigint"
    )
    state_schema = "last_ts double, sid bigint"

    def assign(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        last_ts, sid = state.get if state.exists else (float("-inf"), 0)
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values([ts_col, *tiebreak_cols])
            for row in pdf.itertuples(index=False):
                t = getattr(row, ts_col).timestamp()
                if t - last_ts > gap_seconds:
                    sid += 1
                out.append(
                    (
                        *key,
                        *(getattr(row, c) for c in tiebreak_cols),
                        getattr(row, ts_col),
                        sid,
                    )
                )
                last_ts = t
        state.update((last_ts, sid))
        yield pd.DataFrame(out, columns=[*cols, "session_id"])

    return (
        stream.select(*cols)
        .groupBy(*key_cols)
        .applyInPandasWithState(
            assign,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def assess_foreach_batch(
    ts_column: str,
    on_result: Callable[[DataFrame, int], None],
    profiling_builder: ProfilingBuilder | None = None,
    optimization_df: DataFrame | None = None,
    granularity: str = Granularity.DAY,
) -> Callable[[DataFrame, int], None]:
    """The reference's per-batch assessment loop as a foreachBatch sink.

    Returns a callback for ``stream.writeStream.foreachBatch(...)``: each
    micro-batch is profiled (full analyzer surface — foreachBatch runs
    batch-mode plans, so frequency analyzers work here), optionally joined
    against optimized thresholds to flag anomalies, and handed to
    ``on_result(result_df, batch_id)`` (persist to the metrics repository,
    notify, …).
    """
    from thoth_spark.profiler.profile import profile

    def callback(batch_df: DataFrame, batch_id: int) -> None:
        metrics = profile(batch_df, ts_column, profiling_builder, granularity)
        if optimization_df is not None:
            keys = ["entity", "instance", "name"]
            metrics = metrics.join(
                F.broadcast(optimization_df.select(*keys, "threshold")), on=keys, how="left"
            )
        on_result(metrics, batch_id)

    return callback


def drift_foreach_batch(
    ts_column: str,
    value_column: str,
    edges: DataFrame,
    ref_bucket_counts: DataFrame,
    on_result: Callable[[DataFrame, int], None],
    n_bins: int = 10,
    eps: float = 0.5,
    stat: str = "psi",
) -> Callable[[DataFrame, int], None]:
    """Continuous distribution-drift monitoring: per-micro-batch PSI of
    ``value_column`` against a FROZEN reference (``edges`` +
    ``ref_bucket_counts`` from
    :func:`thoth_spark.profiler.drift.freeze_reference`, computed ONCE
    and broadcast into every batch — the raw reference window is never
    rescanned).

    foreachBatch rather than a streaming aggregation because PSI needs a
    dense (day × bucket) grid join plus global count ratios — a
    multi-stage batch plan per micro-batch, not an incremental state
    update. Each callback result is the per-day PSI of THAT batch's
    rows; with day-aligned micro-batches (the normal ingestion cadence)
    that is the final per-day PSI, and finer batches give early partial
    readings that the last batch of the day supersedes.

    ``stat='ks'`` swaps the statistic for the two-sample binned KS
    (:func:`thoth_spark.profiler.drift.ks_against_reference` — rows
    ``(d, n, ks, ks_alarm)``); the freeze/broadcast/grid mechanics are
    identical, so batch and streaming readings stay bit-equal either
    way (same n_bins must be used when freezing).
    """
    from thoth_spark.profiler.drift import ks_against_reference, psi_against_reference

    if stat not in ("psi", "ks"):
        raise ValueError(f"stat must be 'psi' or 'ks', got {stat!r}")

    def callback(batch_df: DataFrame, batch_id: int) -> None:
        clean = batch_df.where(F.col(value_column).isNotNull()).select(
            ts_column, value_column
        )
        if stat == "psi":
            out = psi_against_reference(
                clean, ts_column, value_column, edges, ref_bucket_counts, n_bins, eps
            )
        else:
            out = ks_against_reference(
                clean, ts_column, value_column, edges, ref_bucket_counts, n_bins
            )
        on_result(out, batch_id)

    return callback


def chi2_foreach_batch(
    ts_column: str,
    cat_column: str,
    ref_probs: DataFrame,
    on_result: Callable[[DataFrame, int], None],
    critical: float = 11.070497693516351,
) -> Callable[[DataFrame, int], None]:
    """Continuous CATEGORICAL drift monitoring: per-micro-batch
    chi-square of ``cat_column``'s category mix against frozen reference
    probabilities (``ref_probs`` from
    :func:`thoth_spark.profiler.drift.freeze_categorical_reference`,
    computed ONCE and broadcast into every batch). The categorical twin
    of :func:`drift_foreach_batch` — separate entry point because the
    frozen reference is a probability table with an ``__other__`` slot,
    not quantile edges; a category never seen in the reference alarms
    loudly from its first streamed batch. Same batch-parity contract:
    day-aligned micro-batches drain to rows equal to
    :func:`thoth_spark.profiler.drift.chi2_daily` (to within distributed
    float-summation order, i.e. the last ulp of the chi2 sum)."""
    from thoth_spark.profiler.drift import chi2_against_reference

    def callback(batch_df: DataFrame, batch_id: int) -> None:
        out = chi2_against_reference(
            batch_df, ts_column, cat_column, ref_probs, critical
        )
        on_result(out, batch_id)

    return callback


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    max_delay: str = "30 minutes",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream interval join: pair each left event with
    the right events sharing its key that occurred within ``max_delay``
    BEFORE it (attribution: purchases ← preceding clicks).

    ``how='left_outer'`` additionally emits unmatched left events with
    nulls on the right side — but only once the watermark has passed the
    left event's join window (Spark must be sure no matching right row
    can still arrive), so outer results trail the watermark by
    ``watermark + max_delay``. Inner results emit as soon as both rows
    have met.

    This is the canonical Structured Streaming two-stream join — both
    sides carry a watermark and the join condition bounds ``right_ts``
    to ``[left_ts - max_delay, left_ts]``, which is what lets Spark
    expire buffered state: a right row can be dropped once the left
    watermark passes ``right_ts + max_delay``, so state is bounded by
    (event rate x (watermark + max_delay)) regardless of how long the
    streams run. Without the time bound the join would buffer both
    streams forever.

    Inner-join semantics are exactly batch-equivalent for events no
    later than ``watermark``; choose it ≥ the pipeline's real lateness
    bound. Column names must be disjoint across the two sides (rename
    before joining, as with any self-join)."""
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (F.col(left_key) == F.col(right_key))
        & (F.col(right_ts) <= F.col(left_ts))
        & (F.col(right_ts) >= F.col(left_ts) - F.expr(f"INTERVAL {max_delay}"))
    )
    return lw.join(rw, cond, how)


def cms_stream(
    df: DataFrame,
    ts_column: str,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    granularity: str = Granularity.DAY,
    watermark_delay: str = "1 day",
) -> DataFrame:
    """Streaming twin of :func:`thoth_spark.profiler.sketches.cms_build`:
    one finalized count-min sketch per time bucket (append mode under
    the watermark), emitted as ``(ts, row, pos, cnt)`` — ≤ depth×width
    rows per bucket regardless of stream volume. CMS cells ADD, so the
    all-time (or weekly, or any) sketch is a
    :func:`~thoth_spark.profiler.sketches.cms_merge` of bucket rows:
    the raw stream is read exactly once, ever, and point counts for ANY
    key over ANY horizon come from the persisted sketch table — the
    count-twin of the HLL/KLL rollup story above."""
    from thoth_spark.profiler.sketches import _cms_pos

    granularity = granularity.upper()
    if granularity not in _WINDOW_DURATION:
        raise ValueError(
            f"Streaming CMS supports {sorted(_WINDOW_DURATION)} "
            f"granularities; got {granularity}."
        )
    cell = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(r).alias("row"),
                    _cms_pos(F.col(key_col), r, width).alias("pos"),
                )
                for r in range(depth)
            ]
        )
    )
    return (
        df.withWatermark(ts_column, watermark_delay)
        .select(F.col(ts_column), cell.alias("c"))
        .groupBy(
            F.window(F.col(ts_column), _WINDOW_DURATION[granularity]),
            F.col("c.row").alias("row"),
            F.col("c.pos").alias("pos"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("window.start").alias("ts"), "row", "pos", "cnt")
    )


def index_ingest_foreach_batch(
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    kind: str = "ivf",
    on_batch: Callable[[int, int], None] | None = None,
) -> Callable[[DataFrame, int], None]:
    """Continuous ANN index maintenance as a ``foreachBatch`` sink
    (r13): each micro-batch of ``(id, embedding)`` rows is appended to
    the persisted index at ``path`` under its FROZEN quantizers —
    :func:`~thoth_spark.operators.similarity.ivf_index_append` for the
    float/SQ8 layout (``kind="ivf"``) or
    :func:`~thoth_spark.operators.similarity.ivfpq_index_append` for
    PQ codes (``kind="ivfpq"``). foreachBatch runs batch-mode plans, so
    the append is the exact same O(batch) dynamic-partition write the
    nightly-ingest path uses — this is that path upgraded from nightly
    to continuous; both serves see each appended batch at their next
    file listing. Pair with the drift-gated retrain playbook
    (examples/ann_serving.py stage 6): appends ride the stored
    geometry, rebuilds happen on measured drift, never per batch.

    ``on_batch(n_rows, batch_id)`` (optional) observes each non-empty
    append — wire checkpoint/metrics/alerting there."""
    from thoth_spark.operators import similarity

    if kind not in ("ivf", "ivfpq"):
        raise ValueError(f"kind must be 'ivf' or 'ivfpq'; got {kind!r}")
    append = (
        similarity.ivf_index_append
        if kind == "ivf"
        else similarity.ivfpq_index_append
    )

    def callback(batch_df: DataFrame, batch_id: int) -> None:
        batch = batch_df.select(id_col, vec_col)
        if on_batch is not None:
            batch = batch.localCheckpoint()  # count + append: one compute
            n = batch.count()
            if n == 0:
                return
            append(batch.sparkSession, path, batch, id_col, vec_col)
            on_batch(n, batch_id)
            return
        if batch.limit(1).count() == 0:
            return
        append(batch.sparkSession, path, batch, id_col, vec_col)

    return callback


def gopher_repetition_foreach_batch(
    on_result: Callable[[DataFrame, int], None],
    id_col: str = "doc_id",
    text_col: str = "text",
    ns: tuple[int, ...] = (2, 3, 4, 5, 10),
) -> Callable[[DataFrame, int], None]:
    """The Gopher repetition pass (r14) as a ``foreachBatch`` sink —
    the stateful half of the streaming curation front line (the
    stateless :func:`thoth_spark.operators.text.gopher_rules` gate runs
    inline on the stream; repetition needs a per-document ``groupBy``
    over the exploded grams, which foreachBatch runs as the exact batch
    plan per micro-batch).

    Batch-equivalence is structural, not approximate: the grouping key
    is the DOCUMENT id and a document's text lives in one row, so no
    group ever straddles a micro-batch boundary — concatenating the
    per-batch callback outputs reproduces
    :func:`thoth_spark.operators.text.gopher_repetition` over the union
    of the batches row-for-row, at any trigger cadence. Downstream,
    ``on_result`` typically appends to the curation audit table or
    joins the verdict back onto the live feed."""
    from thoth_spark.operators.text import gopher_repetition

    def callback(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.limit(1).count() == 0:
            return
        # barrier="checkpoint": the batch operator's default cache()
        # registers a CacheManager entry per call that only dies with
        # the session — one per trigger on an unbounded stream would
        # accumulate forever. The checkpoint is GC-reclaimed; the
        # partitioning it costs is micro-batch-sized shuffle, noise.
        out = gopher_repetition(
            batch_df, id_col, text_col, ns=ns, barrier="checkpoint"
        )
        on_result(out, batch_id)

    return callback


def curation_gate_foreach_batch(
    on_counts: Callable[[dict], None],
    id_col: str = "doc_id",
    text_col: str = "text",
    gate_kwargs: dict | None = None,
    on_survivors: Callable[[DataFrame, int], None] | None = None,
) -> Callable[[DataFrame, int], None]:
    """The streaming curation FRONT LINE as one ``foreachBatch`` sink,
    instrumented for the dashboard's ``/curation`` funnel: per
    micro-batch, the stateless Gopher word-rules gate runs first, the
    repetition verdict (n-gram + duplicate-line rules) runs on the
    gate's survivors, and ``on_counts`` receives the batch's waterfall

    ``{"batch_id", "docs_in", "gopher_pass", "repetition_pass"}``

    — exactly the shape ``render_curation_html`` renders as the
    live-feed section when collected under a ``streaming_batches`` key.
    ``on_survivors`` (optional) receives the fully-gated batch frame
    for the downstream pipeline (audit table, training sink).

    Scale shape: both passes are the exact batch operators
    (batch-equivalence is structural — the gates are per-document, and
    a document's text lives in one row, so no group straddles a
    micro-batch boundary); the repetition barrier is ``"checkpoint"``
    so an unbounded stream never accumulates CacheManager entries.
    Each stage is checkpointed before its count, so the counters AND
    the ``on_survivors`` sink share one materialization per stage —
    the verdict pipeline (the dominant per-batch cost) runs once per
    trigger, not once per consumer. Idle (empty) triggers report a
    zero-count row rather than skipping, so the live-feed table has no
    batch-id gaps."""
    from thoth_spark.operators.text import (
        gopher_repetition_verdict,
        gopher_rules,
    )

    gate_kwargs = gate_kwargs or {}

    def callback(batch_df: DataFrame, batch_id: int) -> None:
        batch = batch_df.localCheckpoint()
        docs_in = batch.count()
        if docs_in == 0:
            # an idle trigger still reports a zero row — the live-feed
            # table shows every batch id, no silent gaps
            on_counts(
                {
                    "batch_id": batch_id,
                    "docs_in": 0,
                    "gopher_pass": 0,
                    "repetition_pass": 0,
                }
            )
            return
        # run the gate on an (id, text) projection and semi-join the
        # survivor ids back to the RAW batch (r15 advice): gopher_rules
        # adds its signal columns via withColumns, so gating the full
        # frame would let a batch that already carries one of those
        # names (e.g. n_words) silently reach on_survivors with the
        # gate's computed value instead of the original data — the
        # repetition stage below already uses this join-back shape
        gated = (
            gopher_rules(
                batch.select(id_col, text_col),
                text_col=text_col,
                **gate_kwargs,
            )
            .where(F.col("pass_gopher"))
            .select(id_col)
            .join(batch, id_col)
            .select(batch.columns)
            .localCheckpoint()
        )
        gopher_pass = gated.count()
        if gopher_pass:
            # checkpoint BEFORE counting so the counter and the
            # on_survivors sink share one materialization of the
            # verdict pipeline (the dominant per-batch cost) — and
            # re-select batch.columns so both branches hand
            # on_survivors the same column ORDER (the join puts its
            # key first; a positional sink would silently transpose)
            survivors = (
                gopher_repetition_verdict(
                    gated, id_col, text_col, barrier="checkpoint"
                )
                .where(F.col("pass_repetition"))
                .select(F.col("id").alias(id_col))
                .join(gated, id_col)
                .select(batch.columns)
                .localCheckpoint()
            )
            repetition_pass = survivors.count()
        else:
            survivors = gated
            repetition_pass = 0
        on_counts(
            {
                "batch_id": batch_id,
                "docs_in": docs_in,
                "gopher_pass": gopher_pass,
                "repetition_pass": repetition_pass,
            }
        )
        if on_survivors is not None:
            on_survivors(survivors, batch_id)

    return callback


def span_dedup_foreach_batch(
    path: str,
    on_result: Callable[[DataFrame, int], None],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Callable[[DataFrame, int], None]:
    """Keep-first C4 span dedup as a continuous ``foreachBatch`` sink
    (r16) — the streaming twin every other dedup family member already
    has (MinHash bands, SimHash chunks, CMS, ANN ingest): each
    micro-batch dedups against the persisted
    :func:`~thoth_spark.operators.dedup.build_span_index` at ``path``
    and appends its new first occurrences, so a span that first
    appeared in ANY earlier trigger is removed from every later one —
    state that ``applyInPandasWithState`` could not hold (the span
    universe is corpus-sized; the parquet index is the right store,
    exactly like the ANN ``index_ingest_foreach_batch`` sink above).

    ``on_result`` receives each batch's deduped frame
    (``(id, text, n_sentences, n_removed)``). Concatenated outputs
    equal one batch :func:`~thoth_spark.operators.dedup.c4_span_dedup`
    run over the union of the batches whenever micro-batches arrive in
    ascending id order (asserted in tests); in general the keeper is
    the first occurrence ever SEEN — the only causal choice once
    earlier triggers are emitted. The trigger's ``batch_id`` is passed
    through as the append's ``batch_tag``, which is what makes an
    at-least-once RETRY of a trigger idempotent: the rerun's probe
    excludes — and its append overwrites — the ``bid=<batch_id>``
    partition its first attempt wrote, so a retry can never dedup
    against itself and strip its own keepers (pinned by the replayed
    e2e test). Per-trigger cost is O(batch spans + touched index
    buckets); compact the index with ``dedup.span_index_compact``
    after sustained ingest."""
    from thoth_spark.operators.dedup import c4_span_dedup_incremental

    def callback(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.limit(1).count() == 0:
            return
        out = c4_span_dedup_incremental(
            batch_df, path, id_col, text_col, batch_tag=batch_id
        )
        on_result(out, batch_id)

    return callback
