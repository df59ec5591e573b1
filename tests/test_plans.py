"""Physical-plan regression tests: the scale properties (pushdown,
broadcast, shuffle count, codegen) are asserted, not assumed — a change
that silently degrades the plan fails here even though results stay
correct."""

import re

import pytest
from pyspark.sql import functions as F

from thoth_spark import entry_queries
from thoth_spark.operators import dedup
from thoth_spark.sources import load_table


@pytest.fixture(autouse=True)
def _fresh_cache(spark):
    """Plan-shape assertions are only meaningful against real scans: a
    DataFrame cached by an EARLIER test with the same logical subtree
    makes the cache manager substitute InMemoryTableScan here, erasing
    PushedFilters and changing exchanges (observed as suite-order-
    dependent flakiness in test_mix_corpora_filter_reaches_scan)."""
    spark.catalog.clearCache()
    yield


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(df, spark) -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_q1_filter_pushed_to_scan(spark, sf_dir):
    plan = _formatted(entry_queries.QUERIES["tpch_q1_pricing_summary"](spark, sf_dir), spark)
    assert re.search(r"PushedFilters:.*LessThanOrEqual\(l_shipdate", plan)


def test_q3_broadcasts_dimensions_no_fact_preshuffle(spark, sf_dir):
    plan = _plan(entry_queries.QUERIES["tpch_q3_shipping_priority"](spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2
    # the only shuffle is the final aggregation — the fact table reaches
    # its joins unshuffled
    assert "SortMergeJoin" not in plan


def test_q17_single_lineitem_scan(spark, sf_dir):
    """The correlated-subquery rewrite must not scan lineitem twice."""
    plan = _formatted(entry_queries.QUERIES["tpch_q17_small_quantity_revenue"](spark, sf_dir), spark)
    assert len(re.findall(r"Location:.*lineitem", plan)) == 1


def test_q6_all_predicates_pushed(spark, sf_dir):
    """Q6 is the pushdown test: date range AND quantity bound must reach
    the parquet scan."""
    plan = _formatted(entry_queries.QUERIES["tpch_q6_forecast_revenue"](spark, sf_dir), spark)
    assert re.search(r"PushedFilters:.*GreaterThanOrEqual\(l_shipdate", plan)
    assert re.search(r"PushedFilters:.*LessThan\(l_quantity", plan)


def test_q8_dimensions_broadcast(spark, sf_dir):
    """Eight-table join: part/supplier/nation×2/region all broadcast; at
    most the two fact-fact joins may shuffle."""
    plan = _plan(entry_queries.QUERIES["tpch_q8_market_share"](spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 5
    assert plan.count("SortMergeJoin") <= 2


def test_q21_no_fact_self_join_one_exchange_for_agg_and_window(spark, sf_dir):
    """The EXISTS/NOT-EXISTS rewrite must not re-scan lineitem, and the
    explicit repartition(l_orderkey) must serve both the
    (l_orderkey, l_suppkey) aggregate and the l_orderkey window."""
    df = entry_queries.QUERIES["tpch_q21_waiting_suppliers"](spark, sf_dir)
    assert len(re.findall(r"Location:.*lineitem", _formatted(df, spark))) == 1
    plan = _plan(df)
    assert len(re.findall(r"Exchange hashpartitioning\(l_orderkey", plan)) == 1


def test_q2_single_exchange(spark, sf_dir):
    """One hash exchange total: hash(l_partkey) satisfies the
    (l_partkey, l_suppkey) grouping and — alias-aware — the
    partitionBy(p_partkey) window."""
    plan = _plan(entry_queries.QUERIES["tpch_q2_min_cost_supplier"](spark, sf_dir))
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1


def test_distributed_ntile_data_path_is_range_partitioned(spark, sf_dir):
    """The decile data path must use a parallel range sort; the only
    single-partition exchanges allowed are the KB-sized per-partition
    count offsets frame (one for its window, possibly one under AQE)."""
    plan = _plan(entry_queries.QUERIES["customer_revenue_deciles"](spark, sf_dir))
    assert "Exchange rangepartitioning" in plan
    assert plan.count("Exchange SinglePartition") <= 2


def test_profile_is_one_aggregation_job(spark, sf_dir):
    """Single-pass profiling: exactly one shuffle (partial+final agg),
    no join, no extra exchange."""
    from thoth_spark.profiler import Mean, ProfilingBuilder, Size, profile

    events = load_table(spark, sf_dir, "events").select("ts", "value")
    m = profile(events, "ts", ProfilingBuilder(analyzers=[Mean("value"), Size()]))
    plan = _plan(m)
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert "Join" not in plan


def test_minhash_signature_reuses_repartition(spark, sf_dir):
    """shingle_sets repartitions by id; the signature groupBy(id) must
    reuse that partitioning instead of shuffling again."""
    docs = load_table(spark, sf_dir, "documents")
    # n=4 so the plan can't be substituted by another test's cached n=3
    # shingle frame (cache substitution removes the exchange entirely,
    # which is fine but makes the count nondeterministic across runs)
    sigs = dedup.minhash_signatures(docs, "doc_id", "text", num_hashes=8, n=4)
    plan = _plan(sigs)
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1


def test_brute_force_topk_broadcasts_queries(spark, sf_dir):
    from thoth_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    out = similarity.brute_force_topk(emb, emb.where(F.col("vec_id") < 5), k=3)
    plan = _plan(out)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    # Spark's rank-limit pushdown must kick in: only <=k rows per
    # (query, input partition) reach the shuffle, so shuffle volume is
    # O(k * queries * partitions), not O(corpus * queries)
    assert "WindowGroupLimit" in plan and "Partial" in plan


def test_bucketed_join_is_shuffle_free(spark, sf_dir, tmp_path):
    """Bucketing both sides by the join key at write time removes the
    join-time exchange entirely."""
    from thoth_spark.operators.storage import read_bucketed, write_bucketed

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    write_bucketed(o, "t_orders_b", ["o_orderkey"], 8, path=str(tmp_path / "o"))
    write_bucketed(li, "t_lineitem_b", ["l_orderkey"], 8, path=str(tmp_path / "l"))
    try:
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = read_bucketed(spark, "t_orders_b").join(
                read_bucketed(spark, "t_lineitem_b"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            plan = _plan(joined)
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        # and the result matches the plain join
        assert joined.count() == o.join(li, o.o_orderkey == li.l_orderkey).count()
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_ar1_folds_single_exchange(spark, sf_dir):
    """AR(1) CV: all folds of all series must be ONE window pass — a
    single shuffle keyed by the metric key, no joins, no Python."""
    from thoth_spark.anomaly.models import AR1Model
    from thoth_spark.entry_queries import _metric_series

    metrics = _metric_series(spark, sf_dir)
    base_exchanges = _plan(metrics).count("Exchange hashpartitioning")
    folds = AR1Model().folds(metrics)
    plan = _plan(folds)
    # the CV adds exactly ONE shuffle (by the metric key) on top of
    # whatever the profiling input plan already contains
    assert plan.count("Exchange hashpartitioning") - base_exchanges <= 1
    assert "Join" not in plan
    assert "Python" not in plan  # pure window functions, no UDF path


def test_sketch_rollup_never_rescans_raw(spark, sf_dir):
    """The rollup plan must read the sketch frame only: one aggregation
    over the daily-sketch aggregation, no second scan of the events
    parquet and no join."""
    from thoth_spark.profiler.sketches import rollup_sketches, sketch_profile
    from thoth_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events")
    daily = sketch_profile(ev, "ts", distinct_cols=["event_type"], quantile_cols=["value"])
    weekly = rollup_sketches(daily, "week")
    plan = _plan(weekly)
    assert len(re.findall(r"(?:File)?Scan parquet", plan)) <= 1
    assert "Join" not in plan
    # two aggregations (daily sketch + weekly merge), each with a partial
    # and final stage over ONE exchange apiece
    assert plan.count("Exchange hashpartitioning") <= 2


def test_simhash_pairs_no_cartesian_single_build(spark, sf_dir):
    """Candidate generation is an equi-join on (combo, key); the
    fingerprint pipeline must execute once (checkpoint barrier), never
    per join leg."""
    from thoth_spark.operators import dedup
    from thoth_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    fps = dedup.simhash(docs, "doc_id", "text")
    pairs = dedup.simhash_near_dup_pairs(fps, max_hamming=3)
    plan = _plan(pairs)
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan
    # the upstream 64-sum aggregation is behind a checkpoint: it must not
    # appear in the pair plan at all
    assert "kll" not in plan.lower()


def test_line_dedup_one_scan_no_broadcast(spark, sf_dir):
    """line_dedup must be one corpus scan + (window-by-hash, regroup-by-doc)
    shuffles. A survivor side-table join would broadcast a corpus-sized
    frame at 100 TB — locked out here."""
    plan = _plan(entry_queries.QUERIES["line_dedup_documents"](spark, sf_dir))
    assert plan.count("FileScan") == 1
    assert "BroadcastExchange" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2


def test_line_dedup_none_partial_aggregate_no_window(spark, sf_dir):
    """keep='none' must compute per-line doc-frequency as a two-phase
    hash aggregate (map-side partials absorb a hot boilerplate line) and
    join it back — NEVER as a window over lh, whose collect_set would
    buffer the hottest line's whole partition in a single task."""
    plan = _plan(entry_queries.QUERIES["line_dedup_none_documents"](spark, sf_dir))
    assert "Window" not in plan
    assert "collect_set" not in plan
    # the distinct-count aggregate is present and two-phase
    assert "count(distinct" in plan or "partial_count(distinct" in plan
    assert "HashAggregate" in plan


def test_perplexity_scoring_joins_are_broadcast(spark, sf_dir):
    """The capped-vocab LM tables must broadcast into the scoring path —
    never a sort-merge join against the corpus bigrams."""
    plan = _plan(entry_queries.QUERIES["perplexity_documents"](spark, sf_dir))
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 3  # vocab (×2 paths) + bigram + unigram


def test_mix_corpora_filter_reaches_scan(spark, sf_dir):
    """Corpus mixing must stay a zero-shuffle map-side filter with the
    source predicate pushed to the parquet scan."""
    df = entry_queries.QUERIES["mix_documents"](spark, sf_dir)
    plan = _plan(df)
    assert "Exchange hashpartitioning" not in plan
    formatted = _formatted(df, spark)
    assert re.search(r"PushedFilters:.*In\(source", formatted)


def test_range_join_no_nested_loop(spark, sf_dir):
    """The interval join must plan as an equi-join on the date bin — a
    BroadcastNestedLoopJoin/CartesianProduct here is the O(n·m) plan the
    operator exists to avoid."""
    plan = _plan(entry_queries.QUERIES["range_join_transit_orders"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_range_join_point_side_preaggregated(spark, sf_dir):
    """Round-4 perf lock: the point side must reduce to one row per
    distinct order DATE before entering the bin join (the r2 plan joined
    every orders row — 4.8 s and a 6.4× sf scaling ratio). Locked by
    requiring an aggregate on od_date BELOW the join: the join's
    grouping aggregation upstream means ≥3 HashAggregate pairs total,
    and the n_orders weight column must exist pre-join."""
    df = entry_queries.QUERIES["range_join_transit_orders"](spark, sf_dir)
    plan = _plan(df)
    # the pre-aggregation's count lives under the alias n_orders and is
    # summed (not counted) after the join
    assert "n_orders" in plan
    assert re.search(r"sum\(n_orders", plan)


def test_minhash_capped_droplist_no_window(spark, sf_dir):
    """The stop-shingle cap must be a drop-list join (tiny over-cap side,
    broadcastable), never a count-window over the shingle key — the
    window form funnels every instance of a hot boilerplate shingle
    through one task."""
    from pyspark.sql import functions as F

    # the entry query checkpoints the signature frame (r8), which makes
    # its executed plan end at Scan ExistingRDD — assert on the same
    # sub-pipeline the query builds BEFORE the checkpoint boundary
    docs = load_table(spark, sf_dir, "documents")
    sh = dedup.shingle_sets(docs, "doc_id", "text", n=3)
    inv = sh.select("id", F.explode("sh").alias("s"))
    capped = dedup.cap_shingle_df(inv, 4, key="s")
    plan = _plan(capped)
    assert "Window" not in plan
    assert "LeftAnti" in plan or "left_anti" in plan.lower() or "isnull" in plan.lower()


def test_bucketed_join_no_exchange_below_join(spark, sf_dir):
    """Both sides arrive bucket-partitioned from storage, so the join
    must plan with NO shuffle exchange between the scans and the join —
    the whole point of paying the bucketing shuffle at write time. (The
    aggregate above may still exchange on o_orderpriority.) Broadcast is
    disabled for the assertion: at fixture scale Spark would otherwise
    broadcast the small side, hiding the shape this lock protects at
    fact×fact scale."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = entry_queries.QUERIES["bucketed_join_orders_lineitem"](spark, sf_dir)
        plan = _plan(df)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    join_pos = plan.find("SortMergeJoin")
    assert join_pos != -1
    # everything below (after, in toString order) the join is scan-side:
    # no hash exchange may appear there
    below = plan[join_pos:]
    assert "Exchange hashpartitioning" not in below
    assert plan.count("Bucketed: true") == 2


def test_training_order_single_shuffle(spark, sf_dir):
    """Deterministic training shuffle = exactly one hash exchange (the
    within-shard sort rides it); no global single-partition sort."""
    plan = _plan(entry_queries.QUERIES["training_order_documents"](spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "rangepartitioning" not in plan
    assert "SinglePartition" not in plan


def test_ivf_plan_size_independent_of_centroid_count(spark, sf_dir):
    """Round-5 fix: IVF centroid assignment ships the centroid matrix in
    the pandas-UDF closure, NOT as inlined expression literals — the
    literal form grew the plan linearly in n_centroids (codegen breaks
    past a few hundred; 4k+ centroids are normal at scale). Locked by
    asserting the analyzed-plan string does not grow with n_centroids."""
    from thoth_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.limit(3)

    def plan_len(n):
        df = similarity.ivf_topk(emb, queries, k=3, n_centroids=n, nprobe=2)
        return len(df._jdf.queryExecution().analyzed().toString())

    small, big = plan_len(4), plan_len(16)
    assert abs(big - small) < 200, (small, big)


def test_fused_frequency_exchanges_independent_of_columns(spark, sf_dir):
    """Round-5 fusion: ALL single-column frequency analyzers share one
    explode(map)-based groupBy(ts, colname, value) pass, so the exchange
    count and the number of events scans must NOT grow with the number
    of profiled columns (previously one groupBy + one scan per column)."""
    from thoth_spark.profiler import (
        Entropy,
        Histogram,
        ProfilingBuilder,
        Uniqueness,
        UniqueValueRatio,
        profile,
    )

    ev = load_table(spark, sf_dir, "events")

    def shape(cols):
        analyzers = []
        for c in cols:
            analyzers += [Uniqueness(c), UniqueValueRatio(c), Entropy(c), Histogram(c)]
        m = profile(ev.select("ts", *cols), "ts", ProfilingBuilder(analyzers=analyzers))
        plan = _plan(m)
        fmt = _formatted(m, spark)
        return (
            plan.count("Exchange hashpartitioning"),
            len(re.findall(r"Location:.*events", fmt)),
        )

    one = shape(["event_type"])
    three = shape(["event_type", "user_id", "props"])
    assert one == three, (one, three)


def test_passage_dedup_single_corpus_scan_no_cartesian(spark, sf_dir):
    """Round 5: the passage pipeline has three consumers of the tokenized
    corpus (window hashing, token positions, per-doc sizes) behind ONE
    lazy checkpoint barrier — the physical plan must contain no repeated
    documents FileScan (all consumers read the checkpointed RDD) and no
    cartesian candidate generation."""
    plan = _plan(entry_queries.QUERIES["passage_dedup_documents"](spark, sf_dir))
    assert plan.count("FileScan") <= 1
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_nb_classifier_model_join_is_broadcast(spark, sf_dir):
    """The ≤ n_features-row NB weight table must broadcast into the
    corpus scoring join — never a shuffle of the corpus keyed by
    feature bucket."""
    plan = _plan(entry_queries.QUERIES["classifier_nb_documents"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_ks_drift_input_rows_never_shuffle(spark, sf_dir):
    """KS drift must aggregate raw rows map-side into (day, bucket)
    counts; every exchange in the plan carries metadata-scale frames
    (counts/grids), so no sort-merge join of input-sized sides may
    appear and the CDF windows must not run over a corpus-sized frame."""
    plan = _plan(entry_queries.QUERIES["ks_drift_events"](spark, sf_dir))
    assert "SortMergeJoin" not in plan


def test_bm25_topk_is_take_ordered_and_broadcast_only(spark, sf_dir):
    """BM25 scale shape: the top-k must plan as TakeOrderedAndProject
    (per-partition partial top-k, no global Sort+Exchange), every join in
    the scoring path must be broadcast (df / N / avgdl are tiny), and the
    only shuffle is the postings tf aggregation."""
    plan = _plan(entry_queries.QUERIES["bm25_topk_documents"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 1
    assert "BroadcastNestedLoopJoin" in plan or "CartesianProduct" not in plan


def test_bm25_term_filter_before_tf_aggregation(spark, sf_dir):
    """The query-term filter must sit UNDER the tf exchange: only
    matching postings may shuffle. A plan where the filter runs after the
    groupBy would shuffle the whole exploded corpus."""
    from thoth_spark.operators import retrieval

    docs = load_table(spark, sf_dir, "documents")
    postings = retrieval.term_postings(docs, "doc_id", "text", ["spark", "stream"])
    plan = _plan(postings)
    # the filter on the exploded term column appears in the plan below
    # (i.e. listed after, in child position) the single exchange
    exch = plan.index("Exchange")
    assert re.search(r"Filter term.* IN ", plan[exch:]), (
        "term filter must be under the exchange"
    )
    # exactly one shuffle: the (id, term) tf aggregation — with a partial
    # (map-side) aggregate below it
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_count" in plan


def test_weighted_sample_is_take_ordered(spark, sf_dir):
    """E-S top-n must plan as TakeOrderedAndProject (per-partition
    partial top-n) — a Sort + single-partition Exchange would serialize
    the corpus through one task."""
    plan = _plan(entry_queries.QUERIES["sample_documents_weighted"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange SinglePartition" not in plan


def test_runtime_bloom_filter_injected_on_selective_join(spark, tmp_path):
    """100 TB join-pruning path: for a shuffle join with a selectively
    filtered build side, Catalyst must inject a runtime bloom filter
    (`might_contain(...)`) on the probe side so fact rows that cannot
    match are dropped BEFORE the shuffle. We lock the injection (on
    test-sized thresholds) rather than hand-rolling a bloom operator —
    at production thresholds the same rule fires automatically."""
    from pyspark.sql import functions as F

    spark.range(0, 200_000).withColumn("k", F.col("id") % 10_000).withColumn(
        "pay", F.md5(F.col("id").cast("string"))
    ).write.parquet(str(tmp_path / "fact"))
    spark.range(0, 20_000).withColumn("k", F.col("id")).withColumn(
        "attr", F.col("id") % 97
    ).write.parquet(str(tmp_path / "dim"))
    fact = spark.read.parquet(str(tmp_path / "fact"))
    dim = spark.read.parquet(str(tmp_path / "dim")).where(F.col("attr") == 3)
    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_scan = spark.conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "1KB",
    )
    try:
        assert (
            spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled")
            == "true"
        )
        plan = _plan(fact.join(dim, "k"))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            prev_scan,
        )
    assert "might_contain" in plan, "runtime bloom filter not injected"


def test_corpus_diff_shuffles_fingerprints_not_text(spark, sf_dir):
    """The diff's two shuffles must carry (id, md5) only — each side
    reduces to a 32-byte fingerprint BEFORE its exchange, so shuffle
    volume is per-doc constant, independent of document size."""
    plan = _plan(entry_queries.QUERIES["corpus_diff_documents"](spark, sf_dir))
    assert "FullOuter" in plan
    # each exchange's child projects the md5 fingerprint, not raw text:
    # no text column may appear above the exchanges (join + output)
    top = plan.split("Exchange", 1)[0]
    assert "text#" not in top


def test_funnel_single_shuffle_no_window(spark, sf_dir):
    """The whole k-stage funnel must cost ONE hash exchange (the key
    groupBy) — no per-stage passes, no window exchange, no join."""
    plan = _plan(entry_queries.QUERIES["funnel_events"](spark, sf_dir))
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert "Join" not in plan and "Window" not in plan


def test_jaccard_prefix_join_no_cartesian(spark, sf_dir):
    """The prefix-filtered exact join must plan as shuffled equi-joins
    on the shingle/id keys — never a cartesian or broadcast nested loop
    (either would mean the candidate generation regressed to all-pairs)."""
    docs = load_table(spark, sf_dir, "documents")
    plan = _plan(dedup.jaccard_prefix_pairs(docs, "doc_id", "text", n=3, threshold=0.6))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_containment_join_no_cartesian(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    plan = _plan(
        dedup.containment_pairs(docs, "doc_id", "text", n=3, threshold=0.7)
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_containment_exact_fused_count_plan(spark, sf_dir):
    """The exact path (max_token_df=None, r8) is the fused inverted-index
    count: an equi-join on the shingle with the size filter in the join
    condition, and the pair intersection computed by a PARTIAL-aggregated
    count — never a cartesian, never a wide-array verify join."""
    docs = load_table(spark, sf_dir, "documents")
    df = dedup.containment_pairs(
        docs, "doc_id", "text", n=3, threshold=0.7, max_token_df=None
    )
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # map-side combine on the pair-count aggregation (the shuffle carries
    # partially-counted pairs, not raw meetings)
    assert "partial_count" in plan
    # no array_intersect verify stage on this path
    assert "array_intersect" not in plan


def test_minhash_capped_fused_single_groupby(spark, sf_dir):
    """include_sets computes the 32 hash minima AND the verification
    sets in ONE groupBy(id): exactly one hashpartitioning exchange on id
    downstream of the capped inverted frame (r8 fusion — previously sets
    and signatures were two corpus-wide shuffles on the same key)."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    sh = dedup.shingle_sets(docs, "doc_id", "text", n=3).localCheckpoint(
        eager=False
    )
    inv = sh.select("id", F.explode("sh").alias("s"))
    capped = dedup.cap_shingle_df(inv, 1000, key="s")
    sigs = dedup.minhash_signatures(
        docs, "doc_id", "text", num_hashes=32, n=3,
        inverted=capped, include_sets=True,
    )
    plan = _plan(sigs)
    # collect_set forces ObjectHashAggregate; both outputs in one agg
    assert "ObjectHashAggregate" in plan
    assert set(sigs.columns) == {"id", "sig", "sh"}
    assert plan.count("Exchange hashpartitioning(id") == 1


def test_chi2_reference_probs_broadcast(spark, sf_dir):
    """The frozen categorical reference must broadcast into both the
    mapping join and the dense grid — a shuffle there would key the
    whole current stream on the tiny probability table."""
    from thoth_spark.profiler.drift import chi2_daily

    ev = load_table(spark, sf_dir, "events")
    plan = _plan(chi2_daily(ev, "ts", "event_type", "2024-01-08"))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_image_phash_neardup_no_cartesian(spark, sf_dir):
    """Image near-dup candidates must come from the block-permutation
    equi-join on (ci, cv) — a cartesian over image fingerprints is the
    O(n²) plan the Manku scheme exists to avoid."""
    plan = _plan(entry_queries.QUERIES["multimodal_phash_neardup"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_audio_neardup_no_cartesian(spark, sf_dir):
    plan = _plan(entry_queries.QUERIES["multimodal_audio_neardup"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_video_neardup_no_cartesian(spark, sf_dir):
    plan = _plan(entry_queries.QUERIES["multimodal_video_neardup"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_knn_classify_zero_shuffle(spark, sf_dir):
    """Label propagation must be ONE narrow pass over the unlabeled
    corpus (seed matrix in the UDF closure): any Exchange in the plan
    means the corpus is being shuffled for a bounded-size seed join."""
    plan = _plan(entry_queries.QUERIES["knn_classify_embeddings"](spark, sf_dir))
    assert "Exchange" not in plan
    assert "CartesianProduct" not in plan


def test_semantic_decontaminate_no_cartesian(spark, sf_dir):
    plan = _plan(
        entry_queries.QUERIES["decontaminate_embeddings_semantic"](spark, sf_dir)
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_winnow_fingerprints_single_shuffle(spark, sf_dir):
    """The fingerprint extraction is narrow after the staging barrier:
    exactly one Exchange (the repartition), no join machinery before
    the distinct."""
    plan = _plan(entry_queries.QUERIES["winnow_fingerprints_documents"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bloom_probe_broadcasts_filter_and_combines_map_side(spark, sf_dir):
    """The filter side (≤ m/32 words) must reach the probe join as a
    broadcast, the bit_or build must partial-aggregate map-side, and
    nothing may cartesian."""
    plan = _plan(
        entry_queries.QUERIES["bloom_contamination_documents"](spark, sf_dir)
    )
    assert "BroadcastHashJoin" in plan
    assert "partial_bit_or" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_vocabulary_topn_is_take_ordered_not_global_sort(spark, sf_dir):
    """Top-N must compile to TakeOrderedAndProject — a global Sort of
    the token-count table would be a corpus-sized single-partition sort
    at scale."""
    plan = _plan(entry_queries.QUERIES["vocabulary_documents"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_zorder_key_is_pure_expressions_zero_shuffle(spark, sf_dir):
    """Key computation is projection-only: no exchange beyond the
    loader's repartition, no UDF (BatchEvalPython/ArrowEvalPython)."""
    from thoth_spark.operators import storage

    ev = load_table(spark, sf_dir, "events")
    df = ev.select(
        "event_id",
        storage.zorder_key(
            [
                storage.minmax_quantize(F.col("user_id"), 0, 1000, bits=8),
                storage.minmax_quantize(F.col("value"), 0.0, 1000.0, bits=8),
            ]
        ).alias("zkey"),
    )
    plan = _plan(df)
    assert "EvalPython" not in plan
    assert plan.count("Exchange") <= 1  # at most the loader's repartition


def test_cms_build_partial_aggregates_and_estimate_broadcasts(spark, sf_dir):
    plan = _plan(
        entry_queries.QUERIES["cms_token_counts_documents"](spark, sf_dir)
    )
    assert "partial_count" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_pq_adc_scan_emits_bounded_candidates(spark, sf_dir):
    """The ADC stage is one mapInPandas over the codes; the only
    shuffle after it is the per-query ranking window — no join back to
    float vectors in the compressed-domain query."""
    plan = _plan(entry_queries.QUERIES["similarity_topk_pq"](spark, sf_dir))
    assert "MapInPandas" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_lloyd_refine_mean_update_partial_aggregates(spark, sf_dir):
    """The per-(cluster, pos) mean must map-side combine — a giant
    cluster funnelling one reducer is the failure this pins."""
    from thoth_spark.operators import clustering

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select(
        F.col("vec_id").alias("id"),
        F.col("embedding").cast("array<double>").alias("v"),
    )
    import numpy as np

    cent = clustering.seed_centroids(emb, "vec_id", "embedding", 4)
    from thoth_spark.operators.similarity import nearest_cells_udf

    asg = base.withColumn("cluster", nearest_cells_udf(cent, 1)(F.col("v"))[0])
    cells = (
        asg.select("cluster", F.posexplode("v").alias("pos", "x"))
        .groupBy("cluster", "pos")
        .agg(F.round(F.avg("x"), 6).alias("m"))
    )
    assert "partial_avg" in _plan(cells)


def test_ann_join_serve_query_side_stays_distributed(
    spark, sf_dir, tmp_path, monkeypatch
):
    """r12 verdict #2 lock: the join-based index serves must never
    collect QUERY VECTORS to the driver — only model-sized artifacts
    (centroids/codebooks: 'vector' columns from the index dir) and the
    bounded probed-cell set ('cell' only, <= n_centroids rows). A spy on
    DataFrame.collect records every collected schema during plan
    construction; the plan itself must show the salted cell equi-join
    and partition pruning on the cells scan."""
    from thoth_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    DataFrame = type(emb)  # the concrete class (classic vs connect)
    queries = emb.limit(5)
    path = str(tmp_path / "ivf_join_lock")
    pq_path = str(tmp_path / "ivfpq_join_lock")
    similarity.build_ivf_index(emb, path, n_centroids=8)
    similarity.build_ivfpq_index(
        emb, pq_path, n_centroids=8, m_subspaces=8, n_codes=16
    )

    real_collect = DataFrame.collect
    collected: list[list[str]] = []

    def spy(self):
        collected.append(list(self.columns))
        return real_collect(self)

    monkeypatch.setattr(DataFrame, "collect", spy)

    got = similarity.ivf_query_index_join(spark, path, queries, k=3, nprobe=2)
    got_pq = similarity.ivfpq_query_index_join(
        spark, pq_path, queries, emb, k=3, nprobe=2, rerank_pool=10
    )
    assert len(real_collect(got)) == 15
    assert len(real_collect(got_pq)) == 15
    for cols in collected:
        assert "embedding" not in cols and "qv" not in cols, collected
    # spy sanity: the collect-based serve DOES pull query vectors
    similarity.ivfpq_query_index(
        spark, pq_path, queries, emb, k=3, nprobe=2, rerank_pool=10
    )
    assert any("embedding" in cols for cols in collected)

    monkeypatch.setattr(DataFrame, "collect", real_collect)
    for df in (got, got_pq):
        plan = _plan(df)
        assert "__salt" in plan, plan[:2000]  # de-skewed cell join
        assert "PartitionFilters: [cell" in plan or re.search(
            r"PartitionFilters: \[.*cell", plan
        ), plan[:2000]


def test_gopher_rules_zero_exchange(spark, sf_dir):
    """The Gopher quality gate is a pure map-side expression pass: no
    UDF, no exchange anywhere in the plan — the property that makes it
    free at 100 TB (it rides the scan). Locked on the raw loader (the
    _documents() driver wrapper adds its deliberate small-fixture
    round-robin repartition, which vanishes on real multi-file input)."""
    from thoth_spark.operators import text as text_ops

    docs = load_table(spark, sf_dir, "documents")
    plan = _plan(text_ops.gopher_rules(docs))
    assert "Exchange" not in plan
    assert "Python" not in plan  # no UDF in the hot path


def test_ngram_decontaminate_broadcasts_benchmark(spark, sf_dir):
    """The eval-set side must BROADCAST into the shingle equi-join (the
    corpus never shuffles against it) and nothing may degenerate to a
    cartesian/nested-loop pairing."""
    plan = _plan(
        entry_queries.QUERIES["ngram_decontaminate_documents"](spark, sf_dir)
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ngram_decontaminate_broadcast_size_guard(spark, sf_dir):
    """An oversized "benchmark" must fall back to a shuffle join instead
    of a forced broadcast (the OOM path at scale) — with identical
    results either way."""
    from thoth_spark.operators import dedup as dedup_ops

    docs = load_table(spark, sf_dir, "documents")
    train = docs.where(F.col("doc_id") % 10 != 0)
    bench = docs.where(F.col("doc_id") % 10 == 0)
    # cap between the bench DOC count (50) and the bench INDEX rows
    # (thousands): the common big-eval-set shape — the per-(shingle,
    # doc) index trips the guard and loses its hint, while the per-doc
    # size frame b_sz keeps its own-count-guarded hint. So exactly ONE
    # hint, and none on the shingle join. (AQE may still pick a
    # broadcast strategy on tiny test data, so assert on the optimized
    # logical plan's hints instead.)
    guarded = dedup_ops.ngram_decontaminate(
        train, bench, "doc_id", "text", n=3, threshold=0.5,
        broadcast_max_rows=100,
    )
    logical = guarded._jdf.queryExecution().optimizedPlan().toString()
    assert logical.lower().count("broadcast") == 1
    shingle_join = [
        ln for ln in logical.splitlines() if "shingle" in ln and "Join" in ln
    ]
    assert shingle_join and all(
        "broadcast" not in ln.lower() for ln in shingle_join
    )
    # a degenerate corpus-scale bench side (cap below even the doc
    # count) drops EVERY hint — b_sz is guarded by its own count, not
    # assumed safe
    degenerate = dedup_ops.ngram_decontaminate(
        train, bench, "doc_id", "text", n=3, threshold=0.5,
        broadcast_max_rows=1,
    )
    assert (
        degenerate._jdf.queryExecution().optimizedPlan().toString().lower().count("broadcast")
        == 0
    )
    normal = dedup_ops.ngram_decontaminate(
        train, bench, "doc_id", "text", n=3, threshold=0.5
    )
    assert (
        normal._jdf.queryExecution().optimizedPlan().toString().lower().count("broadcast")
        == 2
    )
    assert sorted(map(tuple, guarded.collect())) == sorted(
        map(tuple, normal.collect())
    )
    assert sorted(map(tuple, degenerate.collect())) == sorted(
        map(tuple, normal.collect())
    )


def test_c4_rules_zero_exchange(spark, sf_dir):
    """The C4 gate must be a pure map-side pass like gopher_rules: no
    exchange, no Python in the hot path."""
    from thoth_spark.operators import text as text_ops

    docs = load_table(spark, sf_dir, "documents")
    plan = _plan(text_ops.c4_rules(docs))
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_gopher_repetition_char_weighted_no_extra_exchange(spark, sf_dir):
    """The char-mass columns ride the existing per-gram partial-agg
    chain: char_weighted=True must add ZERO exchanges vs the plain
    occurrence path."""
    from thoth_spark.operators import text as text_ops

    docs = load_table(spark, sf_dir, "documents")
    plain = _plan(text_ops.gopher_repetition(docs, ns=(2, 3)))
    weighted = _plan(
        text_ops.gopher_repetition(docs, ns=(2, 3), char_weighted=True)
    )
    assert weighted.count("Exchange hashpartitioning") == plain.count(
        "Exchange hashpartitioning"
    )


def test_gopher_repetition_gram_volume_never_shuffles(spark, sf_dir):
    """r14 shuffle shape: the exploded gram volume must NOT cross the
    wire — the cached id-partitioned token frame already satisfies both
    groupBys' clustering, so the FINAL adaptive plan may contain no
    ENSURE_REQUIREMENTS exchange (only the REPARTITION_BY_COL barrier
    that builds the cache). Reverting cache() to localCheckpoint()
    erases outputPartitioning and regresses to a gram-row shuffle
    (measured 56 MB vs 757 MB at the 20x probe) — this lock catches
    that. Materialize first: AQE only drops the provisional exchanges
    in the final re-plan."""
    from thoth_spark.operators import text as text_ops

    docs = load_table(spark, sf_dir, "documents")
    df = text_ops.gopher_repetition(docs, ns=(2, 3, 5), char_weighted=True)
    df.write.format("noop").mode("overwrite").save()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ENSURE_REQUIREMENTS" not in plan, plan[:2000]
    assert "InMemoryTableScan" in plan  # the shared token barrier


def test_gopher_repetition_exchanges_independent_of_orders(spark, sf_dir):
    """One gram pass regardless of how many n-gram orders are requested:
    the exchange count for 5 orders must equal the count for 2 — the
    unioned legs share the same groupBy chain, not one job per n."""
    from thoth_spark.operators import text as text_ops

    docs = load_table(spark, sf_dir, "documents")
    few = _plan(text_ops.gopher_repetition(docs, ns=(2, 3)))
    many = _plan(text_ops.gopher_repetition(docs, ns=(2, 3, 4, 5, 10)))
    n_few = few.count("Exchange hashpartitioning")
    n_many = many.count("Exchange hashpartitioning")
    assert n_many == n_few
