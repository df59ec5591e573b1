"""Adversarial skew stress tests (round-3 advice #9): hot keys and
stop-shingles are THE failure mode that appears at 100 TB and not at
fixture scale, so each scale-critical operator gets a deliberately
skewed input here with (a) an exact correctness assertion derived from
the construction and (b) a generous absolute wall-clock bound that a
single-task-hot-key plan would blow through. Measured timings are
recorded in SCALE.md §skew.
"""

import datetime
import time

from pyspark.sql import functions as F

from thoth_spark.operators import curation, dedup, relational
from thoth_spark.profiler import Mean, ProfilingBuilder, Size, profile

BASE = datetime.datetime(2024, 1, 1)


def _timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return out, time.perf_counter() - t0


def test_profile_hot_day_skew(spark):
    """90% of 200k events land on ONE day. The profiler is a single
    groupBy(date_trunc) aggregation — partial (map-side) aggregation
    absorbs the hot bucket before the shuffle, so the hot day must cost
    roughly what the balanced days cost, and every metric stays exact."""
    n = 200_000
    ev = (
        spark.range(n)
        .withColumn(
            "ts",
            F.when(
                F.col("id") % 10 < 9, F.lit(BASE)  # 90% on day 0
            ).otherwise(
                # ids hitting this branch are ≡9 mod 10, so derive the
                # cold day from id/10 to actually cover 30 days
                F.timestamp_seconds(
                    F.unix_timestamp(F.lit(BASE))
                    + ((F.col("id") / 10).cast("long") % 30 + 1) * 86400
                )
            ),
        )
        .withColumn("value", F.lit(1.0))
        .repartition(16)
    )
    builder = ProfilingBuilder(analyzers=[Mean("value"), Size()])
    (rows, wall) = _timed(
        lambda: profile(ev.select("ts", "value"), "ts", builder).collect()
    )
    got = {
        (r["ts"].date() if hasattr(r["ts"], "date") else r["ts"], r["name"]): r["value"]
        for r in rows
    }
    hot = sum(1 for i in range(10) if i < 9) * (n // 10)
    assert got[(BASE.date(), "Size")] == float(hot)
    assert got[(BASE.date(), "Mean")] == 1.0
    # 30 cold days share the remaining 10%
    cold_days = {k for k in got if k[1] == "Size" and k[0] != BASE.date()}
    assert len(cold_days) == 30
    assert wall < 60.0


def test_sessionize_hot_user_skew(spark):
    """One user owns 100k of 100.1k events (the window partition hot
    key). row_number/lag keep O(1) running state, so the hot partition
    streams through one task without buffering blowup; session counts
    are exact by construction."""
    hot = spark.range(100_000).select(
        F.lit(1).alias("user_id"),
        F.col("id").alias("event_id"),
        # 10-minute spacing, gap threshold 3600s → one giant session
        F.timestamp_seconds(F.unix_timestamp(F.lit(BASE)) + F.col("id") * 600).alias("ts"),
    )
    cold = spark.range(100).select(
        F.lit(2).alias("user_id"),
        (F.col("id") + 200_000).alias("event_id"),
        # 2-hour spacing → every event its own session
        F.timestamp_seconds(F.unix_timestamp(F.lit(BASE)) + F.col("id") * 7200).alias("ts"),
    )
    ev = hot.unionByName(cold).repartition(16)
    (rows, wall) = _timed(
        lambda: relational.sessionize(
            ev, ["user_id"], "ts", gap_seconds=3600, tiebreak_cols=["event_id"]
        )
        .groupBy("user_id")
        .agg(F.count_distinct("session_id").alias("n_sessions"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    got = {r["user_id"]: (r["n_sessions"], r["n"]) for r in rows}
    assert got[1] == (1, 100_000)
    assert got[2] == (100, 100)
    assert wall < 60.0


def test_salted_join_hot_key_matches_plain_join(spark):
    """80% of the fact side carries ONE join key. salted_join spreads the
    hot key over salt_buckets tasks; the result must equal the plain
    join exactly (row count and aggregate checksum)."""
    n = 200_000
    left = spark.range(n).select(
        F.when(F.col("id") % 5 < 4, F.lit(1))
        .otherwise((F.col("id") % 99) + 2)
        .alias("k"),
        F.col("id").alias("lid"),
    )
    right = spark.range(1, 101).select(
        F.col("id").cast("int").alias("k"), (F.col("id") * 10).alias("rv")
    )
    (salted, wall) = _timed(
        lambda: relational.salted_join(left, right, ["k"], salt_buckets=16)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("lid") + F.col("rv")).alias("checksum"),
        )
        .collect()[0]
    )
    plain = (
        left.join(right, "k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("lid") + F.col("rv")).alias("checksum"),
        )
        .collect()[0]
    )
    assert (salted["n"], salted["checksum"]) == (plain["n"], plain["checksum"])
    assert salted["n"] == n  # every left row matches exactly one key
    assert wall < 60.0


def test_minhash_stop_shingle_bounded_candidates(spark):
    """Every document shares one boilerplate sentence, so every pairwise
    Jaccard sits near the LSH operating point and the UNCAPPED pipeline
    legitimately explodes toward all-pairs (measured 807k candidate
    pairs for 1550 docs when this test was first written). With
    ``max_shingle_df`` the corpus-wide stop-shingles are dropped before
    signature computation (drop-list join, never a window over the hot
    shingle), candidates collapse to ∝ true-duplicate density, and every
    planted clone pair is still recovered via its unique shingles."""
    n = 1500
    boiler = "all rights reserved contact us at example for terms of service apply"
    rows = []
    for i in range(n):
        uniq = f"document number {i} carries distinct content token{i} alpha{i * 7} beta{i * 13}"
        rows.append((i, f"{boiler} {uniq}"))
    # 50 planted near-dup pairs: doc n+j clones doc j's text verbatim
    for j in range(50):
        rows.append((n + j, rows[j][1]))
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(16)

    def run():
        sigs = dedup.minhash_signatures(
            df, "doc_id", "text", num_hashes=32, n=3, max_shingle_df=100
        )
        return dedup.minhash_lsh_pairs(sigs, bands=8, rows_per_band=4).collect()

    (pairs, wall) = _timed(run)
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    for j in range(50):
        assert (j, n + j) in got
    # bounded fan-out: clones bucket together via their (uncapped)
    # unique shingles; the shared boilerplate no longer contributes, so
    # unrelated docs share nothing and candidates ≈ the planted 50
    assert len(got) < 500
    assert wall < 120.0
