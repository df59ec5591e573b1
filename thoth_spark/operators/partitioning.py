"""Scale-adaptive parallelism helpers.

The engine's CPU-dense per-row stages (Arrow UDF passes, signature
computation, per-pair verification) inherit their task count from
whatever feeds them. On a production corpus that is thousands of input
splits and the cluster is saturated; on a small corpus (one parquet
file under ``spark.sql.files.maxPartitionBytes``) it is ONE task, and a
pass that should take wall/32 runs serially while 31 cores idle.

:func:`spread_narrow` closes that gap without distorting the at-scale
plan: it repartitions to ``defaultParallelism`` ONLY when the frame's
current partitioning is strictly narrower than the cluster — at real
scale the condition is false and the call is a no-op (no exchange is
inserted). This is the same probe the persisted-index serves use for
narrow (one-file-per-cell) index scans, extracted for every heavy
scan-side stage.

Placement never affects results for the stages this guards (per-row
functions, or joins/aggregations that re-key downstream); hashing on a
provided key column keeps the exchange deterministic under task retry
(guide §2.5 — keyless round-robin additionally pays a local
sort-before-repartition, so callers pass an id column where one
exists).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def spread_narrow(df: DataFrame, *key_cols: str) -> DataFrame:
    """Repartition ``df`` to ``defaultParallelism`` (hashed on
    ``key_cols`` when given, round-robin otherwise) iff its current
    partition count is below the cluster's — a no-op at scale."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    n = df.rdd.getNumPartitions()
    if n >= target:
        return df
    if key_cols:
        return df.repartition(target, *[F.col(c) for c in key_cols])
    return df.repartition(target)
