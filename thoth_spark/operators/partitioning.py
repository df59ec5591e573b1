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


def spread_narrow(
    df: DataFrame, *key_cols: str, scan_probe: bool = True
) -> DataFrame:
    """Repartition ``df`` to ``defaultParallelism`` (hashed on
    ``key_cols`` when given, round-robin otherwise) iff its current
    partitioning is narrower than the cluster's — a no-op at scale.

    Probe cost (r16 advice): ``df.rdd.getNumPartitions()`` forces full
    physical planning of the frame on the driver at every call site, in
    hot operator-construction paths, even at scale where the call then
    no-ops. With ``scan_probe`` (the default — every current call site
    feeds a projection of a fresh file scan) the narrowness test is the
    METADATA-ONLY file count (``len(df.inputFiles())``, the same probe
    :func:`ivf_query_index_join` uses on compacted index scans): a scan
    of >= cluster-parallelism files is never narrow, and a 1-file local
    scan always is. The file count can misjudge a frame whose scan
    packing/splitting diverges from its file count (few huge splittable
    files, or a post-shuffle derived frame) — the cost is one spurious
    or missed exchange, never a result change; pass
    ``scan_probe=False`` for derived frames to get the exact (planning)
    probe. Frames with no input files (in-memory sources) fall back to
    the exact probe automatically."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    if scan_probe:
        try:
            nf = len(df.inputFiles())
        except Exception:
            nf = 0
        if nf >= target:
            return df
        narrow = nf > 0  # 0 files: not a file scan — use the exact probe
    else:
        narrow = False
    if not narrow and df.rdd.getNumPartitions() >= target:
        return df
    if key_cols:
        return df.repartition(target, *[F.col(c) for c in key_cols])
    return df.repartition(target)
