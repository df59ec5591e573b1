"""Bucketed-table storage: pre-shuffled layouts for co-located joins.

At 100 TB the same fact-to-fact join key (e.g. orderkey) is joined over
and over; bucketing both tables by that key at write time pays the
shuffle ONCE — every subsequent join/aggregation on the bucket key runs
shuffle-free (Spark matches `HashPartitioning(bucket_cols, n)` on both
sides). This is the parquet-native stand-in for the co-partitioning a
warehouse gets from distribution keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (optionally sorted) parquet table.

    Both sides of a future join must use the same ``num_buckets`` and
    bucket columns to get the shuffle-free plan; ``sort_cols`` additionally
    lets sort-merge join skip its sort.

    Any same-named catalog entry is dropped first: a managed-table
    LOCATION from an earlier session would otherwise block re-creation
    (LOCATION_ALREADY_EXISTS) even under overwrite mode. Pass ``path``
    for an external location when the default warehouse dir may hold
    stale data from a previous process.
    """
    df.sparkSession.sql(f"DROP TABLE IF EXISTS {table_name}")
    writer = (
        df.write.mode("overwrite").format("parquet").bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    """Read a bucketed table (bucket metadata only survives the catalog
    path — a plain ``spark.read.parquet`` on the files would lose it)."""
    return spark.table(table_name)


# ---------------------------------------------------------------------------
# Z-order (Morton) layout keys — multi-dimensional data skipping.
# ---------------------------------------------------------------------------


def minmax_quantize(col: Column, mn: float, mx: float, bits: int = 8) -> Column:
    """Map a numeric column onto the ``[0, 2^bits)`` integer grid by
    min/max scaling (``mn``/``mx`` are data-derived scalars — two cheap
    scalar aggregates, the only non-streaming step). Values at ``mx``
    clamp into the top cell."""
    span = float(mx) - float(mn)
    if span == 0:
        return F.lit(0).cast("long")
    q = F.floor(
        (col.cast("double") - F.lit(float(mn))) / F.lit(span) * F.lit(float(2**bits))
    ).cast("long")
    return F.least(q, F.lit(2**bits - 1)).cast("long")


def zorder_key(cols: list[Column], bits: int = 8) -> Column:
    """Interleave the low ``bits`` bits of ``cols`` (non-negative
    integer grid cells, e.g. :func:`minmax_quantize` output) into one
    Morton key — pure JVM bit expressions, no UDF.

    Why at 100 TB: parquet min/max pruning only skips on the SORT
    column; sorting by the Morton key keeps EVERY interleaved dimension
    coarsely clustered, so predicates on any of them prune row groups
    (the Delta/Iceberg OPTIMIZE ZORDER trick). Layout recipe::

        k = zorder_key([minmax_quantize(...), minmax_quantize(...)])
        (df.withColumn("zkey", k)
           .repartitionByRange(n, "zkey")      # range shuffle ONCE at write
           .sortWithinPartitions("zkey")
           .write.parquet(...))
    """
    n = len(cols)
    total = F.lit(0).cast("long")
    for ci, c in enumerate(cols):
        for i in range(bits):
            bit = F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1).cast("long"))
            total = total + F.shiftleft(bit, i * n + ci)
    return total
