"""Bucketed-table storage: pre-shuffled layouts for co-located joins.

At 100 TB the same fact-to-fact join key (e.g. orderkey) is joined over
and over; bucketing both tables by that key at write time pays the
shuffle ONCE — every subsequent join/aggregation on the bucket key runs
shuffle-free (Spark matches `HashPartitioning(bucket_cols, n)` on both
sides). This is the parquet-native stand-in for the co-partitioning a
warehouse gets from distribution keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


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
