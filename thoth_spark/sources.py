"""Table loaders for the test datasets (and any parquet directory).

The ``events`` table is written with nanosecond parquet timestamps, which
Spark's vectorized reader rejects; we read them as raw int64 nanos
(``spark.sql.legacy.parquet.nanosAsLong``) and convert to microsecond
timestamps with exact integer division (``DIV`` — no double rounding).
Predicate pushdown and column pruning still apply to the int64 column.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TPCH_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
]
ALL_TABLES = TPCH_TABLES + ["events", "documents", "embeddings"]

#: columns stored as int64 nanoseconds that must be converted to timestamps
_NANO_TS_COLUMNS = {"events": ["ts"]}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one test table, normalizing nanosecond-timestamp columns."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    nano_cols = _NANO_TS_COLUMNS.get(name, [])
    if nano_cols:
        prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        try:
            df = spark.read.parquet(path)
        finally:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)
        for c in nano_cols:
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"{c} DIV 1000")))
        return df
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> None:
    """Register every test table as a temp view (mirrors the driver's
    duckdb-side view registration, so Spark SQL and oracle SQL read the
    same relation names)."""
    for name in tables or ALL_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
