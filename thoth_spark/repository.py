"""Metrics repository on partitioned parquet.

Spark-native replacement for the reference's SQLModel/RDBMS store
(``/root/reference/thoth/repository.py:258-347``): long-format tables
partitioned by ``dataset_uri`` so every per-dataset read prunes to one
partition directory. Upserts use dynamic partition overwrite
(read-merge-overwrite of only the touched ``dataset_uri`` partitions);
on a Delta/Iceberg-enabled cluster the same operations map to
``MERGE INTO`` — noted per method.

Tables under ``base_path``:

- ``datasets``   — registry: (dataset_uri, ts_column, columns, granularity)
- ``metrics``    — (dataset_uri, ts, granularity, entity, instance, name, value)
- ``optimizations`` — per-metric best model + threshold (+ confidence)
- ``scorings``   — (dataset_uri, ts, entity, instance, name, predicted, error)
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_METRICS_SCHEMA = (
    "dataset_uri string, ts timestamp, granularity string, entity string,"
    " instance string, name string, value double"
)
_DATASETS_SCHEMA = (
    "dataset_uri string, ts_column string, columns array<string>, granularity string"
)
_OPT_SCHEMA = (
    "dataset_uri string, entity string, instance string, name string,"
    " best_model_name string, threshold double, mean_error double,"
    " below_threshold_proportion double, confidence double"
)
_SCORING_SCHEMA = (
    "dataset_uri string, ts timestamp, entity string, instance string,"
    " name string, value double, predicted double, error double"
)


class DatasetValidationError(Exception):
    """Profiling data inconsistent with the registered dataset metadata
    (parity with the reference's ``_validate_profiling_records``,
    ``repository.py:28-55``)."""


class MetricsRepository:
    """Parquet-backed port of the reference's AbstractRepository."""

    def __init__(self, spark: SparkSession, base_path: str):
        self.spark = spark
        self.base_path = base_path
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    def _path(self, table: str) -> str:
        return os.path.join(self.base_path, table)

    def _read(self, table: str, schema: str) -> DataFrame:
        """Read a repository table; a table that does not exist yet reads
        as empty. Any OTHER read error must propagate: the upserts here
        are read-merge-overwrite, so silently treating a transient or
        corruption failure as "empty" would make the subsequent dynamic
        partition overwrite replace stored history with only the new
        batch — a data-loss bug, not a recoverable condition."""
        path = self._path(table)
        if not self._table_exists(path):
            return self.spark.createDataFrame([], schema)
        return self.spark.read.schema(schema).parquet(path)

    def _table_exists(self, path: str) -> bool:
        """Existence check through Hadoop's FileSystem API so it works on
        any supported filesystem (local, HDFS, object stores), not just
        the driver's local disk."""
        jvm = self.spark.sparkContext._jvm
        jsc = self.spark.sparkContext._jsc
        hadoop_path = jvm.org.apache.hadoop.fs.Path(path)
        fs = hadoop_path.getFileSystem(jsc.hadoopConfiguration())
        return bool(fs.exists(hadoop_path))

    def _overwrite_partitions(self, df: DataFrame, table: str) -> None:
        """Overwrite only the dataset_uri partitions present in ``df``
        (Delta equivalent: MERGE INTO ... ON dataset_uri AND key).

        ``localCheckpoint`` materializes the merged rows first — Spark
        cannot stream-read a path while overwriting it."""
        materialized = df.repartition("dataset_uri").localCheckpoint(eager=True)
        (
            materialized.write.mode("overwrite")
            .partitionBy("dataset_uri")
            .parquet(self._path(table))
        )

    # -- dataset registry ---------------------------------------------------

    def add_dataset(
        self,
        dataset_uri: str,
        ts_column: str,
        columns: list[str],
        granularity: str = "DAY",
    ) -> None:
        """Upsert dataset metadata by uri."""
        # registry is tiny — collect, replace, rewrite
        existing = [
            tuple(r)
            for r in self._read("datasets", _DATASETS_SCHEMA).collect()
            if r["dataset_uri"] != dataset_uri
        ]
        rows = existing + [(dataset_uri, ts_column, columns, granularity)]
        self.spark.createDataFrame(rows, _DATASETS_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(self._path("datasets"))

    def get_dataset(self, dataset_uri: str) -> dict | None:
        rows = (
            self._read("datasets", _DATASETS_SCHEMA)
            .where(F.col("dataset_uri") == dataset_uri)
            .collect()
        )
        return rows[0].asDict() if rows else None

    def get_datasets(self) -> list[dict]:
        return [
            r.asDict()
            for r in self._read("datasets", _DATASETS_SCHEMA)
            .orderBy("dataset_uri")
            .collect()
        ]

    # -- profiling metrics ---------------------------------------------------

    def add_profiling(
        self, dataset_uri: str, metrics_df: DataFrame, granularity: str = "DAY"
    ) -> None:
        """Upsert metric rows by (dataset_uri, ts): re-profiling the same
        timestamp replaces the previous report — the reference's tested
        re-assessment semantics (``service_layer.py:481-486``)."""
        dataset = self.get_dataset(dataset_uri)
        if dataset is None:
            raise DatasetValidationError(
                f"Dataset '{dataset_uri}' is not registered; call add_dataset first."
            )
        if dataset["granularity"] != granularity:
            raise DatasetValidationError(
                f"Granularity mismatch: registered {dataset['granularity']},"
                f" got {granularity}."
            )
        new = metrics_df.select(
            F.lit(dataset_uri).alias("dataset_uri"),
            "ts",
            F.lit(granularity).alias("granularity"),
            "entity",
            "instance",
            "name",
            F.col("value").cast("double"),
        )
        existing = self._read("metrics", _METRICS_SCHEMA).where(
            F.col("dataset_uri") == dataset_uri
        )
        new_ts = new.select("ts").distinct()
        kept = existing.join(new_ts, on="ts", how="left_anti").select(*new.columns)
        self._overwrite_partitions(kept.unionByName(new), "metrics")

    def select_profiling(
        self, dataset_uri: str, start_ts=None, end_ts=None
    ) -> DataFrame:
        """Closed-interval range scan, partition-pruned by dataset_uri,
        sorted by ts (reference ``repository.py:294-303``)."""
        df = self._read("metrics", _METRICS_SCHEMA).where(
            F.col("dataset_uri") == dataset_uri
        )
        if start_ts is not None:
            df = df.where(F.col("ts") >= F.lit(start_ts))
        if end_ts is not None:
            df = df.where(F.col("ts") <= F.lit(end_ts))
        return df.orderBy("ts")

    # -- optimizations ---------------------------------------------------------

    def add_optimization(
        self, dataset_uri: str, optimization_df: DataFrame, confidence: float
    ) -> None:
        """Upsert by dataset_uri (one optimization per dataset)."""
        new = optimization_df.select(
            F.lit(dataset_uri).alias("dataset_uri"),
            "entity",
            "instance",
            "name",
            "best_model_name",
            F.col("threshold").cast("double"),
            F.col("mean_error").cast("double"),
            F.col("below_threshold_proportion").cast("double"),
            F.lit(confidence).alias("confidence"),
        )
        self._overwrite_partitions(new, "optimizations")

    def get_optimization(self, dataset_uri: str) -> DataFrame:
        return self._read("optimizations", _OPT_SCHEMA).where(
            F.col("dataset_uri") == dataset_uri
        )

    # -- scorings ---------------------------------------------------------------

    def add_scoring(self, dataset_uri: str, scoring_df: DataFrame) -> None:
        """Upsert by (dataset_uri, ts)."""
        new = scoring_df.select(
            F.lit(dataset_uri).alias("dataset_uri"),
            "ts",
            "entity",
            "instance",
            "name",
            F.col("value").cast("double"),
            F.col("predicted").cast("double"),
            F.col("error").cast("double"),
        )
        existing = self._read("scorings", _SCORING_SCHEMA).where(
            F.col("dataset_uri") == dataset_uri
        )
        new_ts = new.select("ts").distinct()
        kept = existing.join(new_ts, on="ts", how="left_anti").select(*new.columns)
        self._overwrite_partitions(kept.unionByName(new), "scorings")

    def get_profiling(self, dataset_uri: str, ts) -> DataFrame:
        """Point lookup of one profiling report (the reference addresses it
        by ``sha1(uri + ts.isoformat())`` — ``profiler.py:198-204``; the
        natural key (uri, ts) is the same identity without the digest)."""
        return self._read("metrics", _METRICS_SCHEMA).where(
            (F.col("dataset_uri") == dataset_uri) & (F.col("ts") == F.lit(ts))
        )

    def get_scoring(self, dataset_uri: str, ts) -> DataFrame:
        """Point lookup of one scoring event (reference ``scoring.py:38-40``
        sha1 id ≙ natural key (uri, ts))."""
        return self._read("scorings", _SCORING_SCHEMA).where(
            (F.col("dataset_uri") == dataset_uri) & (F.col("ts") == F.lit(ts))
        )

    def select_scoring(self, dataset_uri: str, start_ts=None, end_ts=None) -> DataFrame:
        df = self._read("scorings", _SCORING_SCHEMA).where(
            F.col("dataset_uri") == dataset_uri
        )
        if start_ts is not None:
            df = df.where(F.col("ts") >= F.lit(start_ts))
        if end_ts is not None:
            df = df.where(F.col("ts") <= F.lit(end_ts))
        return df.orderBy("ts")
