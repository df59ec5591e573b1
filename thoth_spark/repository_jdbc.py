"""JDBC metrics repository (embedded Apache Derby).

Second adapter proving the repository port, mirroring the reference's
RDBMS store (``/root/reference/thoth/repository.py:258-347`` — SQLModel
over SQLite/Postgres): same public API as
:class:`thoth_spark.repository.MetricsRepository`, but persisting
through Spark's JDBC source into an embedded Derby database (Derby ships
in Spark's own ``jars/``, so no extra dependency). Swap the URL/driver
for Postgres etc. on a real deployment.

Scale note: this adapter exists for dashboard/RDBMS parity. The tables
it holds are post-aggregation metrics (rows ∝ #metrics × #days — metadata
scale, not data scale), so whole-table read-merge-overwrite is the right
cost model; the parquet adapter remains the partition-pruned path for
large metric stores.

Derby/JDBC quirks handled here:

- Spark maps ``StringType`` to CLOB on Derby, and Derby refuses ``=``
  comparisons on CLOB — every string column is pinned to VARCHAR via
  ``createTableColumnTypes``;
- JDBC has no array type: the dataset registry's ``columns`` list is
  stored unit-separator-joined and re-split on read;
- a missing table (first use) reads as empty; any OTHER read error
  propagates — same no-data-loss contract as the parquet adapter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from thoth_spark.repository import (
    _DATASETS_SCHEMA,
    _METRICS_SCHEMA,
    _OPT_SCHEMA,
    _SCORING_SCHEMA,
    DatasetValidationError,
)

_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"

#: JDBC flat twin of the registry schema (array<string> → joined string)
_DATASETS_FLAT_SCHEMA = (
    "dataset_uri string, ts_column string, columns_joined string, granularity string"
)

_SEP = "\x1f"

#: explicit VARCHAR widths so Derby gets comparable/groupable columns
_COLUMN_TYPES = {
    "datasets": (
        "dataset_uri VARCHAR(512), ts_column VARCHAR(256),"
        " columns_joined VARCHAR(4096), granularity VARCHAR(32)"
    ),
    "metrics": (
        "dataset_uri VARCHAR(512), granularity VARCHAR(32), entity VARCHAR(64),"
        " instance VARCHAR(256), name VARCHAR(256)"
    ),
    "optimizations": (
        "dataset_uri VARCHAR(512), entity VARCHAR(64), instance VARCHAR(256),"
        " name VARCHAR(256), best_model_name VARCHAR(128)"
    ),
    "scorings": (
        "dataset_uri VARCHAR(512), entity VARCHAR(64), instance VARCHAR(256),"
        " name VARCHAR(256)"
    ),
}


#: JDBC URL scheme → driver class, for the URL-override path. Postgres
#: mirrors the reference's ``DATABASE_URL=postgresql+pg8000://...``
#: deployment knob (/root/reference/docker-compose.yaml,
#: thoth/service_layer.py:20-26) — the day a server exists, point
#: ``THOTH_SPARK_DATABASE_URL`` (or the ``url=`` argument) at it and no
#: code changes are needed. The Postgres JDBC driver jar must be on the
#: Spark classpath (``spark.jars``); it is not bundled here.
_DRIVERS_BY_SCHEME = {
    "jdbc:derby:": _DRIVER,
    "jdbc:postgresql:": "org.postgresql.Driver",
}


def _infer_driver(url: str) -> str | None:
    for scheme, driver in _DRIVERS_BY_SCHEME.items():
        if url.startswith(scheme):
            return driver
    return None


class JdbcMetricsRepository:
    """Derby-backed port of the reference's SqlRepository. Any other
    RDBMS is a URL away: pass ``url=`` (full JDBC URL, e.g.
    ``jdbc:postgresql://host/db?user=u&password=p``) or set
    ``THOTH_SPARK_DATABASE_URL`` — both beat ``db_path``; the driver
    class is inferred from the URL scheme (override with ``driver=``
    for schemes not in ``_DRIVERS_BY_SCHEME``)."""

    def __init__(
        self,
        spark: SparkSession,
        db_path: str | None = None,
        url: str | None = None,
        driver: str | None = None,
    ):
        import os

        self.spark = spark
        env_url = os.environ.get("THOTH_SPARK_DATABASE_URL")
        if url or env_url:
            self.url = url or env_url
        elif db_path is not None:
            self.url = f"jdbc:derby:{db_path};create=true"
        else:
            raise ValueError(
                "JdbcMetricsRepository needs db_path, url=, or the "
                "THOTH_SPARK_DATABASE_URL environment variable"
            )
        self._driver = driver or _infer_driver(self.url)

    # -- storage primitives --------------------------------------------------

    def _with_driver(self, rw):
        """Attach the driver option when one is known; an unknown scheme
        lets Spark's JDBC source resolve the driver from the URL."""
        return rw.option("driver", self._driver) if self._driver else rw

    def _read(self, table: str, schema: str) -> DataFrame:
        try:
            df = (
                self._with_driver(
                    self.spark.read.format("jdbc").option("url", self.url)
                )
                .option("dbtable", table)
                .load()
            )
        except Exception as e:  # noqa: BLE001 — inspect & re-raise below
            msg = str(e)
            # Derby's table-missing error (first use) reads as empty;
            # everything else is a real failure that must NOT be treated
            # as "empty" (the upserts are read-merge-overwrite).
            if "does not exist" in msg or "42X05" in msg:
                return self.spark.createDataFrame([], schema)
            raise
        expected = self.spark.createDataFrame([], schema)
        return df.select(
            *[F.col(f.name).cast(f.dataType) for f in expected.schema.fields]
        )

    def _overwrite(self, df: DataFrame, table: str) -> None:
        """Replace the whole table (metadata-scale frames; the merged
        frame is materialized first — JDBC can't read a table it is
        overwriting)."""
        materialized = df.localCheckpoint(eager=True)
        writer = (
            self._with_driver(
                materialized.write.format("jdbc").option("url", self.url)
            )
            .option("dbtable", table)
            .mode("overwrite")
        )
        if table in _COLUMN_TYPES:
            writer = writer.option("createTableColumnTypes", _COLUMN_TYPES[table])
        writer.save()

    def _merged_upsert(
        self, table: str, schema: str, new: DataFrame, dataset_uri: str
    ) -> None:
        """Upsert by (dataset_uri, ts): keep other datasets' rows and this
        dataset's rows for untouched ts values, replace the rest."""
        existing = self._read(table, schema)
        others = existing.where(F.col("dataset_uri") != dataset_uri)
        mine = existing.where(F.col("dataset_uri") == dataset_uri)
        new_ts = new.select("ts").distinct()
        kept = mine.join(new_ts, on="ts", how="left_anti").select(*new.columns)
        self._overwrite(others.select(*new.columns).unionByName(kept).unionByName(new), table)

    # -- dataset registry ----------------------------------------------------

    def add_dataset(
        self,
        dataset_uri: str,
        ts_column: str,
        columns: list[str],
        granularity: str = "DAY",
    ) -> None:
        existing = [
            tuple(r)
            for r in self._read("datasets", _DATASETS_FLAT_SCHEMA).collect()
            if r["dataset_uri"] != dataset_uri
        ]
        rows = existing + [(dataset_uri, ts_column, _SEP.join(columns), granularity)]
        self._overwrite(
            self.spark.createDataFrame(rows, _DATASETS_FLAT_SCHEMA), "datasets"
        )

    def _unflatten(self, row) -> dict:
        d = row.asDict()
        joined = d.pop("columns_joined")
        d["columns"] = joined.split(_SEP) if joined else []
        return d

    def get_dataset(self, dataset_uri: str) -> dict | None:
        rows = (
            self._read("datasets", _DATASETS_FLAT_SCHEMA)
            .where(F.col("dataset_uri") == dataset_uri)
            .collect()
        )
        return self._unflatten(rows[0]) if rows else None

    def get_datasets(self) -> list[dict]:
        return [
            self._unflatten(r)
            for r in self._read("datasets", _DATASETS_FLAT_SCHEMA)
            .orderBy("dataset_uri")
            .collect()
        ]

    # -- profiling metrics ---------------------------------------------------

    def add_profiling(
        self, dataset_uri: str, metrics_df: DataFrame, granularity: str = "DAY"
    ) -> None:
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
        self._merged_upsert("metrics", _METRICS_SCHEMA, new, dataset_uri)

    def select_profiling(self, dataset_uri: str, start_ts=None, end_ts=None) -> DataFrame:
        df = self._read("metrics", _METRICS_SCHEMA).where(
            F.col("dataset_uri") == dataset_uri
        )
        if start_ts is not None:
            df = df.where(F.col("ts") >= F.lit(start_ts))
        if end_ts is not None:
            df = df.where(F.col("ts") <= F.lit(end_ts))
        return df.orderBy("ts")

    def get_profiling(self, dataset_uri: str, ts) -> DataFrame:
        return self._read("metrics", _METRICS_SCHEMA).where(
            (F.col("dataset_uri") == dataset_uri) & (F.col("ts") == F.lit(ts))
        )

    # -- optimizations -------------------------------------------------------

    def add_optimization(
        self, dataset_uri: str, optimization_df: DataFrame, confidence: float
    ) -> None:
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
        existing = self._read("optimizations", _OPT_SCHEMA).where(
            F.col("dataset_uri") != dataset_uri
        )
        self._overwrite(existing.select(*new.columns).unionByName(new), "optimizations")

    def get_optimization(self, dataset_uri: str) -> DataFrame:
        return self._read("optimizations", _OPT_SCHEMA).where(
            F.col("dataset_uri") == dataset_uri
        )

    # -- scorings ------------------------------------------------------------

    def add_scoring(self, dataset_uri: str, scoring_df: DataFrame) -> None:
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
        self._merged_upsert("scorings", _SCORING_SCHEMA, new, dataset_uri)

    def get_scoring(self, dataset_uri: str, ts) -> DataFrame:
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
