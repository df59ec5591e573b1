"""Corpus sinks: sharded training-data writes and JSONL interchange.

``write_training_shards`` is the terminal step of the curation pipeline —
it materializes :func:`thoth_spark.operators.curation.training_order`'s
deterministic global shuffle as exactly ``n_shards`` files, one per
shard, each internally ordered by ``shard_pos``. Because shard assignment
and order are content-hash-derived, the written corpus is bit-stable
across reruns, retries, and cluster layouts — re-running the pipeline
after a speculative task retry produces byte-identical shards, which is
the property that makes a training corpus auditable.

Scale: one hash-partition exchange (every shard's rows land in exactly
one task, so each shard directory gets exactly one file), with the
within-shard sort riding the shuffle. At 100 TB pick ``n_shards`` so a
shard is a few GB (e.g. 30k shards), which also sets write parallelism.

JSONL is the lingua franca of LLM corpora; the readers/writers here are
thin wrappers that pin a schema on read (schema inference is a full
extra pass at scale) and write compressed line-delimited JSON.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from thoth_spark.operators.curation import training_order


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int = 8,
    id_col: str = "doc_id",
    seed: int = 42,
    fmt: str = "parquet",
) -> None:
    """Write ``df`` as ``n_shards`` deterministic training shards under
    ``path`` (directories ``shard=0..n_shards-1``, one file each, rows
    ordered by the content-derived ``shard_pos``)."""
    ordered = training_order(df, id_col=id_col, n_shards=n_shards, seed=seed)
    (
        ordered.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "shard_pos")
        .write.partitionBy("shard")
        .format(fmt)
        .mode("overwrite")
        .save(path)
    )


def read_training_shards(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """Read shards written by :func:`write_training_shards`; ``shard`` is
    recovered from the partition directories."""
    return spark.read.format(fmt).load(path)


def write_jsonl(df: DataFrame, path: str, compression: str | None = "gzip") -> None:
    """Write line-delimited JSON (one document per line), gzip by default
    — splittable formats (parquet) are preferred inside the pipeline;
    JSONL is for interchange with tokenizer/training tooling."""
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def read_jsonl(spark: SparkSession, path: str, schema: StructType | str) -> DataFrame:
    """Read JSONL with an explicit schema — never inferred: inference is
    a second full scan at corpus scale and can silently widen types."""
    return spark.read.schema(schema).json(path)


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    cluster_by: list[str] | None = None,
    mode: str = "error",
) -> dict:
    """Rewrite a parquet directory into ~``target_file_bytes`` files —
    the small-files compaction every long-running ingestion pipeline
    needs (a 100 TB table accreted from streaming micro-batches or
    per-hour jobs ends up as millions of KB-sized files; open/seek
    overhead then dominates scans and crushes the driver's file index).

    With ``cluster_by`` the rewrite also range-partitions and sorts by
    those columns, so each output file covers a narrow key range —
    parquet min/max statistics then let later filtered scans skip whole
    files (the poor man's Z-ordering, exactly how Delta/Iceberg OPTIMIZE
    implements single-dimension clustering).

    File count = ceil(input bytes / target); sizing uses the source's
    listed file sizes (works for any Hadoop-visible FS via the JVM
    FileSystem API). Returns {files_before, files_after, bytes}.
    """
    import math

    df = spark.read.parquet(src)
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(src)
    fs = path.getFileSystem(conf)
    summary = fs.getContentSummary(path)
    total = summary.getLength()
    files_before = len(df.inputFiles())
    n = max(1, math.ceil(total / target_file_bytes))
    if cluster_by:
        out = df.repartitionByRange(n, *[F.col(c) for c in cluster_by]).sortWithinPartitions(
            *cluster_by
        )
    else:
        out = df.repartition(n)
    out.write.mode(mode).parquet(dst)
    files_after = len(spark.read.parquet(dst).inputFiles())
    return {"files_before": files_before, "files_after": files_after, "bytes": total}
