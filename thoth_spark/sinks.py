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
