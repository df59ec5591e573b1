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


def write_manifest(spark: SparkSession, data_dir: str, fmt: str = "parquet") -> dict:
    """Write an audit manifest (`_MANIFEST.json`) for a dataset
    directory: per-file byte length, sha256, and row count, plus
    dataset totals.

    Training-corpus releases need exactly this: a consumer can prove
    the copy they downloaded is the corpus that was audited
    (:func:`verify_manifest`), and a re-run of a deterministic pipeline
    can be checked bit-for-bit against the previous release. Hashing is
    distributed — the `binaryFile` source reads each data file in one
    task (shard-sized files by construction: see `compact_parquet` /
    `write_training_shards`) and `sha2` runs JVM-side; row counts come
    from one metadata-cheap aggregation keyed by `input_file_name`.
    The manifest itself is a driver-side write of #files entries."""
    import json as _json
    import posixpath

    ext = "parquet" if fmt == "parquet" else fmt
    binaries = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", f"*.{ext}")
        .load(data_dir)
        .select(
            F.col("path"),
            F.col("length"),
            F.sha2(F.col("content"), 256).alias("sha256"),
        )
    )
    data = spark.read.format(fmt).load(data_dir)
    counts = data.groupBy(F.input_file_name().alias("path")).agg(
        F.count(F.lit(1)).alias("rows")
    )
    # key files by their path RELATIVE to data_dir, not the basename:
    # partitioned layouts (shard=0/part-00000...) reuse basenames across
    # subdirectories, and a basename join would cross files
    anchor = data_dir.rstrip("/") + "/"
    norm = lambda c: F.substring_index(c, anchor, -1)
    joined = (
        binaries.withColumn("file", norm(F.col("path")))
        .drop("path")
        .join(counts.withColumn("file", norm(F.col("path"))).drop("path"), "file")
        .orderBy("file")
    )
    entries = [
        {"file": r["file"], "bytes": r["length"], "sha256": r["sha256"], "rows": r["rows"]}
        for r in joined.collect()
    ]
    manifest = {
        "format": fmt,
        "n_files": len(entries),
        "total_rows": sum(e["rows"] for e in entries),
        "total_bytes": sum(e["bytes"] for e in entries),
        "files": entries,
    }
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    mpath = jvm.org.apache.hadoop.fs.Path(posixpath.join(data_dir, "_MANIFEST.json"))
    fs = mpath.getFileSystem(conf)
    out = fs.create(mpath, True)
    out.write(bytearray(_json.dumps(manifest, indent=1).encode()))
    out.close()
    return manifest


def verify_manifest(spark: SparkSession, data_dir: str) -> tuple[bool, list[str]]:
    """Recompute the directory's per-file hashes/counts and compare with
    `_MANIFEST.json`. Returns (ok, problems) — problems name each
    missing/extra/altered file."""
    import json as _json
    import posixpath

    # `_`-prefixed names are invisible to Spark data sources (which is
    # exactly why the manifest doesn't pollute reads of the data dir) —
    # read it back through the Hadoop FS API instead.
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    mpath = jvm.org.apache.hadoop.fs.Path(posixpath.join(data_dir, "_MANIFEST.json"))
    fs = mpath.getFileSystem(conf)
    stream = fs.open(mpath)
    sink = jvm.java.io.ByteArrayOutputStream()
    try:
        jvm.org.apache.hadoop.io.IOUtils.copyBytes(stream, sink, conf, False)
        raw = bytes(sink.toByteArray()).decode()
    finally:
        stream.close()
    recorded = _json.loads(raw)
    # recompute with the same distributed scan write_manifest uses,
    # without rewriting the manifest file
    ext = "parquet" if recorded["format"] == "parquet" else recorded["format"]
    # key files by their path RELATIVE to data_dir, not the basename:
    # partitioned layouts (shard=0/part-00000...) reuse basenames across
    # subdirectories, and a basename join would cross files
    anchor = data_dir.rstrip("/") + "/"
    norm = lambda c: F.substring_index(c, anchor, -1)
    binaries = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", f"*.{ext}")
        .load(data_dir)
        .select(
            norm(F.col("path")).alias("file"),
            F.col("length"),
            F.sha2(F.col("content"), 256).alias("sha256"),
        )
    )
    got = {r["file"]: (r["length"], r["sha256"]) for r in binaries.collect()}
    want = {e["file"]: (e["bytes"], e["sha256"]) for e in recorded["files"]}
    problems = []
    for f in sorted(set(want) - set(got)):
        problems.append(f"missing: {f}")
    for f in sorted(set(got) - set(want)):
        problems.append(f"extra: {f}")
    altered = {f for f in sorted(set(want) & set(got)) if want[f] != got[f]}
    problems += [f"altered: {f}" for f in sorted(altered)]
    # row counts only when every byte hash checks out — a corrupted file
    # may not even be parseable, and the hash already proves alteration
    if not problems:
        counts = (
            spark.read.format(recorded["format"])
            .load(data_dir)
            .groupBy(norm(F.input_file_name()).alias("file"))
            .agg(F.count(F.lit(1)).alias("rows"))
        )
        rows = {r["file"]: r["rows"] for r in counts.collect()}
        want_rows = {e["file"]: e["rows"] for e in recorded["files"]}
        problems += [
            f"row-count mismatch: {f}"
            for f in sorted(want_rows)
            if rows.get(f) != want_rows[f]
        ]
    return (not problems, problems)
