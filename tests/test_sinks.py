"""Sink tests: deterministic training shards and JSONL roundtrip."""

from pyspark.sql import functions as F

from thoth_spark import sinks
from thoth_spark.operators.curation import training_order


def test_write_training_shards_layout_and_order(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(100)], "doc_id long, text string"
    )
    out = str(tmp_path / "shards")
    sinks.write_training_shards(df, out, n_shards=4)

    # exactly one data file per shard directory
    import glob
    import os

    for s in range(4):
        files = [
            f
            for f in glob.glob(os.path.join(out, f"shard={s}", "*"))
            if not os.path.basename(f).startswith(("_", "."))
        ]
        assert len(files) == 1, f"shard {s}: {files}"

    back = sinks.read_training_shards(spark, out)
    assert back.count() == 100
    # shard and order match the operator's deterministic assignment
    expect = {
        (r["doc_id"], r["shard"], r["shard_pos"])
        for r in training_order(df, n_shards=4).collect()
    }
    got = {
        (r["doc_id"], int(r["shard"]), r["shard_pos"]) for r in back.collect()
    }
    assert got == expect
    # within each shard file, physical row order == shard_pos order
    one = spark.read.parquet(os.path.join(out, "shard=0"))
    rows = one.select("shard_pos").collect()
    assert [r["shard_pos"] for r in rows] == sorted(r["shard_pos"] for r in rows)


def test_write_training_shards_rerun_is_identical(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(50)], "doc_id long, text string"
    )
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    sinks.write_training_shards(df.repartition(7), a, n_shards=3)
    sinks.write_training_shards(df.repartition(2), b, n_shards=3)
    ra = sorted(
        (r["doc_id"], int(r["shard"]), r["shard_pos"])
        for r in sinks.read_training_shards(spark, a).collect()
    )
    rb = sorted(
        (r["doc_id"], int(r["shard"]), r["shard_pos"])
        for r in sinks.read_training_shards(spark, b).collect()
    )
    assert ra == rb  # layout-independent: same shards from any input partitioning


def test_jsonl_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "hello", 0.5), (2, 'quote " and \\ backslash', -1.25)],
        "doc_id long, text string, score double",
    )
    p = str(tmp_path / "docs.jsonl")
    sinks.write_jsonl(df, p)
    back = sinks.read_jsonl(spark, p, "doc_id long, text string, score double")
    assert sorted(back.collect()) == sorted(df.collect())


def test_compact_parquet_reduces_files_and_preserves_rows(spark, tmp_path):
    from thoth_spark.sinks import compact_parquet

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    df = spark.range(0, 20_000).withColumn("k", F.col("id") % 100)
    df.repartition(64).write.parquet(src)  # 64 tiny files
    stats = compact_parquet(spark, src, dst, target_file_bytes=10 * 1024 * 1024)
    assert stats["files_before"] == 64
    assert stats["files_after"] < 8
    out = spark.read.parquet(dst)
    assert out.count() == 20_000
    assert out.agg(F.sum("id")).collect()[0][0] == sum(range(20_000))


def test_compact_parquet_clustering_gives_disjoint_file_ranges(spark, tmp_path):
    """cluster_by must produce (near-)disjoint per-file key ranges so
    parquet min/max stats can prune whole files on later filtered
    scans."""
    import pyarrow.parquet as pq

    from thoth_spark.sinks import compact_parquet

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    spark.range(0, 30_000).withColumn("k", (F.col("id") * 7919) % 1000).repartition(
        32
    ).write.parquet(src)
    compact_parquet(
        spark, src, dst, target_file_bytes=60 * 1024, cluster_by=["k"]
    )
    import glob

    ranges = []
    for f in glob.glob(dst + "/*.parquet"):
        md = pq.read_metadata(f)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(1)  # k
            st = col.statistics
            mins.append(st.min); maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    assert len(ranges) >= 3
    ranges.sort()
    # ranges must not nest/overlap beyond the single boundary value a
    # range partitioner may share between adjacent partitions
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2 + 1, (ranges,)


def test_manifest_roundtrip_and_tamper_detection(spark, tmp_path):
    """write_manifest → verify_manifest passes; altering a data file is
    detected and named."""
    from thoth_spark.sinks import verify_manifest, write_manifest

    d = str(tmp_path / "release")
    spark.range(0, 5000).withColumn("k", F.col("id") % 7).repartition(4).write.parquet(d)
    m = write_manifest(spark, d)
    assert m["n_files"] == 4 and m["total_rows"] == 5000
    ok, problems = verify_manifest(spark, d)
    assert ok and problems == []

    # tamper: truncate one data file
    import glob, os

    victim = sorted(glob.glob(d + "/*.parquet"))[0]
    data = open(victim, "rb").read()
    open(victim, "wb").write(data[: len(data) - 1])
    # drop the local-FS checksum sidecar (object stores have none); the
    # manifest, not Hadoop's transport CRC, is the integrity layer under test
    crc = os.path.join(os.path.dirname(victim), f".{os.path.basename(victim)}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    ok2, problems2 = verify_manifest(spark, d)
    assert not ok2
    assert any(os.path.basename(victim) in p for p in problems2)


def test_manifest_bit_stable_for_deterministic_shards(spark, tmp_path):
    """The deterministic shard writer must produce the SAME manifest
    (hashes included) on a rerun — the auditability property the
    training-order pipeline promises."""
    from thoth_spark.sinks import write_manifest, write_training_shards

    docs = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"), F.md5(F.col("id").cast("string")).alias("text")
    )
    d1, d2 = str(tmp_path / "r1"), str(tmp_path / "r2")
    write_training_shards(docs, d1, n_shards=4)
    write_training_shards(docs, d2, n_shards=4)
    m1 = write_manifest(spark, d1)
    m2 = write_manifest(spark, d2)
    strip = lambda m: [
        {k: e[k] for k in ("bytes", "sha256", "rows")} for e in m["files"]
    ]
    assert strip(m1) == strip(m2)
