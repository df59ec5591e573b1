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
