"""Loader dtype robustness: the driver's testdata has stored ``events.ts``
as int64 nanoseconds (rounds 1-2) AND as native timestamp[us] (round 3+),
and assuming either one broke a round. ``load_table`` must read both
encodings to the identical TIMESTAMP column — asserted here on
synthesized parquet files of each flavor containing the same instants."""

import datetime
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql.types import TimestampType

from thoth_spark.sources import load_events_stream, load_table

INSTANTS = [
    datetime.datetime(2024, 1, 1, 0, 0, 0),
    datetime.datetime(2024, 1, 2, 12, 34, 56, 789012),
    datetime.datetime(2024, 3, 15, 23, 59, 59, 999999),
]


def _write_events(tmp_path, name, ts_array):
    d = os.path.join(str(tmp_path), name)
    os.makedirs(d, exist_ok=True)
    table = pa.table(
        {
            "event_id": pa.array(range(len(INSTANTS)), pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([1] * len(INSTANTS), pa.int64()),
            "event_type": pa.array(["a", "b", "c"]),
            "value": pa.array([1.0, 2.0, 3.0]),
            "props": pa.array(["{}"] * len(INSTANTS)),
        }
    )
    pq.write_table(table, os.path.join(d, "events.parquet"))
    return d


@pytest.fixture(scope="module")
def micro_dir(tmp_path_factory):
    ts = pa.array(INSTANTS, pa.timestamp("us"))
    return _write_events(tmp_path_factory.mktemp("srcs"), "micro", ts)


@pytest.fixture(scope="module")
def nano_dir(tmp_path_factory):
    ts = pa.array(INSTANTS, pa.timestamp("ns"))
    return _write_events(tmp_path_factory.mktemp("srcs"), "nano", ts)


def test_load_table_reads_native_microsecond_ts(spark, micro_dir):
    df = load_table(spark, micro_dir, "events")
    assert isinstance(df.schema["ts"].dataType, TimestampType)
    got = sorted(r["ts"] for r in df.select("ts").collect())
    assert got == INSTANTS


def test_load_table_reads_legacy_nanosecond_ts(spark, nano_dir):
    df = load_table(spark, nano_dir, "events")
    assert isinstance(df.schema["ts"].dataType, TimestampType)
    got = sorted(r["ts"] for r in df.select("ts").collect())
    assert got == INSTANTS


def test_both_encodings_load_identically(spark, micro_dir, nano_dir):
    a = load_table(spark, micro_dir, "events")
    b = load_table(spark, nano_dir, "events")
    assert a.schema == b.schema
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_events_stream_matches_batch_load(spark, micro_dir):
    import uuid

    stream = load_events_stream(spark, micro_dir)
    assert isinstance(stream.schema["ts"].dataType, TimestampType)
    name = f"src_{uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = sorted(r["ts"] for r in spark.table(name).select("ts").collect())
    assert got == INSTANTS


def test_stream_load_leaves_session_conf_unchanged(spark, micro_dir, nano_dir):
    """Round-5 fix: the legacy-nanosecond stream path must not leak
    ``nanosAsLong`` into the caller's session conf (it previously set it
    session-wide, silently changing later batch reads of other nano
    parquet). Both encodings must leave the conf exactly as found."""
    key = "spark.sql.legacy.parquet.nanosAsLong"
    before = spark.conf.get(key, "false")
    load_events_stream(spark, micro_dir)
    assert spark.conf.get(key, "false") == before
    load_events_stream(spark, nano_dir)
    assert spark.conf.get(key, "false") == before


def test_events_stream_legacy_nano_matches_batch(spark, nano_dir):
    """The nano-encoded stream runs on a cloned session with the conf
    scoped to it; values must match the batch loader bit-for-bit. The
    memory sink registers in the stream's own session catalog."""
    import uuid

    stream = load_events_stream(spark, nano_dir)
    assert isinstance(stream.schema["ts"].dataType, TimestampType)
    name = f"src_{uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = sorted(
        r["ts"] for r in stream.sparkSession.table(name).select("ts").collect()
    )
    assert got == INSTANTS


def test_load_table_missing_file_raises_not_masked(spark, tmp_path):
    """A missing file must propagate, not be retried as the nano case."""
    with pytest.raises(Exception) as ei:
        load_table(spark, str(tmp_path), "events")
    assert "nanosAsLong" not in str(ei.value)
