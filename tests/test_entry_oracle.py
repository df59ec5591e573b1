"""Replicates the driver's correctness gate locally: run every
``queries()`` entry through Spark AND its ``oracle_sql()`` through DuckDB
on the same sf dir, then compare row count, column names, and
order-insensitive values."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry

SF_DIR = os.environ.get("THOTH_ORACLE_SF_DIR", "/root/testdata/sf0.001")

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 5)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    try:  # Decimal → float
        import decimal

        if isinstance(v, decimal.Decimal):
            return round(float(v), 5)
    except Exception:
        pass
    return v


def _normalize(rows, cols):
    return sorted(
        tuple(str(_norm_cell(v)) for v in row) for row in rows
    ), sorted(cols)


ORACLE_QUERIES = sorted(set(entry.queries()) & set(entry.oracle_sql()))
ROWS_ONLY_QUERIES = sorted(set(entry.queries()) - set(entry.oracle_sql()))


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, duck, name):
    q = entry.queries()[name]
    sdf = q(spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck.sql(entry.oracle_sql()[name])
    duck_cols = res.columns
    duck_rows = res.fetchall()

    s_rows, s_cols = _normalize(spark_rows, spark_cols)
    d_rows, d_cols = _normalize(duck_rows, duck_cols)
    assert s_cols == d_cols, f"{name}: column mismatch {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    )
    mismatches = [
        (a, b) for a, b in zip(s_rows, d_rows) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches: {mismatches[:5]}"


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_query_runs(spark, name):
    df = entry.queries()[name](spark, SF_DIR)
    assert df.count() >= 0


def test_entry_smoke(spark):
    df = entry.entry(spark)
    assert df.count() > 0


def test_bench_contract():
    """bench.py must expose the driver-contract HEADLINE list and emit the
    expected JSON keys (run cheaply by monkeypatching the sf dir)."""
    import bench

    assert set(bench.HEADLINE) <= set(entry.queries())
