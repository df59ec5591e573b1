"""Self-tests for the public DataFrame-equality helper
(``thoth_spark/testing.py``) — the rebuild's version of the reference's
``tests/unit/thoth/test_testing/test_dataframe.py``: equality across
declaration formats and row order, value-diff detection, shape-mismatch
detection, and the from-collection constructor; plus the net-new float
tolerance and driver-collect guard."""

import pytest
from pyspark.sql import functions as F

from thoth_spark.testing import assert_dataframe_equality, create_df_from_collection


def test_equality_across_formats_and_order(spark):
    """Same data declared in different formats / orders compares equal
    (the reference's happy-path case: epoch-millis vs ISO timestamps,
    int-vs-string booleans)."""
    df1 = spark.createDataFrame(
        [(1582911000000, "1", 1234.0), (1577923200000, "0", 123.0)],
        "ts long, flag string, value double",
    ).select(
        F.from_unixtime(F.col("ts") / 1000.0).cast("timestamp").alias("ts"),
        F.col("flag").cast("boolean").alias("flag"),
        "value",
    )
    df2 = spark.createDataFrame(
        [
            ("2020-01-02 00:00:00", "false", 123.0),
            ("2020-02-28 17:30:00", "true", 1234.0),
        ],
        "ts string, flag string, value double",
    ).select(
        F.col("ts").cast("timestamp").alias("ts"),
        F.col("flag").cast("boolean").alias("flag"),
        "value",
    )
    assert_dataframe_equality(df1, df2)
    # column order must not matter (name-matched, unlike the reference)
    assert_dataframe_equality(df1.select("value", "ts", "flag"), df2)


def test_different_values_raise(spark):
    df1 = spark.createDataFrame([("abc",), ("cba",)], "value string")
    df2 = spark.createDataFrame([("abc",), ("different value",)], "value string")
    with pytest.raises(AssertionError, match="DataFrames have different values:"):
        assert_dataframe_equality(df1, df2)


def test_different_shapes_raise(spark):
    df1 = spark.createDataFrame([("abc",), ("cba",), ("cba",)], "value string")
    df2 = spark.createDataFrame([("abc",), ("cba",)], "value string")
    with pytest.raises(AssertionError, match="DataFrame shape mismatch:"):
        assert_dataframe_equality(df1, df2)
    with pytest.raises(AssertionError, match="DataFrame shape mismatch:"):
        assert_dataframe_equality(
            df1.withColumnRenamed("value", "other"), df1
        )


def test_float_tolerance_and_nested_containers(spark):
    """float_tol quantizes doubles recursively — array columns (the
    embedding shape) and struct columns compare within tolerance, and
    tol=0 keeps bit-exact semantics."""
    a = spark.createDataFrame(
        [(1, [0.1000004, 0.2], {"m": 3.0000001})],
        "id int, emb array<double>, s map<string,double>",
    )
    b = spark.createDataFrame(
        [(1, [0.1, 0.2000004], {"m": 3.0})],
        "id int, emb array<double>, s map<string,double>",
    )
    assert_dataframe_equality(a, b, float_tol=1e-5)
    with pytest.raises(AssertionError, match="different values"):
        assert_dataframe_equality(a, b)  # exact mode still catches it


def test_float_tolerance_grid_boundary_straddle(spark):
    """r12 advice: values differing by far less than float_tol but
    straddling a quantization-grid boundary (0.100004999 vs
    0.100005001 at tol=1e-5 quantize to adjacent cells) must still
    compare EQUAL — equality is pairwise isclose on raw values, the
    grid is only the pairing sort key. Differences beyond the
    tolerance must still raise."""
    a = spark.createDataFrame([(1, 0.100004999)], "id int, v double")
    b = spark.createDataFrame([(1, 0.100005001)], "id int, v double")
    assert_dataframe_equality(a, b, float_tol=1e-5)
    c = spark.createDataFrame([(1, 0.100025)], "id int, v double")
    with pytest.raises(AssertionError, match="different values"):
        assert_dataframe_equality(a, c, float_tol=1e-5)
    # NaN still only equals NaN under the tolerant comparator
    n = spark.createDataFrame([(1, float("nan"))], "id int, v double")
    assert_dataframe_equality(n, n, float_tol=1e-5)
    with pytest.raises(AssertionError, match="different values"):
        assert_dataframe_equality(a, n, float_tol=1e-5)


def test_collect_guard(spark):
    big = spark.range(100)
    with pytest.raises(AssertionError, match="max_rows"):
        assert_dataframe_equality(big, big, max_rows=10)


def test_create_df_from_collection(spark):
    out = create_df_from_collection(
        [{"a": 123, "b": "abc"}, {"a": 4, "b": "d"}], spark
    )
    target = spark.createDataFrame([(123, "abc"), (4, "d")], "a long, b string")
    assert_dataframe_equality(out, target)
