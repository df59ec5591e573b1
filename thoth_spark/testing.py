"""Public DataFrame test helpers for downstream users.

The reference ships ``thoth.testing.dataframe``
(``/root/reference/thoth/testing/dataframe.py:11-40``: count + column
width + sorted-collect compare, self-tested in
``tests/unit/thoth/test_testing/``); this is the Spark-first
re-expression with the sharp edges filed off:

- columns are matched BY NAME (the reference selects the output frame's
  field names from both sides, so mismatched names crash with an opaque
  analysis error instead of a diff);
- floats compare within ``float_tol`` (recursively through arrays,
  maps, and structs — embedding columns and profiler metric values are
  doubles, where bit-equality across plans is the wrong default);
- both frames are collected, so the helper guards with ``max_rows``
  and tells you to aggregate first instead of OOMing the driver — it is
  a TEST helper, not a distributed diff (for corpus-scale comparison
  use ``curation.corpus_diff``).
"""

from __future__ import annotations

import math
from typing import Any

from pyspark.sql import DataFrame, SparkSession


def _comparable(value: Any, float_tol: float) -> Any:
    """Rounded/canonical form of one value, used only as the SORT KEY
    for row pairing: floats quantize to the tolerance grid (tol=0 keeps
    them exact), and containers recurse so array<double>/struct/map
    columns sort the same way scalars do. Equality itself is decided by
    :func:`_close` on the raw values — grid quantization alone would
    call two values unequal that differ by far less than ``float_tol``
    but straddle a grid boundary (r12 advice)."""
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        return value if float_tol <= 0 else round(value / float_tol) * float_tol
    if isinstance(value, dict):
        return {k: _comparable(v, float_tol) for k, v in sorted(value.items())}
    if isinstance(value, (list, tuple)):
        return [_comparable(v, float_tol) for v in value]
    return value


def _close(a: Any, b: Any, float_tol: float) -> bool:
    """Tolerance-aware recursive equality on RAW collected values:
    numerics compare with ``math.isclose(abs_tol=float_tol)`` (NaN only
    equals NaN), containers recurse, everything else is ``==``."""
    a_num, b_num = isinstance(a, (int, float)), isinstance(b, (int, float))
    if a_num and b_num:
        a_nan = isinstance(a, float) and math.isnan(a)
        b_nan = isinstance(b, float) and math.isnan(b)
        if a_nan or b_nan:
            return a_nan and b_nan
        if float_tol <= 0:
            return a == b
        return math.isclose(a, b, rel_tol=0.0, abs_tol=float_tol)
    if isinstance(a, dict) and isinstance(b, dict):
        return set(a) == set(b) and all(_close(a[k], b[k], float_tol) for k in a)
    if isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)):
        return len(a) == len(b) and all(
            _close(x, y, float_tol) for x, y in zip(a, b)
        )
    return a == b


def assert_dataframe_equality(
    output_df: DataFrame,
    target_df: DataFrame,
    float_tol: float = 0.0,
    max_rows: int = 100_000,
) -> None:
    """Assert two DataFrames hold the same rows, order- and
    column-order-insensitively — the reference's
    ``assert_dataframe_equality`` contract (shape first, then sorted
    values), with name-based column matching and optional float
    tolerance. Raises ``AssertionError`` with the reference's message
    prefixes (``DataFrame shape mismatch:`` / ``DataFrames have
    different values:``) so ported test suites keep their
    ``pytest.raises(match=...)`` guards."""
    out_cols, tgt_cols = sorted(output_df.columns), sorted(target_df.columns)
    out_n, tgt_n = output_df.count(), target_df.count()
    if out_n != tgt_n or out_cols != tgt_cols:
        raise AssertionError(
            "DataFrame shape mismatch: \n"
            f"output_df shape: {len(out_cols)} columns {out_cols} and "
            f"{out_n} rows\n"
            f"target_df shape: {len(tgt_cols)} columns {tgt_cols} and "
            f"{tgt_n} rows."
        )
    if out_n > max_rows:
        raise AssertionError(
            f"assert_dataframe_equality collects both frames to the "
            f"driver; {out_n} rows exceeds max_rows={max_rows} — "
            "aggregate or sample before comparing (or raise max_rows "
            "deliberately)."
        )

    def rows_of(df: DataFrame) -> list:
        data = [r.asDict(recursive=True) for r in df.select(*out_cols).collect()]
        # sort raw rows by their grid-quantized key; compare with
        # _close so near-equal values straddling a grid cell still pair
        return sorted(
            data,
            key=lambda d: repr(sorted(_comparable(d, float_tol).items())),
        )

    output_data, target_data = rows_of(output_df), rows_of(target_df)
    if not all(
        _close(o, t, float_tol) for o, t in zip(output_data, target_data)
    ):
        diff = [
            (o, t)
            for o, t in zip(output_data, target_data)
            if not _close(o, t, float_tol)
        ][:10]
        raise AssertionError(
            "DataFrames have different values:\n"
            f"first differing sorted rows (output, target): {diff}\n"
            f"output_df records: {output_data[:50]}\n"
            f"target_df records: {target_data[:50]}."
        )


def create_df_from_collection(
    data: list[dict],
    spark: SparkSession,
    schema=None,
) -> DataFrame:
    """DataFrame from a list of plain dicts — the reference's
    ``create_df_from_collection`` (it round-trips through a JSON RDD;
    ``createDataFrame`` handles dict rows natively now, same inference,
    no RDD detour)."""
    return spark.createDataFrame(data, schema=schema)
