"""Driver-mimicking oracle audit: for every ``queries()`` entry with an
``oracle_sql()`` counterpart, run Spark and DuckDB at the given sf dir and
compare the *pandas dtypes* (the driver hashes values after an Arrow
round-trip, so a DuckDB HUGEINT → float64 vs Spark bigint → int64 flips
the hash even when every cell is equal) plus sorted cell values.

Usage: python tools/audit_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def dtype_class(series) -> str:
    s = str(series.dtype)
    if s.startswith(("int", "uint", "Int", "UInt")):
        return "int"
    if s.startswith(("float", "Float")) or s.startswith("double"):
        return "float"
    if "datetime" in s:
        return "ts"
    if s in ("bool", "boolean"):
        return "bool"
    # Spark toPandas() yields object columns of datetime.date for DATE
    # columns; the driver normalizes temporal values before hashing, so
    # classify by content.
    import datetime

    for v in series:
        if v is None:
            continue
        if isinstance(v, (datetime.date, datetime.datetime)):
            return "ts"
        break
    return "obj"


def norm_frame(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), key=lambda s: s.astype(str))
    return df.reset_index(drop=True)


def cells_equal(a, b) -> bool:
    import datetime

    if isinstance(a, (datetime.date, datetime.datetime, pd.Timestamp)) or isinstance(
        b, (datetime.date, datetime.datetime, pd.Timestamp)
    ):
        try:
            return pd.Timestamp(a) == pd.Timestamp(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if np.isnan(fa) and np.isnan(fb):
            return True
        return abs(fa - fb) <= 1e-6 * max(1.0, abs(fa), abs(fb))
    if isinstance(a, (list, np.ndarray)) or isinstance(b, (list, np.ndarray)):
        la, lb = list(a), list(b)
        return len(la) == len(lb) and all(cells_equal(x, y) for x, y in zip(la, lb))
    return str(a) == str(b)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from thoth_spark.session import get_spark

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        if name not in oracles:
            print(f"SKIP  {name} (rows-only)")
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
            ddf = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"ERR   {name}: {type(e).__name__}: {e}")
            continue
        problems = []
        if sorted(sdf.columns) != sorted(ddf.columns):
            problems.append(f"cols spark={sorted(sdf.columns)} duck={sorted(ddf.columns)}")
        else:
            s, d = norm_frame(sdf), norm_frame(ddf)
            for c in s.columns:
                sc, dc = dtype_class(s[c]), dtype_class(d[c])
                if sc != dc:
                    problems.append(f"dtype[{c}] spark={s[c].dtype}({sc}) duck={d[c].dtype}({dc})")
            if len(s) != len(d):
                problems.append(f"rows {len(s)} vs {len(d)}")
            elif not problems:
                bad = 0
                for c in s.columns:
                    for i in range(len(s)):
                        if not cells_equal(s[c].iloc[i], d[c].iloc[i]):
                            bad += 1
                            if bad <= 3:
                                problems.append(
                                    f"cell[{c}][{i}] spark={s[c].iloc[i]!r} duck={d[c].iloc[i]!r}"
                                )
                if bad > 3:
                    problems.append(f"...{bad} mismatched cells total")
        if problems:
            failures.append(name)
            print(f"FAIL  {name}")
            for p in problems[:6]:
                print(f"      {p}")
        else:
            print(f"OK    {name} ({len(sdf)} rows)")
    print(f"\n{len(failures)} failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
