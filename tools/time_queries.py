"""Median-of-3 standalone timing for named headline queries.

Usage: python tools/time_queries.py <query> [query ...]

Same methodology as bench.py (sf0.001 warm-up pass, noop sink, cache
clear between runs, median of 3) so numbers are comparable to the
committed quiet bench artifact.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from thoth_spark.session import get_spark  # noqa: E402
from thoth_spark import entry_queries  # noqa: E402


def _run(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="thoth-spark-timing")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        try:
            _run(entry_queries.QUERIES[name](spark, "/root/testdata/sf0.001"))
        except Exception:
            pass
    for name in names:
        runs = []
        for _ in range(3):
            spark.catalog.clearCache()
            try:
                spark._jvm.System.gc()
            except Exception:
                pass
            t0 = time.perf_counter()
            _run(entry_queries.QUERIES[name](spark, sf_dir))
            runs.append(time.perf_counter() - t0)
        print(f"{name}: median {statistics.median(runs):.2f}s  runs {[round(r,2) for r in runs]}")


if __name__ == "__main__":
    main()
