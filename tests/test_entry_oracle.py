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


def _type_lattice(type_name):
    """Collapse an engine type name to a small lattice so the local gate
    catches oracle/Spark TYPE misalignment (the driver hashes typed values,
    so e.g. DuckDB HUGEINT vs Spark BIGINT is a red row there even when the
    stringified values agree — the round-5 chi2_drift_events defect)."""
    t = str(type_name).lower()
    if "struct" in t or "row" in t:
        return "struct"
    if "array" in t or "list" in t or t.endswith("[]"):
        return "array"
    if "map" in t:
        return "map"
    if "timestamp" in t or "datetime" in t:
        return "timestamp"
    if "date" in t:
        return "date"
    if "bool" in t:
        return "bool"
    if "hugeint" in t:
        # DuckDB's uncast sum() type; the driver's typed hash does NOT
        # treat it as BIGINT, so neither do we (the r5 chi2 defect).
        return "hugeint"
    if any(k in t for k in ("bigint", "int", "long", "short", "byte")):
        return "int"
    if any(k in t for k in ("double", "float", "real", "decimal", "numeric")):
        return "float"
    if any(k in t for k in ("char", "string", "text", "utf8")):
        return "string"
    if "binary" in t or "blob" in t or "bytea" in t:
        return "binary"
    return t


def _typed_cols(cols, types):
    return sorted(zip(cols, (_type_lattice(t) for t in types)))


ORACLE_QUERIES = sorted(set(entry.queries()) & set(entry.oracle_sql()))
ROWS_ONLY_QUERIES = sorted(set(entry.queries()) - set(entry.oracle_sql()))


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, duck, name):
    q = entry.queries()[name]
    sdf = q(spark, SF_DIR)
    spark_cols = sdf.columns
    spark_types = [f.dataType.simpleString() for f in sdf.schema.fields]
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck.sql(entry.oracle_sql()[name])
    duck_cols = res.columns
    duck_types = res.types
    duck_rows = res.fetchall()

    s_rows, s_cols = _normalize(spark_rows, spark_cols)
    d_rows, d_cols = _normalize(duck_rows, duck_cols)
    assert s_cols == d_cols, f"{name}: column mismatch {s_cols} vs {d_cols}"
    s_typed = _typed_cols(spark_cols, spark_types)
    d_typed = _typed_cols(duck_cols, duck_types)
    assert s_typed == d_typed, (
        f"{name}: column TYPE mismatch (driver hashes typed values):"
        f" spark={s_typed} vs oracle={d_typed}"
    )
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


def test_typed_gate_catches_uncast_oracle(spark, duck):
    """A deliberately uncast oracle (HUGEINT sum, timestamp date_trunc)
    must fail the typed-column check — the class of bug that made
    chi2_drift_events driver-red in round 5 while the value-only local
    gate stayed green."""
    sdf = spark.sql("SELECT CAST(1 AS BIGINT) AS n, DATE'2024-01-01' AS d")
    res = duck.sql(
        "SELECT sum(x) AS n, date_trunc('day', TIMESTAMP '2024-01-01') AS d"
        " FROM (SELECT 1 AS x) t"
    )
    s_typed = _typed_cols(
        sdf.columns, [f.dataType.simpleString() for f in sdf.schema.fields]
    )
    d_typed = _typed_cols(res.columns, res.types)
    assert s_typed != d_typed, "typed gate failed to flag HUGEINT/timestamp"


def test_driver_window_rotation():
    """The driver gates the first 50 ``queries()`` entries. Round 6's
    verdict found the window frozen for two rounds (17 oracled queries
    NEVER driver-verified, 59 more >=3 rounds stale); round 7's found the
    original guard went deterministically red the moment each round's own
    CORRECTNESS file landed. This version is ROUND-BOUNDARY-SAFE — green
    both before and after the driver writes the current round's file,
    while still forcing per-round rotation:

    - the window is exactly 50 unique, registered, ORACLED names;
    - every oracled query with no STRICT driver-green row (hash_match is
      True — shared predicate with tools/staleness.py; a rows-match-only
      row is a typed-hash FAILURE, not green) in any recorded
      CORRECTNESS_r*.json must be IN the window;
    - staleness invariant: every oracled query is either strict-green
      within the last 3 recorded rounds or scheduled in the current
      window — so a query can never silently drift stale: the round its
      last green falls out of the 3-round horizon, the suite goes red
      until it is rotated back in;
    - the window must differ by >=10 slots from the PRIOR round's
      recorded window (files[-2]) — never from the newest file, which is
      by construction this window's own just-delivered results.
    """
    import json

    from thoth_spark.entry_queries import DRIVER_PRIORITY, ORACLES, QUERIES
    from tools.staleness import correctness_files, green_rounds

    assert len(DRIVER_PRIORITY) == 50
    assert len(set(DRIVER_PRIORITY)) == 50
    assert set(DRIVER_PRIORITY) <= set(QUERIES)
    assert set(DRIVER_PRIORITY) <= set(ORACLES), (
        "window slots must carry full oracles"
    )
    first50 = list(entry.queries())[:50]
    assert first50 == DRIVER_PRIORITY

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    files = correctness_files(root)
    if not files:
        pytest.skip("no recorded driver rounds")
    greens = green_rounds(root)
    newest = max(
        int(__import__("re").search(r"r(\d+)", os.path.basename(f)).group(1))
        for f in files
    )

    never = {q for q in ORACLES if not greens.get(q)}
    missing = never - set(DRIVER_PRIORITY)
    assert not missing, (
        f"oracled queries never strict-green must be in the window: {sorted(missing)}"
    )

    stale = {
        q
        for q in ORACLES
        if greens.get(q)
        and max(greens[q]) < newest - 2
        and q not in DRIVER_PRIORITY
    }
    assert not stale, (
        f"oracled queries >2 recorded rounds stale and NOT scheduled:"
        f" {sorted(stale)}; rotate DRIVER_PRIORITY (python tools/staleness.py)"
    )

    if len(files) >= 2:
        prior_window = set(json.load(open(files[-2])))
        changed = len(set(DRIVER_PRIORITY) - prior_window)
        assert changed >= 10, (
            f"window rotated only {changed} slots vs prior round"
            f" {os.path.basename(files[-2])}; reorder DRIVER_PRIORITY"
            " (see tools/staleness.py)"
        )


def test_staleness_table_current():
    """COVERAGE.md's staleness table must match the CORRECTNESS_r*.json
    files actually in the tree — the r7 verdict caught the committed
    table reflecting only 6 of 7 recorded rounds ('never: 24' long after
    it was false). Red here means: run `python tools/staleness.py`."""
    from tools.staleness import MARK_BEGIN, MARK_END, ROOT, build_table

    path = os.path.join(ROOT, "COVERAGE.md")
    if not os.path.exists(path):
        pytest.skip("no COVERAGE.md")
    text = open(path).read()
    assert MARK_BEGIN in text and MARK_END in text
    committed = text[text.index(MARK_BEGIN) : text.index(MARK_END) + len(MARK_END)]
    assert committed == build_table(), (
        "COVERAGE.md staleness table is stale; regenerate with"
        " `python tools/staleness.py`"
    )


def test_bench_contract():
    """bench.py must expose the driver-contract HEADLINE list and emit the
    expected JSON keys (run cheaply by monkeypatching the sf dir)."""
    import bench

    assert set(bench.HEADLINE) <= set(entry.queries())
