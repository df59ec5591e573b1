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
    if "interval" in t:
        return "interval"
    # Integer WIDTHS are distinct lattice points: the driver hashes typed
    # values, so Spark INT vs DuckDB BIGINT is a red row there — collapsing
    # them locally (pre-r8 behavior) hid exactly the r5 failure class.
    if "bigint" in t or t == "long":
        return "int64"
    if "smallint" in t or t == "short":
        return "int16"
    if "tinyint" in t or t in ("byte", "int8"):
        return "int8"
    if "int" in t:  # int / integer / int32 / uinteger
        return "int32"
    if "decimal" in t or "numeric" in t:
        # DECIMAL is exact fixed-point, not a float — a Spark DOUBLE vs
        # DuckDB DECIMAL(18,3) column must flag locally like it would in
        # the driver's typed hash.
        return "decimal"
    if any(k in t for k in ("double", "float", "real")):
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


def _assert_query_matches(spark, duck, name, q, sql):
    """The driver-gate replica shared by the wired and QUEUED oracles:
    typed column compare (the driver hashes typed values) + row count +
    order-insensitive normalized values."""
    sdf = q(spark, SF_DIR)
    spark_cols = sdf.columns
    spark_types = [f.dataType.simpleString() for f in sdf.schema.fields]
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck.sql(sql)
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


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, duck, name):
    _assert_query_matches(
        spark, duck, name, entry.queries()[name], entry.oracle_sql()[name]
    )


def test_queued_oracles_not_double_wired():
    """A queued oracle that gets wired must leave the queue — staying in
    both registries would double-run it here and mask a missed
    DRIVER_PRIORITY slot."""
    from thoth_spark.entry_queries import QUEUED_ORACLES

    assert not set(QUEUED_ORACLES) & set(entry.oracle_sql())
    assert set(QUEUED_ORACLES) <= set(entry.queries())


@pytest.mark.parametrize(
    "name", sorted(__import__("thoth_spark.entry_queries", fromlist=["x"]).QUEUED_ORACLES)
)
def test_queued_oracle_matches(spark, duck, name):
    """The r11 oracle queue is held to the SAME gate as the wired
    oracles every round it waits — a queued replay that rots is worse
    than none, because it would be wired green-by-assumption."""
    from thoth_spark.entry_queries import QUEUED_ORACLES

    _assert_query_matches(
        spark, duck, name, entry.queries()[name], QUEUED_ORACLES[name]
    )


# Per-query minimum row counts for the rows-only (no-SQL-oracle)
# queries at sf0.001 — `count() >= 0` was vacuously true (r10 verdict
# #4: a silently-empty frame passed). Floors are structural, not
# tuned: validation frames emit >= 1 row per fold/model, top-k emits
# k rows per query vector, survivor sets keep most of the corpus.
ROWS_ONLY_MIN = {
    "accuracy_study_events": 5,       # one row per experiment A-E
    "anomaly_changepoint_validation": 10,
    "anomaly_sarima_validation": 10,
    "classifier_quality_documents": 100,
    # r16: queued exact oracle in QUEUED_ORACLES (held to the wired
    # gate by test_queued_oracle_matches at 3 SFs) — wires in r17;
    # one output row per input doc
    "c4_span_dedup_incremental_documents": 500,
}


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_query_runs(spark, name):
    df = entry.queries()[name](spark, SF_DIR)
    floor = ROWS_ONLY_MIN.get(name, 1)
    assert df.count() >= floor, (
        f"{name}: rows-only query returned fewer than its structural"
        f" floor of {floor} rows"
    )


def test_rows_only_floors_cover_catalogue():
    """Every rows-only query carries an explicit floor — a new
    no-oracle query must declare its expected minimum here."""
    assert set(ROWS_ONLY_QUERIES) <= set(ROWS_ONLY_MIN)


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


def test_gap_fill_oracle_observed_null_is_not_a_gap():
    """ORACLE_GAP_FILL must key is_gap on a JOIN MISS (s.entity IS NULL),
    matching fill_gaps' __present-marker semantics — an observed bucket
    whose metric value is genuinely NULL (Mean over an all-null day) is
    NOT a gap and must keep its null value, not be zero-filled (r6/r7
    advice: the old predicate s.value IS NULL diverged here)."""
    con = duckdb.connect()
    rows = con.sql(
        """
        WITH series AS (
          SELECT 'Column' AS entity, 'v' AS instance, 'Mean' AS name,
                 TIMESTAMP '2024-01-01' AS ts, NULL::DOUBLE AS value
          UNION ALL SELECT 'Dataset', '*', 'Size', TIMESTAMP '2024-01-01', 3.0
        ),
        grid AS (
          SELECT unnest(generate_series(TIMESTAMP '2024-01-01',
                                        TIMESTAMP '2024-01-02',
                                        INTERVAL '1 day')) AS ts
        ),
        keys AS (SELECT DISTINCT entity, instance, name FROM series),
        dense AS (SELECT g.ts, k.entity, k.instance, k.name FROM grid g CROSS JOIN keys k)
        SELECT d.ts::DATE AS ts, d.name,
               CASE WHEN s.entity IS NULL AND d.name = 'Size' THEN 0.0 ELSE s.value END AS value,
               (s.entity IS NULL) AS is_gap
        FROM dense d LEFT JOIN series s
          ON s.ts = d.ts AND s.entity = d.entity
         AND s.instance = d.instance AND s.name = d.name
        ORDER BY 1, 2
        """
    ).fetchall()
    by_key = {(str(r[0]), r[1]): (r[2], r[3]) for r in rows}
    # observed bucket with NULL Mean: NOT a gap, value stays null
    assert by_key[("2024-01-01", "Mean")] == (None, False)
    # observed Size keeps its value
    assert by_key[("2024-01-01", "Size")] == (3.0, False)
    # absent bucket: gap; Size zero-filled, Mean stays null
    assert by_key[("2024-01-02", "Size")] == (0.0, True)
    assert by_key[("2024-01-02", "Mean")] == (None, True)


def test_temperature_mix_oracle_null_lang_agrees_with_operator(spark):
    """ORACLE_TEMPERATURE_MIX must exclude NULL langs from the counts
    CTE exactly as the operator does (curation.temperature_mix drops
    NULL sources BEFORE the binding-scale min) — on a fixture where the
    NULL stratum has the SMALLEST count, an unfixed oracle would make
    NULL the binding source and silently thin the true scarcest stratum
    (r13 verdict nit #1, the HLL-gate defect class)."""
    import pandas as pd

    from thoth_spark.entry_queries import ORACLES
    from thoth_spark.operators import curation

    rows = (
        [(i, "big") for i in range(400)]
        + [(1000 + i, "small") for i in range(50)]
        + [(2000 + i, None) for i in range(10)]  # smallest count: would
        # set the binding scale if the oracle's counts CTE kept it
    )
    pdf = pd.DataFrame(rows, columns=["doc_id", "lang"])
    con = duckdb.connect()
    con.register("documents", pdf)
    oracle_rows = con.sql(ORACLES["temperature_mix_documents"]).fetchall()

    sdf = spark.createDataFrame(rows, "doc_id long, lang string")
    got = (
        curation.temperature_mix(sdf, source_col="lang", alpha=0.5)
        .select("doc_id", "lang", "mix_rate")
        .collect()
    )
    assert sorted(tuple(r) for r in got) == sorted(oracle_rows)
    # the true scarcest non-null stratum is kept whole
    kept_small = sum(1 for r in got if r["lang"] == "small")
    assert kept_small == 50


def test_type_lattice_widths():
    """Int widths and DECIMAL are distinct lattice points (r6/r7 advice:
    collapsing bigint/int -> 'int' and DECIMAL -> 'float' let the local
    gate pass type misalignments the driver's typed hash flags)."""
    assert _type_lattice("bigint") == _type_lattice("BIGINT") == "int64"
    assert _type_lattice("int") == _type_lattice("INTEGER") == "int32"
    assert _type_lattice("smallint") == "int16"
    assert _type_lattice("tinyint") == "int8"
    assert _type_lattice("bigint") != _type_lattice("int")
    assert _type_lattice("decimal(18,3)") == _type_lattice("DECIMAL(10,2)") == "decimal"
    assert _type_lattice("decimal(18,3)") != _type_lattice("double")
    assert _type_lattice("hugeint") not in ("int64", "int32")
    assert _type_lattice("interval") not in ("int64", "int32", "int16", "int8")
    assert _type_lattice("double") == _type_lattice("float") == "float"


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
      within the last 4 recorded rounds or scheduled in the current
      window — so a query can never silently drift stale: the round its
      last green falls out of the 4-round horizon, the suite goes red
      until it is rotated back in. (Round 11 widened the horizon from 3
      to 4: 150 wired oracles exactly saturated the 50-slot × 3-round
      budget, making it arithmetically impossible to ever wire the 18
      round-10 queued oracles — a newly wired oracle is never-green and
      must occupy a window slot the round it lands. 50 × 4 = 200 ≥ 168
      wired oracles leaves headroom while still bounding staleness.);
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
        and max(greens[q]) < newest - 3
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
    """COVERAGE.md's staleness table must reproduce from exactly the
    rounds it CLAIMS to cover (stamped in its header), and may lag the
    recorded CORRECTNESS files by at most the single newest one — the
    file the driver delivers FOR the window committed alongside this
    table. The r7 verdict caught the table a full round stale; the r8
    verdict caught the strict all-files comparison going deterministically
    red the moment the driver dropped the current round's own results.
    Red here means: run `python tools/staleness.py`."""
    from tools.staleness import committed_table_check

    diagnosis = committed_table_check()
    assert diagnosis is None, diagnosis


def test_staleness_table_check_survives_round_boundary(tmp_path):
    """Twin-state guarantee: the currency check stays green BOTH before
    and after the driver delivers the next round's CORRECTNESS file, and
    still goes red when the table genuinely lags by more than one round,
    when the lagging round is already git-committed, or when the table
    body was tampered with.

    The r9 verdict caught the previous version of this test being itself
    round-boundary-broken: it seeded the tmp tree with ALL recorded
    CORRECTNESS files while the committed table stamps only the rounds
    it was regenerated from, so the moment the live tree carried one
    more round than the stamp (every round boundary), "state B" was two
    rounds past the stamp and correctly red. The tmp tree must be
    normalized to the STAMP, not to whatever the driver has since
    delivered: seed with exactly the first N stamped rounds, then
    synthesize stamp+1 (state B) and stamp+2 (state C)."""
    import shutil

    from tools.staleness import (
        COVERED_RE,
        ROOT,
        committed_table_check,
        correctness_files,
    )

    cov_src = os.path.join(ROOT, "COVERAGE.md")
    if not os.path.exists(cov_src):
        pytest.skip("no COVERAGE.md")
    m = COVERED_RE.search(open(cov_src).read())
    assert m, "committed table must stamp its covered-round count"
    n = int(m.group(1))
    files = correctness_files(ROOT)
    if not files or len(files) < n:
        pytest.skip("fewer recorded rounds than the table stamps")

    # state A: the tmp tree holds EXACTLY the stamped rounds — never the
    # live tree's full file list, which at a round boundary includes the
    # round the driver just delivered for THIS window.
    root = str(tmp_path)
    stamped = files[:n]
    for f in stamped:
        shutil.copy(f, root)
    shutil.copy(cov_src, root)
    assert committed_table_check(root) is None

    # state B: driver delivers round stamp+1 mid-boundary -> STILL green
    # (the tmp tree is not a git repo, so the synthetic file counts as
    # not-yet-committed — the exact tolerance case).
    nxt = int(
        __import__("re").search(r"r(\d+)", os.path.basename(stamped[-1])).group(1)
    ) + 1
    synthetic = os.path.join(root, f"CORRECTNESS_r{nxt:02d}.json")
    with open(synthetic, "w") as fh:
        fh.write('{"__synthetic__": {"hash_match": true}}')
    assert committed_table_check(root) is None

    # state B': the just-delivered round gets git-committed without the
    # table being regenerated -> red (r7 incident class; advisor r9).
    import subprocess

    git_env = {**os.environ, "HOME": root, "GIT_CONFIG_GLOBAL": os.devnull}
    subprocess.run(["git", "init", "-q", root], check=True, env=git_env)
    subprocess.run(
        ["git", "-C", root, "add", os.path.basename(synthetic)],
        check=True,
        env=git_env,
    )
    assert committed_table_check(root) is not None
    subprocess.run(
        ["git", "-C", root, "rm", "--cached", "-q", os.path.basename(synthetic)],
        check=True,
        env=git_env,
    )
    assert committed_table_check(root) is None

    # state C: TWO rounds beyond the stamped coverage -> red
    with open(
        os.path.join(root, f"CORRECTNESS_r{nxt + 1:02d}.json"), "w"
    ) as fh:
        fh.write('{"__synthetic__": {"hash_match": true}}')
    assert committed_table_check(root) is not None

    # state D: tampered table body -> red even at matching round count
    os.remove(os.path.join(root, f"CORRECTNESS_r{nxt + 1:02d}.json"))
    os.remove(synthetic)
    cov = os.path.join(root, "COVERAGE.md")
    text = open(cov).read()
    open(cov, "w").write(text.replace("| sql |", "| sq1 |", 1))
    assert committed_table_check(root) is not None


def test_bench_contract():
    """bench.py must expose the driver-contract HEADLINE list and emit the
    expected JSON keys (run cheaply by monkeypatching the sf dir)."""
    import bench

    assert set(bench.HEADLINE) <= set(entry.queries())


def test_bench_compact_tail_fits_driver_capture():
    """The driver records only the last 2000 chars of bench stdout. The
    compact tail line must carry per-query walls AND the complete
    scaling-ratio list inside that budget even with worst-case 3-digit
    walls (r6/r7 BENCH artifacts lost the ratios to truncation)."""
    import json as _json

    import bench

    # pessimistic-but-plausible walls: every query at 9.9 s would be a
    # ~800 s bench (the real total is ~105 s, max single wall 4.4 s);
    # demand 100 chars of slack under the 2000-char capture so a few
    # genuine 2-digit outliers still fit
    # (ratios above 9.9 would mean a disqualifying super-linear operator
    # — the bench's whole point is keeping them ~<=5)
    timings = {n: 9.9 for n in bench.HEADLINE}
    ratios = {n: 9.9 for n in bench.HEADLINE}
    line = bench.compact_tail_line(
        9999.9, timings, 0.1, ratios, calibration=[9.999, 9.999, 9.999, 9.999]
    )
    assert len(line) + 100 <= 2000, f"tail line {len(line)} chars > capture budget"
    parsed = _json.loads(line)
    assert len(parsed["queries"]) == len(bench.HEADLINE)
    assert len(parsed["ratios"]) == len(bench.HEADLINE)
    assert all(r == 9.9 for r in parsed["ratios"])
    # short names stay collision-free over the real HEADLINE list
    assert len({bench._short(n) for n in bench.HEADLINE}) == len(bench.HEADLINE)


def test_bench_tail_collision_falls_back_to_full_names():
    """A future short-name collision must degrade to full names, never
    abort the bench run (r7 advice: the old assert zeroed the artifact)."""
    import json as _json

    import bench

    timings = {"dedup_exact_documents": 1.0, "dedup_exact_events": None}
    # force a collision by colliding the shortener
    orig = bench._short
    bench._short = lambda n: "dd_exact"
    try:
        line = bench.compact_tail_line(1.0, timings, 0.1, {})
    finally:
        bench._short = orig
    parsed = _json.loads(line)
    assert set(parsed["queries"]) == set(timings)
    assert parsed["ratios"] == [None, None]


def test_bench_contention_verdict_sees_slow_jvm():
    """r12 verdict watch item: the r12 bench regressed ~17% fleet-wide
    yet shipped ``contended: false`` because the sentinel keyed only on
    the cpu matmul (which was FASTER than idle) while ``spark_agg_s``
    rose 15%. cal_factor must now be the WORSE sentinel ratio, so a
    slower-JVM/IO environment can never ship undiscounted."""
    import bench

    idle = [bench.IDLE_CPU_MATMUL_S, bench.IDLE_SPARK_AGG_S] * 2
    assert bench.contention_verdict(idle) == (1.0, False)

    # r12's actual calibration: fast cpu, slow jvm -> factor > 1
    factor, contended = bench.contention_verdict([0.748, 0.406, 0.646, 0.268])
    assert factor > 1.1 and not contended  # discounted, below hard flag

    # jvm-only contention crosses the hard flag even with an idle cpu
    slow_jvm = [
        bench.IDLE_CPU_MATMUL_S,
        bench.IDLE_SPARK_AGG_S * 2.0,
    ] * 2
    factor, contended = bench.contention_verdict(slow_jvm)
    assert factor >= 2.0 and contended

    # cpu contention still flags exactly as before
    slow_cpu = [
        bench.IDLE_CPU_MATMUL_S * 2.0,
        bench.IDLE_SPARK_AGG_S,
    ] * 2
    factor, contended = bench.contention_verdict(slow_cpu)
    assert factor >= 2.0 and contended
