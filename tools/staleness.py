"""Regenerate the driver-verification staleness table in COVERAGE.md.

Reads every CORRECTNESS_r*.json at the repo root (the driver's per-round
typed-hash gate results), computes each catalogue query's last
driver-green round, and rewrites the ``## Driver-verification staleness``
section of COVERAGE.md. Run from the repo root:

    python tools/staleness.py

"Green" is STRICT: an oracled query counts as driver-green in a round
only if that round recorded ``hash_match is True`` — rows_match alone is
a typed-hash FAILURE, the exact class this tooling exists to surface
(r01 tpch_q12/sessionize, r05 chi2_drift_events). Rows-only queries (no
SQL oracle — ``err == 'no_oracle'``) can never be hash-green and are
reported in their own bucket so "never" means "oracled but never
hash-verified".

The round-6 verdict's headline finding — 17 oracled queries never driver
-verified, 59 more >=3 rounds stale, hidden behind an un-rotated window —
is exactly what this table makes self-evident. tests/test_entry_oracle.py
::test_driver_window_rotation consumes the SAME predicates (imported from
here) to FORCE rotation.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
from collections import Counter

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MARK_BEGIN = "<!-- staleness:begin -->"
MARK_END = "<!-- staleness:end -->"


def is_strict_green(v: dict) -> bool:
    """A driver row proving an oracled query correct: typed-hash match.

    ``rows_match`` without ``hash_match`` is a FAILURE (values or types
    diverged), never green — counting it green would let a hash-red
    query be rotated out of the window as "verified"."""
    return v.get("hash_match") is True


def is_rows_only_row(v: dict) -> bool:
    """A driver row for a declared no-oracle query: the weaker
    rows-produced check (the driver records err='no_oracle'). A null
    spark_rows does NOT count — it would mean the query never actually
    produced a frame."""
    return (
        v.get("err") == "no_oracle"
        and isinstance(v.get("spark_rows"), int)
        and v["spark_rows"] >= 0
    )


def correctness_files(root: str = ROOT) -> list[str]:
    return sorted(
        glob.glob(os.path.join(root, "CORRECTNESS_r*.json")),
        key=lambda f: int(re.search(r"r(\d+)", os.path.basename(f)).group(1)),
    )


# Parsed by tests/test_entry_oracle.py::test_staleness_table_current to
# recover how many rounds the committed table CLAIMS to cover, so the
# comparison is against exactly those files — never whatever the driver
# has since delivered (the r7 AND r8 verdicts each caught a variant of
# that round-boundary fragility).
COVERED_RE = re.compile(r"from (\d+) driver rounds")


def green_rounds(root: str = ROOT, rounds: int | None = None) -> dict[str, list[int]]:
    """query name -> sorted rounds with a STRICT hash-green driver row.

    ``rounds`` restricts the scan to the FIRST n recorded files — used to
    rebuild the table exactly as it stood when committed."""
    out: dict[str, list[int]] = {}
    for f in correctness_files(root)[: rounds if rounds is not None else None]:
        rnd = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        for q, v in json.load(open(f)).items():
            if is_strict_green(v):
                out.setdefault(q, []).append(rnd)
    return out


def rows_only_rounds(
    root: str = ROOT, rounds: int | None = None
) -> dict[str, list[int]]:
    """query name -> rounds with a rows-only (no-oracle) driver row."""
    out: dict[str, list[int]] = {}
    for f in correctness_files(root)[: rounds if rounds is not None else None]:
        rnd = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        for q, v in json.load(open(f)).items():
            if is_rows_only_row(v):
                out.setdefault(q, []).append(rnd)
    return out


def build_table(root: str = ROOT, rounds: int | None = None) -> str:
    """Render the staleness table over the first ``rounds`` recorded
    CORRECTNESS files under ``root`` (default: all of them). The covered
    count is stamped into the header ("from N driver rounds") so the
    suite can later verify the committed table against exactly the
    rounds it claims — green both before AND after the driver drops the
    next round's file into the tree."""
    sys.path.insert(0, ROOT)
    from thoth_spark import entry_queries as eq

    n_covered = (
        len(correctness_files(root)) if rounds is None else rounds
    )
    greens = green_rounds(root, rounds)
    weak = rows_only_rounds(root, rounds)
    rows = []
    for q in sorted(eq.QUERIES):
        oracled = q in eq.ORACLES
        if oracled:
            last = max(greens.get(q, [0])) or None
        else:
            last = max(weak.get(q, [0])) or None
        windowed = q in eq.DRIVER_PRIORITY
        rows.append((q, last, oracled, windowed))
    hist = Counter(
        (
            "n/a (rows-only)"
            if not r[2]
            else ("never" if r[1] is None else f"r{r[1]}")
        )
        for r in rows
    )
    lines = [
        MARK_BEGIN,
        "",
        f"Regenerated by `python tools/staleness.py` from "
        f"{n_covered} driver rounds. Green = STRICT "
        f"typed-hash match (`hash_match is True`); rows-only (no-oracle) "
        f"queries are bucketed separately and show their last rows-check "
        f"round. Histogram of last driver-green round: "
        + ", ".join(f"{k}: {v}" for k, v in sorted(hist.items()))
        + ".",
        "",
        "| query | last driver-green | oracle | in current window |",
        "|---|---|---|---|",
    ]
    for q, last, oracled, windowed in sorted(
        rows, key=lambda r: (not r[2], r[1] or 0, r[0])
    ):
        shown = "never" if last is None else f"r{last}"
        if not oracled:
            shown = f"n/a (rows-only{'' if last is None else f', rows r{last}'})"
        lines.append(
            f"| {q} | {shown} |"
            f" {'sql' if oracled else 'rows-only'} |"
            f" {'yes' if windowed else ''} |"
        )
    lines += ["", MARK_END]
    return "\n".join(lines)


def _is_git_tracked(root: str, filename: str) -> bool:
    """True iff ``filename`` is tracked by the git repo at ``root``.

    Non-repos (the twin-state test's tmp trees) and any git failure
    count as NOT tracked — a just-delivered, not-yet-committed file is
    exactly the case the one-round lag tolerance exists for."""
    import subprocess

    try:
        res = subprocess.run(
            ["git", "-C", root, "ls-files", "--error-unmatch", filename],
            capture_output=True,
            timeout=30,
        )
        return res.returncode == 0
    except (OSError, subprocess.TimeoutExpired):
        return False


def committed_table_check(root: str = ROOT) -> str | None:
    """Round-boundary-safe currency check for COVERAGE.md's table.

    Returns None when the committed table is acceptable, else a human
    diagnosis. Acceptable = the table covers either ALL recorded rounds
    or all-but-the-newest PROVIDED that newest file is not yet
    git-tracked (i.e. the driver just delivered it for the window that
    was committed WITH this very table; once it is committed, the table
    must cover it — the r7 incident was exactly a committed one-round
    lag), and it reproduces bit-for-bit from exactly the rounds it
    claims. Anything older is stale — the r7 verdict caught a table
    lagging a full round behind, the r8 verdict caught the strict
    == len(files) check going red the moment the driver delivered the
    current round's own results."""
    path = os.path.join(root, "COVERAGE.md")
    if not os.path.exists(path):
        return "no COVERAGE.md"
    text = open(path).read()
    if MARK_BEGIN not in text or MARK_END not in text:
        return "COVERAGE.md is missing the staleness table markers"
    committed = text[text.index(MARK_BEGIN) : text.index(MARK_END) + len(MARK_END)]
    m = COVERED_RE.search(committed)
    if not m:
        return "committed table does not stamp its covered-round count"
    n = int(m.group(1))
    n_files = len(correctness_files(root))
    if n > n_files:
        return (
            f"table claims {n} rounds but only {n_files} CORRECTNESS files"
            " are recorded"
        )
    if n < n_files - 1:
        return (
            f"table covers {n} rounds but {n_files} are recorded — more"
            " than the single just-delivered round behind; regenerate with"
            " `python tools/staleness.py`"
        )
    if n == n_files - 1:
        newest = os.path.basename(correctness_files(root)[-1])
        if _is_git_tracked(root, newest):
            return (
                f"table covers {n} rounds but the {n_files}th ({newest})"
                " is already git-committed — the one-round tolerance is"
                " only for a just-delivered, not-yet-committed file;"
                " regenerate with `python tools/staleness.py`"
            )
    if committed != build_table(root, rounds=n):
        return (
            f"table does not reproduce from the {n} rounds it claims;"
            " regenerate with `python tools/staleness.py`"
        )
    return None


def main() -> None:
    path = os.path.join(ROOT, "COVERAGE.md")
    table = build_table()
    text = open(path).read() if os.path.exists(path) else "# COVERAGE\n"
    if MARK_BEGIN in text and MARK_END in text:
        pre = text[: text.index(MARK_BEGIN)]
        post = text[text.index(MARK_END) + len(MARK_END) :]
        text = pre + table + post
    else:
        text = (
            text.rstrip()
            + "\n\n## Driver-verification staleness\n\n"
            + table
            + "\n"
        )
    open(path, "w").write(text)
    print(f"wrote staleness table to {path}")


if __name__ == "__main__":
    main()
