"""Per-stage profile of one headline query.

Usage: python tools/profile_query.py <query> [sf_dir]

Runs the query once (warm-up at sf0.001 first to amortize codegen),
then again timed, with the Spark UI enabled, and prints every stage of
the timed run: wall, task time, shuffle read/write bytes, and the first
line of the stage's name/details — the empirical half of guide §1.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from thoth_spark.session import get_spark  # noqa: E402
from thoth_spark import entry_queries  # noqa: E402


def _run(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark(
        app_name=f"profile-{name}",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4077"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    q = entry_queries.QUERIES[name]
    try:
        _run(q(spark, "/root/testdata/sf0.001"))
    except Exception:
        pass
    spark.catalog.clearCache()
    sc = spark.sparkContext
    t0 = time.perf_counter()
    first_job = sc._jsc.sc().dagScheduler().nextJobId()
    if not isinstance(first_job, int):
        first_job = first_job.get()
    _run(q(spark, sf_dir))
    wall = time.perf_counter() - t0
    app_id = sc.applicationId
    base = f"http://localhost:4077/api/v1/applications/{app_id}"
    stages = json.load(urllib.request.urlopen(f"{base}/stages?status=complete"))
    jobs = json.load(urllib.request.urlopen(f"{base}/jobs"))
    timed_jobs = [j for j in jobs if j["jobId"] >= first_job]
    timed_stage_ids = {s for j in timed_jobs for s in j["stageIds"]}
    rows = []
    for s in stages:
        if s["stageId"] not in timed_stage_ids:
            continue
        dur = s.get("executorRunTime", 0)
        sub = s.get("submissionTime", "")
        comp = s.get("completionTime", "")
        rows.append(
            (
                dur,
                s["stageId"],
                s["numCompleteTasks"],
                s.get("shuffleReadBytes", 0),
                s.get("shuffleWriteBytes", 0),
                s.get("executorDeserializeTime", 0),
                s["name"].split("\n")[0][:80],
            )
        )
    rows.sort(reverse=True)
    print(f"\n=== {name}: wall {wall:.2f}s, {len(timed_jobs)} jobs, {len(rows)} stages ===")
    print(f"{'taskms':>8} {'stg':>4} {'tasks':>5} {'shR.kB':>8} {'shW.kB':>8} {'deser':>6}  name")
    for dur, sid, nt, sr, sw, des, nm in rows[:40]:
        print(f"{dur:8d} {sid:4d} {nt:5d} {sr/1e3:8.0f} {sw/1e3:8.0f} {des:6d}  {nm}")
    total_task_ms = sum(r[0] for r in rows)
    print(f"total executor task ms: {total_task_ms} (wall*32 = {wall*32000:.0f})")


if __name__ == "__main__":
    main()
