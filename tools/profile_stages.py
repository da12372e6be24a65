#!/usr/bin/env python
"""Per-stage profile of headline (or named) queries via the live UI REST
API: run each query through the noop sink (guide §1.4), then attribute
the stages it submitted — duration, task-time sum, shuffle read/write
bytes, input bytes — so optimization targets the stage that actually
costs (guide §1.1).

Usage: SPARK_GRAFT_BENCH_RUNS=2 python tools/profile_stages.py [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from mapreduce_4sl08_spark.plans import QUERIES, all_session_memos  # noqa: E402
from mapreduce_4sl08_spark.session import get_session  # noqa: E402


def _api(url: str):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def main() -> None:
    names = sys.argv[1:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2")))
    spark = get_session("profile_stages", extra_conf={"spark.ui.enabled": "true"})
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    base = f"{ui}/api/v1/applications/{app_id}"

    for run in range(n_runs):
        for memo in all_session_memos().values():
            memo.clear()
        spark.catalog.clearCache()
        for name in names:
            before = {s["stageId"] for s in _api(f"{base}/stages")}
            spark.sparkContext.setJobDescription(f"{name}#run{run}")
            t0 = time.perf_counter()
            QUERIES[name].fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            wall = time.perf_counter() - t0
            spark.sparkContext.setJobDescription(None)
            stages = [s for s in _api(f"{base}/stages")
                      if s["stageId"] not in before and s["status"] != "PENDING"]
            print(f"\n=== {name} run{run}: wall {wall:.3f}s, "
                  f"{len(stages)} stages ===")
            stages.sort(key=lambda s: -(s.get("executorRunTime") or 0))
            acct = 0.0
            for s in stages:
                dur = (s.get("executorRunTime") or 0) / 1000.0
                acct += dur
                nm = (s.get("name") or "")[:70]
                det = (s.get("details") or "").splitlines()
                # first repo frame, if any, to say which operator line
                frame = next((ln.strip() for ln in det
                              if "mapreduce_4sl08_spark" in ln
                              or "bench" in ln), "")[:80]
                print(f"  run={dur:7.3f}s tasks={s['numCompleteTasks']:4d} "
                      f"in={s.get('inputBytes', 0):>11,} "
                      f"sw={s.get('shuffleWriteBytes', 0):>11,} "
                      f"sr={s.get('shuffleReadBytes', 0):>11,} "
                      f"{nm}  {frame}")
            print(f"  [sum executorRunTime {acct:.2f}s across all tasks; "
                  f"wall {wall:.3f}s]")
    spark.stop()


if __name__ == "__main__":
    main()
