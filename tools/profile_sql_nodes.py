#!/usr/bin/env python
"""Per-operator (SQL-node) metrics for one query execution, via the UI's
/api/v1/.../sql endpoint — maps wall time to physical operators (guide
§7.1 "SQL tab"). Runs the query twice (warm codegen) and dumps the
second execution's node metrics.

Usage: python tools/profile_sql_nodes.py <query> [runs]
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_4sl08_spark.plans import QUERIES, all_session_memos  # noqa: E402
from mapreduce_4sl08_spark.session import get_session  # noqa: E402


def _api(url: str):
    with urllib.request.urlopen(url, timeout=20) as r:
        return json.loads(r.read())


def main() -> None:
    name = sys.argv[1]
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("profile_sql", extra_conf={"spark.ui.enabled": "true"})
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    base = f"{ui}/api/v1/applications/{app_id}"

    import time
    for run in range(n_runs):
        for memo in all_session_memos().values():
            memo.clear()
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        QUERIES[name].fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        print(f"run{run}: wall {time.perf_counter() - t0:.3f}s")

    execs = _api(f"{base}/sql?details=true&planDescription=false&length=200")
    # the last "save at" executions belong to the final run; take them all
    # (memoized persists run as separate executions)
    last = [e for e in execs if e["status"] == "COMPLETED"]
    last = last[-max(1, len(last) // n_runs):]
    for e in last:
        print(f"\n--- execution {e['id']} ({e['duration']} ms) ---")
        for node in e.get("nodes", []):
            mets = {m["name"]: m["value"] for m in node.get("metrics", [])}
            interesting = {k: v for k, v in mets.items()
                           if any(t in k for t in (
                               "time total", "time in", "shuffle bytes",
                               "records read", "output rows", "build time",
                               "collect time", "scan time", "task total",
                               "stage duration", "duration"))}
            if interesting:
                print(f"  [{node['nodeId']:3d}] {node['nodeName'][:60]}: "
                      + "; ".join(f"{k}={v}" for k, v in sorted(interesting.items())))
    spark.stop()


if __name__ == "__main__":
    main()
