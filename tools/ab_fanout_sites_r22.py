#!/usr/bin/env python
"""Interleaved fan-out A/B for call sites that do NOT pass fanout=True
(r22: the heavy-map/low-cardinality-aggregation class and the pandas
consumers VERDICT r21 item 6 wants re-tested at 10x).

Arms flip the DEFAULT of plans.base.t (every module imports that one
function object), so arm `fan` runs each named query with fanout=True
at all its implicit call sites while explicit fanout=True sites are
unaffected; arm `plain` is the shipped code. Arms alternate each rep
(fan,plain / plain,fan / ...) to cancel box drift; memos are cleared
before every timed build so each rep pays the full first-invocation
cost. One JSON line per query.

usage: ab_fanout_sites_r22.py <sf_dir> <query> [query ...] [--reps N]
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    reps = 5
    argv = sys.argv[1:]
    if "--reps" in argv:
        i = argv.index("--reps")
        reps = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    sf_dir, names = argv[0], argv[1:]

    from mapreduce_4sl08_spark.plans import QUERIES, base
    from mapreduce_4sl08_spark.plans.registry import all_session_memos
    from mapreduce_4sl08_spark.session import get_session

    spark = get_session("ab-fanout-sites-r22")

    def reset():
        for memo in all_session_memos().values():
            memo.clear()
        spark.catalog.clearCache()

    def run(name: str, fan: bool) -> float:
        base.t.__defaults__ = (fan,)
        try:
            reset()
            spark.sparkContext.setJobDescription(f"{name}:fan={fan}")
            t0 = time.perf_counter()
            QUERIES[name].fn(spark, sf_dir).write.mode("overwrite") \
                .format("noop").save()
            return time.perf_counter() - t0
        finally:
            base.t.__defaults__ = (False,)

    for name in names:
        run(name, False)  # warm classload/codegen outside the samples
        times = {"fan": [], "plain": []}
        for rep in range(reps):
            order = ("fan", "plain") if rep % 2 == 0 else ("plain", "fan")
            for arm in order:
                times[arm].append(run(name, arm == "fan"))
        print(json.dumps({
            "query": name, "sf_dir": sf_dir, "reps": reps,
            "fan_median": round(statistics.median(times["fan"]), 3),
            "plain_median": round(statistics.median(times["plain"]), 3),
            "fan_all": [round(x, 3) for x in times["fan"]],
            "plain_all": [round(x, 3) for x in times["plain"]],
        }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
