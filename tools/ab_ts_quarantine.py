#!/usr/bin/env python
"""Interleaved same-process A/B of the r19 ts-representability
quarantine filter (sources/tables.py::load_table): the CURRENT tree
(quarantine ON — a pushed Or(IsNull, And(GtEq, LtEq)) predicate on
every orders/lineitem/events scan) against the r18 form (no filter),
reconstructed by emptying TS_QUARANTINE_COLS for the OFF arm — the
loop then no-ops, which IS the r18 load path.

Probes the two headline shapes the filter touches hardest:
q1_pricing_summary (scan-bound lineitem agg — any per-row predicate
cost shows here first) and events_tumbling_hourly (events scan whose
filter sits on the raw NTZ column, below the ts normalization).
Arms alternate each round so host drift cancels.

    python tools/ab_ts_quarantine.py [sf_dir] [rounds]
"""
from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

QUERIES_UNDER_TEST = ("q1_pricing_summary", "events_tumbling_hourly")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 7

    from mapreduce_4sl08_spark import session as S
    from mapreduce_4sl08_spark.plans import QUERIES
    from mapreduce_4sl08_spark.sources import tables as T

    spark = S.get_session()
    saved = dict(T.TS_QUARANTINE_COLS)

    def run(name: str, quarantine_on: bool) -> float:
        if quarantine_on:
            T.TS_QUARANTINE_COLS.clear()
            T.TS_QUARANTINE_COLS.update(saved)
        else:
            T.TS_QUARANTINE_COLS.clear()
        t0 = time.perf_counter()
        df = QUERIES[name].fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    results: dict[str, dict[str, list[float]]] = {
        n: {"on": [], "off": []} for n in QUERIES_UNDER_TEST}
    try:
        for name in QUERIES_UNDER_TEST:  # warm-up absorbs codegen
            run(name, True)
        for r in range(rounds):
            first_on = r % 2 == 0  # alternate arm order per round
            for name in QUERIES_UNDER_TEST:
                for on in ((True, False) if first_on else (False, True)):
                    results[name]["on" if on else "off"].append(
                        run(name, on))
    finally:
        T.TS_QUARANTINE_COLS.clear()
        T.TS_QUARANTINE_COLS.update(saved)

    for name, arms in results.items():
        on, off = arms["on"], arms["off"]
        spread = max(on + off) - min(on + off)
        print(f"{name}: quarantine ON median "
              f"{statistics.median(on):.3f}s (min {min(on):.3f}) vs "
              f"OFF {statistics.median(off):.3f}s (min {min(off):.3f}) "
              f"— delta {statistics.median(on) - statistics.median(off):+.3f}s "
              f"inside {spread:.3f}s spread, {rounds} interleaved rounds")
    return 0


if __name__ == "__main__":
    sys.exit(main())
