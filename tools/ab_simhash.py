#!/usr/bin/env python
"""Interleaved same-process A/B of simhash_dedup (VERDICT r13 item 4):
the r13 driver bench read median 4.67 s vs min 3.32 s on an UNCHANGED
plan fingerprint — a median/min spread that smells like one slow pass,
possibly interacting with the r13 all-memo reset (bench passes now
honestly rebuild the persisted SimHash fingerprint relation each pass).

Two interleaved arms per round, host drift cancelling:
  cold — bench semantics: reset every SessionMemo + clearCache, run
  warm — memo-hit path: run again with the fingerprint memo populated

If cold's median sits near the r13 min (~3.3 s) with low spread, the
4.67 s driver median was one slow pass / box noise. If cold medians
reproduce at ~4.7 s, profile the fingerprint rebuild under the
all-memo reset before touching the plan.

    python tools/ab_simhash.py [sf_dir] [rounds]
"""
from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 7

    from mapreduce_4sl08_spark.plans import QUERIES, all_session_memos
    from mapreduce_4sl08_spark.session import get_session

    spark = get_session()
    fn = QUERIES["simhash_dedup"].fn

    def reset() -> None:
        for memo in all_session_memos().values():
            memo.clear()
        spark.catalog.clearCache()

    # warm-up: JVM/codegen/Arrow init lands outside both arms
    reset()
    fn(spark, sf_dir).collect()

    cold: list[float] = []
    warm: list[float] = []
    for r in range(rounds):
        reset()
        t0 = time.time()
        fn(spark, sf_dir).collect()
        cold.append(time.time() - t0)
        t0 = time.time()
        fn(spark, sf_dir).collect()
        warm.append(time.time() - t0)
        print(f"round {r}: cold={cold[-1]:.3f}s warm={warm[-1]:.3f}s",
              flush=True)
    print()
    for label, xs in (("cold(reset)", cold), ("warm(memo)", warm)):
        print(f"{label}: median {statistics.median(xs):.3f}s  "
              f"min {min(xs):.3f}s  max {max(xs):.3f}s  "
              f"(driver r13 median 4.67s / min 3.32s; r12 median 3.22s)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
