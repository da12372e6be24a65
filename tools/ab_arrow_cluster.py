#!/usr/bin/env python
"""Interleaved same-process re-measurement of the r12 "regressed"
Arrow-path cluster (VERDICT r12 item 5): events_user_features,
multimodal_decode_stub, pandas_udf_norms moved 1.3-1.5x between r11
and r12 on BIT-IDENTICAL plans (fingerprint-verified), alongside
opposite-sign swings elsewhere — the documented host-noise signature.

This interleaves N rounds of all three queries in ONE process (the
tools/ab_tumbling_cents.py pattern) so host drift cancels, and prints
per-round times + medians next to the r11/r12 driver medians. If the
in-process medians sit near the r11 values, the r12 deltas were box
noise; if they reproduce at the r12 level consistently, profile the
Arrow batch path.

    python tools/ab_arrow_cluster.py [sf_dir] [rounds]
"""
from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

R11 = {"events_user_features": 0.698, "multimodal_decode_stub": 0.509,
       "pandas_udf_norms": 0.442}
R12 = {"events_user_features": 1.062, "multimodal_decode_stub": 0.693,
       "pandas_udf_norms": 0.499}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 7

    from mapreduce_4sl08_spark.plans import QUERIES
    from mapreduce_4sl08_spark.session import get_session

    spark = get_session()
    names = list(R11)
    # one warm-up pass so JVM/Arrow init lands outside every arm
    for n in names:
        QUERIES[n].fn(spark, sf_dir).collect()

    times: dict[str, list[float]] = {n: [] for n in names}
    for r in range(rounds):
        for n in names:
            t0 = time.time()
            QUERIES[n].fn(spark, sf_dir).collect()
            times[n].append(time.time() - t0)
        print(f"round {r}: " + "  ".join(
            f"{n}={times[n][-1]:.3f}s" for n in names))
    print()
    for n in names:
        med = statistics.median(times[n])
        print(f"{n}: median {med:.3f}s over {rounds}  "
              f"(driver r11 {R11[n]:.3f}s, r12 {R12[n]:.3f}s)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
