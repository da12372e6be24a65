#!/usr/bin/env python
"""Driver-strict correctness sweep over a NAMED SUBSET of the registry
(same harness as sweep_all.py, for fast re-proof of this round's
changed-plan queries at the larger fixtures):

    python tools/sweep_subset.py <sf_dir> name1 name2 ...
    python tools/sweep_subset.py <sf_dir> --priority   # registry._ROUND_PRIORITY
"""

from __future__ import annotations

import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    if names == ["--priority"]:
        from mapreduce_4sl08_spark.plans import registry
        names = list(registry._ROUND_PRIORITY)

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as E
    from tests.oracle import compare_frames

    spark = (SparkSession.builder.master("local[4]")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory",
                     os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
             .getOrCreate())
    con = duckdb.connect()
    for tbl in TABLES:
        con.execute(f"CREATE VIEW {tbl} AS SELECT * "
                    f"FROM '{sf_dir}/{tbl}.parquet'")

    qs, oracles = E.queries(), E.oracle_sql()
    unknown = [n for n in names if n not in qs]
    if unknown:
        print("unknown queries:", ", ".join(unknown))
        return 2
    # same per-query watchdog as sweep_all (see tools/sweep_watchdog):
    # a super-linear plan or oracle fails by name instead of stalling
    from tools.sweep_watchdog import timeboxed

    sc = spark.sparkContext
    failures: list[str] = []
    t0 = time.perf_counter()
    for i, name in enumerate(names, 1):
        tq = time.perf_counter()
        try:
            sc.setJobGroup(name, name, interruptOnCancel=True)
            got = timeboxed(
                f"{name} (spark)",
                lambda: qs[name](spark, sf_dir).toPandas(),
                lambda: sc.cancelJobGroup(name))
            if name in oracles:
                want = timeboxed(
                    f"{name} (oracle)",
                    lambda: con.execute(oracles[name]).fetchdf(),
                    con.interrupt)
                compare_frames(got, want, name)
                status = "ok"
            else:
                assert len(got) >= 0
                status = "ok (rows-only)"
        except Exception:
            failures.append(name)
            status = "FAIL"
            traceback.print_exc()
        print(f"[{i:3d}/{len(names)}] {status:15s} "
              f"{time.perf_counter() - tq:6.2f}s {name}", flush=True)
    dt = time.perf_counter() - t0

    print(f"\nswept {len(names)} queries in {dt:.0f} s at {sf_dir}: "
          f"{len(names) - len(failures)} green, {len(failures)} failed")
    if failures:
        print("FAILED:", ", ".join(failures))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
