#!/usr/bin/env python
"""Skew rehearsal (VERDICT r5 item 8): does salting measurably beat the
un-salted plan on a hot-key workload, with AQE on?

    python tools/skew_rehearsal.py [n_rows] [hot_share]

Builds a synthetic hot-key fixture (default 10M rows, one key owning
50% of them, 999 cold keys with the rest), then times:

- AGG: plain groupBy(key).agg(sum/count/max)  vs  salted_aggregate
  (AQE's skew handling splits JOIN partitions only — a shuffle
  aggregation with one dominant key still lands on one task, which is
  exactly the residual case salted_aggregate exists for).
- JOIN: big-side sort-merge join to a 100k-row dim (broadcast disabled
  to force the shuffle path)  vs  salted_join
  (AQE CAN split skewed sort-merge partitions — this measures whether
  the manual salt still buys anything on top).

Each variant runs 3 times on a warm JVM; median reported. Equality of
results is asserted before timing (salting must never change answers).
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F  # noqa: E402

from mapreduce_4sl08_spark.operators.skew import (  # noqa: E402
    salted_aggregate, salted_join)
from mapreduce_4sl08_spark.session import get_session  # noqa: E402


def timed(fn, runs: int = 3) -> float:
    samples = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        samples.append(time.perf_counter() - t0)
    return round(statistics.median(samples), 2)


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    hot_share = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5
    spark = get_session("skew-rehearsal")

    # hot key 0 owns hot_share of all rows; 999 cold keys share the rest
    big = (
        spark.range(n_rows)
        .select(
            F.when(F.rand(seed=7) < hot_share, F.lit(0))
            .otherwise((F.rand(seed=11) * 999 + 1).cast("long"))
            .alias("key"),
            (F.rand(seed=13) * 100).alias("value"))
        .persist()
    )
    big.count()  # materialize once so every variant reads the same cache

    aggs = {"n": (F.count(F.lit(1)), "sum"),
            "total": (F.sum("value"), "sum"),
            "hi": (F.max("value"), "max")}

    def plain_agg():
        return big.groupBy("key").agg(
            F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"),
            F.max("value").alias("hi"))

    def salt_agg():
        return salted_aggregate(big, "key", aggs, n_salts=32)

    a = {r["key"]: (r["n"], round(r["total"], 4)) for r in plain_agg().collect()}
    b = {r["key"]: (r["n"], round(r["total"], 4)) for r in salt_agg().collect()}
    assert {k: v[0] for k, v in a.items()} == {k: v[0] for k, v in b.items()}

    res = {
        "n_rows": n_rows, "hot_share": hot_share,
        "agg_plain_sec": timed(lambda: plain_agg().write.mode("overwrite")
                               .format("noop").save()),
        "agg_salted_sec": timed(lambda: salt_agg().write.mode("overwrite")
                                .format("noop").save()),
    }

    dim = spark.range(100_000).select(
        F.col("id").alias("key"),
        F.md5(F.col("id").cast("string")).alias("attr")).persist()
    dim.count()

    no_bcast = {"spark.sql.autoBroadcastJoinThreshold": "-1",
                "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1"}

    def with_conf(conf, fn):
        saved = {k: spark.conf.get(k, None) for k in conf}
        for k, v in conf.items():
            spark.conf.set(k, v)
        try:
            return fn()
        finally:
            for k, v in saved.items():
                if v is not None:
                    spark.conf.set(k, v)

    def plain_join():
        return big.join(dim, "key", "inner")

    def salt_join():
        return salted_join(big, dim, "key", n_salts=32, how="inner")

    n_plain = with_conf(no_bcast, lambda: plain_join().count())
    n_salt = with_conf(no_bcast, lambda: salt_join().count())
    assert n_plain == n_salt, (n_plain, n_salt)

    res["join_plain_aqe_sec"] = with_conf(no_bcast, lambda: timed(
        lambda: plain_join().write.mode("overwrite").format("noop").save()))
    res["join_salted_sec"] = with_conf(no_bcast, lambda: timed(
        lambda: salt_join().write.mode("overwrite").format("noop").save()))
    # and with AQE skew-join splitting OFF — the cluster regime where the
    # optimizer can't rescue the skew (older engines, disabled AQE)
    aqe_off = dict(no_bcast)
    aqe_off["spark.sql.adaptive.skewJoin.enabled"] = "false"
    res["join_plain_noaqeskew_sec"] = with_conf(aqe_off, lambda: timed(
        lambda: plain_join().write.mode("overwrite").format("noop").save()))

    print(json.dumps(res), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
