#!/usr/bin/env python
"""Interleaved same-process A/B of the two r17 bench movers (VERDICT
r17 item 4): events_user_features (0.600 → 0.836 s driver median) and
events_sessionize (0.821 → 0.978 s). Both carried real plan diffs in
r17 — the null-ts scan filter, and the NaT read via
``.values.view('int64')`` — while 9 fingerprint-identical queries
inflated similarly (box-noise hypothesis). This probe interleaves the
CURRENT plan (r18 tree: null filter + finite(value) + view-read)
against a faithful inline reconstruction of the r16 plan (no filter,
raw cents, astype NaT read) in one process, alternating arms each
round so host drift cancels.

Reading: |median(now) - median(r16)| within the cross-round spread →
the driver delta was noise; a reproducible gap → the named diff costs
real time and needs attention.

r20 (VERDICT r19 item 5) adds the three rows the r19 driver bench
showed elevated, each against its faithful R18 reconstruction:
events_tumbling_hourly and events_sessionize differ from r18 only by
the ts-quarantine scan filter (the single r19 hot-path change), so the
r18 arm is the identical plan body over an unquarantined read;
sort_customers_multi reads only `customer` — NOT a quarantined table —
so its r18 form IS the current plan, and its pair doubles as the
noise-floor sentinel (two identical plans: any delta there calibrates
pure host drift).

    python tools/ab_bench_movers.py [sf_dir] [rounds]
"""
from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _r16_sessionize(spark, sf_dir):
    """events_sessionize exactly as of the r16 tree (commit 7c94d13):
    no null-ts filter, inline (pre-finite) cents."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from mapreduce_4sl08_spark.plans.base import dollars, t
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc())
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts", 1).over(w))
    sessions = (
        e.withColumn("new_session",
                     F.when(gap.isNull() | (gap > 1800), 1).otherwise(0))
        .withColumn("session_seq", F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    )
    return (
        sessions.groupBy("user_id", "session_seq")
        .agg(F.min("ts").alias("session_start"),
             F.max("ts").alias("session_end"),
             F.count(F.lit(1)).alias("n_events"),
             F.sum(F.round(F.col("value") * 100).cast("long")).alias("_sv_c"))
        .select("user_id", "session_seq", "session_start", "session_end",
                "n_events", dollars("_sv_c", "sum_value"))
        .orderBy("user_id", "session_seq")
    )


def _r16_user_features(spark, sf_dir):
    """events_user_features as of r16: no null-ts filter, raw value,
    and the grouped op's NaT read via .astype('int64') (r17 switched to
    .values.view)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from mapreduce_4sl08_spark.operators.grouped import USER_FEATURES_SCHEMA
    from mapreduce_4sl08_spark.plans.base import t

    def features_partition(batches):
        def one(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(["user_id", "ts", "event_id"])
            ts = pdf["ts"].astype("datetime64[us]")
            ts_us = ts.astype("int64").where(ts.notna())
            uid = pdf["user_id"].values
            g = pdf.groupby("user_id", sort=False)
            n = g.size()
            gts = ts_us.groupby(uid, sort=False)
            span_us = (gts.max() - gts.min()).where(n > 1, 0).fillna(0)
            max_delta = g["value"].diff().abs().groupby(uid, sort=False).max()
            return pd.DataFrame({
                "user_id": n.index.astype("int64"),
                "n_events": n.values.astype("int64"),
                "span_us": span_us.values.astype("int64"),
                "max_value_delta":
                    max_delta.fillna(0.0).values.astype("float64"),
            })

        parts = [pdf for pdf in batches]
        if parts:
            yield one(pd.concat(parts, ignore_index=True))

    e = t(spark, sf_dir, "events")
    feats = (e.select("user_id", "event_id", "ts", "value")
             .repartition("user_id")
             .mapInPandas(features_partition, USER_FEATURES_SCHEMA))
    span_e4 = F.expr("(span_us + 50) div 100")
    gap_e4 = F.expr(
        "(2 * span_us + greatest(n_events - 1, 1L) * 100) "
        "div (greatest(n_events - 1, 1L) * 200)")
    return (
        feats.select(
            "user_id", "n_events",
            (span_e4 / F.lit(10000.0)).alias("span_seconds"),
            (gap_e4 / F.lit(10000.0)).alias("mean_gap_seconds"),
            F.round("max_value_delta", 4).alias("max_value_delta"),
        )
        .orderBy("user_id")
    )


def _r18_tumbling(spark, sf_dir):
    """events_tumbling_hourly as of r18: identical body, events read
    WITHOUT the r19 ts-quarantine scan filter."""
    from pyspark.sql import functions as F

    from mapreduce_4sl08_spark.plans.base import cents, dollars
    from mapreduce_4sl08_spark.sources.tables import load_table
    e = load_table(spark, sf_dir, "events", quarantine=False)
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum(cents("value")).alias("_sv_c"))
        .select(F.col("w.start").alias("window_start"), "event_type",
                "n_events", dollars("_sv_c", "sum_value"))
        .orderBy("window_start", "event_type")
    )


def _r18_sessionize(spark, sf_dir):
    """events_sessionize as of r18: identical body (incl. the null-ts
    filter and finite cents), events read WITHOUT the quarantine."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from mapreduce_4sl08_spark.plans.base import cents, dollars
    from mapreduce_4sl08_spark.sources.tables import load_table
    e = load_table(spark, sf_dir, "events",
                   quarantine=False).filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc())
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts", 1).over(w))
    sessions = (
        e.withColumn("new_session",
                     F.when(gap.isNull() | (gap > 1800), 1).otherwise(0))
        .withColumn("session_seq", F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    )
    return (
        sessions.groupBy("user_id", "session_seq")
        .agg(F.min("ts").alias("session_start"),
             F.max("ts").alias("session_end"),
             F.count(F.lit(1)).alias("n_events"),
             F.sum(cents("value")).alias("_sv_c"))
        .select("user_id", "session_seq", "session_start", "session_end",
                "n_events", dollars("_sv_c", "sum_value"))
        .orderBy("user_id", "session_seq")
    )


def _r18_sort_multi(spark, sf_dir):
    """sort_customers_multi as of r18 == the CURRENT plan (customer is
    not a quarantined table; no r19 diff touched it). Identical-plan
    pair = the noise-floor sentinel."""
    from pyspark.sql import functions as F

    from mapreduce_4sl08_spark.plans.base import t
    c = t(spark, sf_dir, "customer")
    return (
        c.select("c_custkey", "c_mktsegment",
                 F.round("c_acctbal", 2).alias("c_acctbal"))
        .orderBy(F.col("c_mktsegment").asc(), F.col("c_acctbal").desc(),
                 F.col("c_custkey").asc())
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 7

    from mapreduce_4sl08_spark.plans import QUERIES
    from mapreduce_4sl08_spark.session import get_session

    spark = get_session()
    pairs = {
        "events_sessionize_vs_r16":
            (QUERIES["events_sessionize"].fn,
             _r16_sessionize),
        "events_user_features_vs_r16":
            (QUERIES["events_user_features"].fn,
             _r16_user_features),
        # r20 movers (VERDICT r19 item 5): the three rows elevated in
        # the r19 driver bench, vs their r18 forms
        "events_tumbling_hourly_vs_r18":
            (QUERIES["events_tumbling_hourly"].fn,
             _r18_tumbling),
        "events_sessionize_vs_r18":
            (QUERIES["events_sessionize"].fn,
             _r18_sessionize),
        "sort_customers_multi_vs_r18_noise_floor":
            (QUERIES["sort_customers_multi"].fn,
             _r18_sort_multi),
        # r21 (VERDICT r20 item 3): q6 read 0.633 s on the driver box vs
        # its 0.3 s per-query baseline — the only >=2x row on record.
        # Its plan is fingerprint-identical across those rounds, so the
        # pair is the IDENTICAL plan against itself: the spread
        # calibrates pure host noise, and the medians give q6's true
        # warm cost on this box for comparison against the baseline.
        "q6_forecast_revenue_identical_noise_floor":
            (QUERIES["q6_forecast_revenue"].fn,
             QUERIES["q6_forecast_revenue"].fn),
    }
    only = os.environ.get("AB_ONLY")
    if only:
        pairs = {k: v for k, v in pairs.items() if only in k}

    for name, (now_fn, r16_fn) in pairs.items():
        # warm-up both arms: codegen/Arrow init outside the measurement
        now_fn(spark, sf_dir).collect()
        r16_fn(spark, sf_dir).collect()
        now_t: list[float] = []
        r16_t: list[float] = []
        for r in range(rounds):
            # alternate arm order each round so drift cancels
            order = ((("now", now_fn), ("r16", r16_fn)) if r % 2 == 0
                     else (("r16", r16_fn), ("now", now_fn)))
            for label, fn in order:
                t0 = time.time()
                fn(spark, sf_dir).collect()
                dt = time.time() - t0
                (now_t if label == "now" else r16_t).append(dt)
            print(f"{name} round {r}: now={now_t[-1]:.3f}s "
                  f"r16={r16_t[-1]:.3f}s", flush=True)
        mn, m16 = statistics.median(now_t), statistics.median(r16_t)
        spread = max(max(now_t) - min(now_t), max(r16_t) - min(r16_t))
        print(f"{name}: median now={mn:.3f}s r16={m16:.3f}s "
              f"delta={mn - m16:+.3f}s spread={spread:.3f}s "
              f"-> {'NOISE (delta within spread)' if abs(mn - m16) <= spread else 'REAL GAP'}",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
