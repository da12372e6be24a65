"""Composed dirty-data (soup) contract through the STREAMING twins
(VERDICT r19 item 4): r19 proved the batch registry on the composed
all-classes-at-once fixture and each streaming contract in isolation
(non-finite values, ts-representability, null ts). This module composes
them on the STREAM side: ONE source carrying every corruption class at
once — NaN/+Inf/-Inf/-0.0/NULL measures, year-9999/year-1/NULL event
times, a duplicated event_id, and the full malformed + type-mismatched
+ numeric-coercion props battery — run through each stateful operator,
pinned equal to the same logic executed as one batch over the same
poisoned data (the batch arm reads THROUGH sources.tables.load_table,
the canonical quarantine choke point, so this is twin-equality against
real engine semantics, not a re-spelled filter).

Why it matters at 100 TB: real dirty data arrives composed — a NaN
measure in the same micro-batch as a year-9999 timestamp next to a
malformed props payload. Isolation censuses prove each contract alone;
a contract interaction (e.g. the ts quarantine reordering rows around
the watermark while a NaN row sits in window state) would only surface
here."""
import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from mapreduce_4sl08_spark.plans import QUERIES
from mapreduce_4sl08_spark.sources import load_table
from mapreduce_4sl08_spark.streaming import (
    events_stream,
    run_to_memory,
    stream_dedup_within_watermark,
    stream_session_window,
    stream_tumbling_counts,
)
from mapreduce_4sl08_spark.streaming.ops import (
    EVENTS_SCHEMA,
    stream_sliding_counts,
)

#: the composed props battery — the same classes the batch --soup and
#: --proptype censuses pin (malformed, valid-non-object, type-mismatch,
#: and the r20 numeric-coercion rows)
PROPS_SOUP = ['{"k":', "not json", None, '{"k": "abc"}', '{"k": [1]}',
              '{"k": " 20 "}', '{"k": 20.0}', '{"k": 1.5}', '{"k": true}']


@pytest.fixture(scope="module")
def soup_dirs(spark, sf_smoke_dir, tmp_path_factory):
    """(root, src): src is a µs-instant parquet events source = the
    full smoke event log + 17 dirty rows composing every class on
    in-range timestamps (so they land inside live windows/sessions,
    not just at the fringes); root is laid out so
    load_table(root, 'events') reads the identical poisoned data."""
    root = tmp_path_factory.mktemp("soup_stream")
    src = str(root / "events.parquet")
    base = load_table(spark, sf_smoke_dir, "events")
    max_ts = base.agg(F.max("ts")).collect()[0][0]
    mid = max_ts - dt.timedelta(hours=12)

    def ev(i, **kw):
        d = dict(event_id=10_000_000 + i, ts=mid + dt.timedelta(minutes=i),
                 user_id=7, event_type="view", value=1.0, props="{}")
        d.update(kw)
        return Row(**d)

    rows = [
        ev(0, value=float("nan")),
        ev(1, value=float("inf")),
        ev(2, value=float("-inf")),
        ev(3, value=-0.0),
        ev(4, value=None),
        ev(5, ts=dt.datetime(9999, 12, 31, 23, 59, 59)),   # quarantined
        ev(6, ts=dt.datetime(1, 1, 2, 0, 0)),              # quarantined
        ev(7, ts=None),                                    # null-ts contract
    ]
    rows += [ev(8 + j, props=p) for j, p in enumerate(PROPS_SOUP)]
    # identical-payload duplicate pair (same event_id, same ts — the
    # dup-key class; identical payloads isolate the dedup semantics)
    rows += [ev(90), ev(90)]
    dirty = spark.createDataFrame(rows, EVENTS_SCHEMA)
    base.unionByName(dirty).repartition(4).write.parquet(src)
    return str(root), src


def _finalized(df, max_ts, hours):
    col = "session_end" if "session_end" in df.columns else "window_start"
    return df.filter(F.col(col) <= F.lit(max_ts) - F.expr(
        f"INTERVAL {hours} HOURS"))


def test_soup_stream_tumbling_matches_batch_twin(spark, soup_dirs):
    root, src = soup_dirs
    got = run_to_memory(stream_tumbling_counts(events_stream(spark, src)),
                        "t_soup_tumbling")
    batch_df = load_table(spark, root, "events")
    want = stream_tumbling_counts(batch_df)  # watermark is a no-op in batch
    max_ts = batch_df.agg(F.max("ts")).collect()[0][0]
    got_rows = sorted(tuple(r) for r in _finalized(got, max_ts, 3).collect())
    want_rows = sorted(tuple(r) for r in _finalized(want, max_ts, 3).collect())
    assert got_rows == want_rows
    assert len(want_rows) > 100
    # the composed-dirt windows are present (not filtered to vacuity):
    # the soup rows' hour contributes its NaN/Inf/NULL-value events to
    # n_events while sum_value stays NULL-safe on both arms
    soup_hour = {r for r in want_rows
                 if r[0].year not in (1, 9999)
                 and abs((r[0] - max_ts).total_seconds()) < 13 * 3600}
    assert soup_hour
    years = {r[0].year for r in got_rows}
    assert max(years) < 2263 and min(years) > 1677


def test_soup_stream_sliding_matches_batch_twin(spark, soup_dirs):
    root, src = soup_dirs
    got = run_to_memory(stream_sliding_counts(events_stream(spark, src)),
                        "t_soup_sliding")
    batch_df = load_table(spark, root, "events")
    want = stream_sliding_counts(batch_df)
    max_ts = batch_df.agg(F.max("ts")).collect()[0][0]
    got_rows = sorted(tuple(r) for r in _finalized(got, max_ts, 3).collect())
    want_rows = sorted(tuple(r) for r in _finalized(want, max_ts, 3).collect())
    assert got_rows == want_rows
    assert len(want_rows) > 100


def test_soup_stream_session_window_matches_batch_twin(spark, soup_dirs):
    root, src = soup_dirs
    got = run_to_memory(stream_session_window(events_stream(spark, src)),
                        "t_soup_session")
    batch_df = load_table(spark, root, "events")
    want = stream_session_window(batch_df)
    max_ts = batch_df.agg(F.max("ts")).collect()[0][0]
    # finalized = watermark (2h) + gap (30m) + slack past the session end
    got_rows = sorted(tuple(r) for r in _finalized(got, max_ts, 4).collect())
    want_rows = sorted(tuple(r) for r in _finalized(want, max_ts, 4).collect())
    assert got_rows == want_rows
    assert len(want_rows) > 50
    # user 7's soup session exists and its sum ignored NaN/Inf/NULL
    # identically on both arms (value-equality already asserted above —
    # this pins non-vacuity of the composed-dirt session specifically)
    assert any(r[0] == 7 for r in want_rows)


def test_soup_stream_dedup_matches_batch_distinct(spark, soup_dirs):
    root, src = soup_dirs
    got = run_to_memory(
        stream_dedup_within_watermark(events_stream(spark, src)),
        "t_soup_dedup")
    # batch arm: distinct ids over the quarantined rows INCLUDING the
    # null-ts row — unlike windowed aggs, dropDuplicatesWithinWatermark
    # keeps null event times (the event-time column only governs state
    # eviction, not row admission; probed empirically r20)
    batch_ids = sorted(
        r.event_id for r in load_table(spark, root, "events")
        .select("event_id").distinct().collect())
    got_ids = sorted(r.event_id for r in got.select("event_id").collect())
    assert got_ids == batch_ids           # each id exactly once…
    assert 10_000_090 in got_ids          # …including ONE of the dup pair
    assert 10_000_005 not in got_ids      # year-9999 row quarantined
    assert 10_000_006 not in got_ids      # year-1 row quarantined
    assert 10_000_007 in got_ids          # null-ts row ADMITTED by dedup


def test_soup_stateful_running_stats_matches_batch(spark, soup_dirs):
    """applyInPandasWithState over the composed source: per-user state
    must survive NaN/Inf/-0.0/NULL values AND the ts quarantine in the
    same run — one +Inf row poisons every later micro-batch if finite()
    slips, one year-9999 row aborts the Arrow crossing if the source
    quarantine slips."""
    from mapreduce_4sl08_spark.plans.base import finite
    from mapreduce_4sl08_spark.streaming.ops import stream_running_user_stats

    root, src = soup_dirs
    out = run_to_memory(
        stream_running_user_stats(
            events_stream(spark, src, max_files_per_trigger=1)),
        "t_soup_stateful", output_mode="update")
    final = (out.groupBy("user_id")
             .agg(F.max("n_events_total").alias("n"),
                  F.max("value_total").alias("v")))
    batch = (load_table(spark, root, "events")
             .groupBy("user_id")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.round(F.coalesce(F.sum(finite("value")), F.lit(0.0)),
                          2).alias("v")))
    got = {(r.user_id, r.n, round(r.v, 1)) for r in final.collect()}
    want = {(r.user_id, r.n, round(r.v, 1)) for r in batch.collect()}
    assert got == want


def test_soup_stream_transition_counts_match_batch_twin(spark, soup_dirs):
    """The carried-last-event-type operator (applyInPandasWithState)
    over three time-ordered files of the composed source must equal the
    registry batch twin pointed at the same poisoned root — the batch
    arm goes through load_table AND the oracle-checked plan, so the
    stream inherits the full quarantine/null-ts contract stack."""
    import os
    import time

    from mapreduce_4sl08_spark.streaming.ops import stream_transition_counts

    root, src = soup_dirs
    chunks = os.path.join(root, "ordered")
    os.makedirs(chunks, exist_ok=True)
    raw = spark.read.parquet(src)
    ev = raw.orderBy(F.col("ts").asc_nulls_first(), "event_id").collect()
    third = (len(ev) + 2) // 3
    for i in range(3):
        chunk = ev[i * third:(i + 1) * third]
        if not chunk:
            continue
        (spark.createDataFrame(chunk, raw.schema)
         .coalesce(1).write.mode("overwrite")
         .parquet(f"{chunks}/chunk{i}"))
        time.sleep(1.1)  # distinct mtimes -> FileStreamSource batch order
    got = (run_to_memory(
        stream_transition_counts(events_stream(spark, f"{chunks}/chunk*")),
        "t_soup_transitions", output_mode="update")
        .groupBy("from_type", "to_type").agg(F.sum("n").alias("n")))
    want = (QUERIES["events_transition_matrix"].fn(spark, root)
            .select("from_type", "to_type", "n"))
    got_rows = {(r.from_type, r.to_type): r.n for r in got.collect()}
    want_rows = {(r.from_type, r.to_type): r.n for r in want.collect()}
    assert got_rows == want_rows
    assert sum(want_rows.values()) > 100


def test_soup_stream_ema_matches_sequential_fold(spark, soup_dirs):
    """transformWithStateInPandas EMA over the composed source equals a
    sequential fold over the quarantined, time-ordered log (non-finite
    and NULL values fold nothing). Env-gated like the clean-data EMA
    test: requires protobuf (Spark's state-server protocol)."""
    pytest.importorskip("google.protobuf")
    import math
    import os
    import time

    from mapreduce_4sl08_spark.streaming.ops import stream_user_value_ema

    root, src = soup_dirs
    events = load_table(spark, root, "events").filter(F.col("ts").isNotNull())
    median_us = events.agg(
        F.expr("percentile(unix_micros(ts), 0.5)")).collect()[0][0]
    ordered_src = os.path.join(root, "ema_src")
    events.filter(F.unix_micros("ts") <= median_us).coalesce(1).write.mode(
        "append").parquet(ordered_src)
    time.sleep(1.1)
    events.filter(F.unix_micros("ts") > median_us).coalesce(1).write.mode(
        "append").parquet(ordered_src)
    out = run_to_memory(
        stream_user_value_ema(
            spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", 1).parquet(ordered_src)),
        "t_soup_ema", output_mode="update")
    final = {r.user_id: (r.n_seen, r.ema)
             for r in out.orderBy("n_seen").collect()}
    alpha, want = 0.3, {}
    for r in events.orderBy("ts", "event_id").collect():
        ema, n = want.get(r.user_id, (None, 0))
        if r.value is None or not math.isfinite(float(r.value)):
            continue
        v = float(r.value)
        ema = v if ema is None else alpha * v + (1 - alpha) * ema
        want[r.user_id] = (ema, n + 1)
    assert set(final) == set(want)
    for uid, (n_seen, ema) in final.items():
        w_ema, w_n = want[uid]
        assert n_seen == w_n and abs(ema - w_ema) < 1e-9, uid
