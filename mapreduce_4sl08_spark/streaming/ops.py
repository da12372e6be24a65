"""Structured Streaming operators (SURVEY §7.3.1).

The reference is batch-only; this is the extended surface: file-source
streams over the `events` table shape, tumbling/sliding windowed
aggregation with watermarks for late data, session windows, and stateful
dedup within a watermark. The batch twins in ``plans/events.py`` define
the oracle-checked semantics; these run the same logic incrementally.

At scale: watermarks bound state; shuffle keys are (window, group);
`availableNow` gives reproducible batch-backfill runs of the same code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.base import cents, dollars
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType, TimestampType,
)

EVENTS_SCHEMA = StructType([
    StructField("event_id", LongType()),
    StructField("ts", TimestampType()),
    StructField("user_id", LongType()),
    StructField("event_type", StringType()),
    StructField("value", DoubleType()),
    StructField("props", StringType()),
])


def events_stream(spark: SparkSession, path: str,
                  max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source stream with the events schema (parquet dir). The ts
    column must already be microsecond timestamps (use
    sources.tables.load_table + a re-write for the raw nanos testdata —
    see tests/test_streaming.py).

    Applies the same ts-representability quarantine as the batch choke
    point (sources.tables.load_table, r19): one year-9999 record would
    otherwise poison the Arrow crossing inside every stateful pandas
    operator mid-stream — and the streaming twins must see exactly the
    rows their batch twins see, or equality-to-batch breaks on dirty
    sources. NULL ts stays (watermark operators drop it themselves,
    per the r17 null-ts contract).

    The bounds are epoch-µs instants (timestamp_micros), NOT
    ``TIMESTAMP '<wall>'`` literals (ADVICE r19 item 3): a session-tz
    literal is re-interpreted per session, so a non-UTC session would
    shift this boundary relative to the batch choke point — which
    filters the raw NTZ/ns columns with representation-matched bounds
    (sources/tables.load_table) — and rows near the window edge would
    split stream-vs-batch. Instants are session-invariant; this stream
    schema's ts is instant-typed (the pre-converted µs rewrite), so
    the comparison is exact in any timezone."""
    from ..sources.tables import ts_window_us
    lo_us, hi_us = ts_window_us()
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path).filter(
        F.col("ts").isNull()
        | F.col("ts").between(F.timestamp_micros(F.lit(lo_us)),
                              F.timestamp_micros(F.lit(hi_us))))


def stream_tumbling_counts(events: DataFrame,
                           watermark: str = "2 hours",
                           window: str = "1 hour") -> DataFrame:
    """Watermarked tumbling-window agg — the streaming form of
    plans/events.events_tumbling_hourly. Late rows beyond the watermark
    are dropped; state is bounded by watermark horizon × groups."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        # exact-cents sum, mirroring the batch twin (plans/base.py
        # block) — long partials are also the natural incremental
        # state shape for a watermarked agg
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum(cents("value")).alias("_sv_c"))
        .select(F.col("w.start").alias("window_start"), "event_type",
                "n_events", dollars("_sv_c", "sum_value"))
    )


def stream_sliding_counts(events: DataFrame,
                          watermark: str = "2 hours") -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


def stream_session_window(events: DataFrame,
                          gap: str = "30 minutes",
                          watermark: str = "2 hours") -> DataFrame:
    """Native session windows (dynamic gap-merged state) — the streaming
    form of the gaps-and-islands batch twin plans/events.events_sessionize."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum(cents("value")).alias("_sv_c"))
        .select("user_id", F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"), "n_events",
                dollars("_sv_c", "sum_value"))
    )


def stream_windowed_topk_counts(events: DataFrame,
                                watermark: str = "2 hours",
                                window: str = "1 hour") -> DataFrame:
    """Watermarked windowed counts feeding a per-window TOP-K sink — the
    streaming form of plans/events.events_windowed_topk. Ranking is not
    incrementally maintainable, but in append mode a window's rows emit
    exactly once, together, when the watermark finalizes it — so ranking
    each emitted micro-batch (rank_topk_batch below, via foreachBatch)
    is exact: finalized windows are immutable."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )


def rank_topk_batch(batch_df: DataFrame, k: int = 2) -> DataFrame:
    """foreachBatch companion of stream_windowed_topk_counts: rank the
    finalized windows in one emitted batch (complete per window by
    append-mode construction)."""
    from pyspark.sql import Window
    w = Window.partitionBy("window_start").orderBy(
        F.col("n").desc(), F.col("event_type").asc())
    return (
        batch_df.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("window_start", "rk", "event_type", "n")
    )


def stream_dedup_within_watermark(events: DataFrame,
                                  watermark: str = "2 hours") -> DataFrame:
    """Stateful exact dedup on event_id with bounded state:
    dropDuplicatesWithinWatermark keeps state only for the watermark
    horizon — the only sane form at 100 TB/day event volumes."""
    return (
        events.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["event_id"])
    )


def stream_stream_purchase_attribution(events: DataFrame,
                                       horizon: str = "1 hour") -> DataFrame:
    """Stream-stream inner join with event-time bounds: attribute each
    purchase to same-user views within the preceding `horizon`. Both
    sides carry watermarks so the join state is bounded (views older
    than purchase_wm - horizon are evicted) — the only viable
    stream-stream join shape at scale."""
    views = (
        events.filter(F.col("event_type") == "view")
        .select(F.col("user_id").alias("v_user_id"),
                F.col("event_id").alias("view_id"),
                F.col("ts").alias("view_ts"))
        .withWatermark("view_ts", "2 hours")
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("p_user_id"),
                F.col("event_id").alias("purchase_id"),
                F.col("ts").alias("purchase_ts"))
        .withWatermark("purchase_ts", "2 hours")
    )
    return purchases.join(
        views,
        F.expr(f"""
            p_user_id = v_user_id AND
            view_ts <= purchase_ts AND
            view_ts >= purchase_ts - INTERVAL {horizon}
        """),
        "inner",
    ).select("purchase_id", "view_id",
             F.col("p_user_id").alias("user_id"), "purchase_ts", "view_ts")


RUNNING_STATS_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("n_events_total", LongType()),
    StructField("value_total", DoubleType()),
    StructField("batch_events", LongType()),
])

_RUNNING_STATE_SCHEMA = StructType([
    StructField("n", LongType()),
    StructField("total", DoubleType()),
])


def stream_running_user_stats(events: DataFrame,
                              watermark: str = "2 hours") -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user
    running totals that survive across micro-batches (the arbitrary-state
    API — for logic that windowed aggs can't express, e.g. monotone
    counters, custom sessionization, model state).

    State is one (n, total) pair per user — O(users) bounded state; at
    scale the shuffle key is user_id and state lives in the state store
    partition-local to the key.

    Non-finite contract (r18, plans/base.py finite()): a NaN/±Inf value
    contributes NOTHING to the running total — same as a NULL measure.
    pandas' skipna already dropped NaN (and NULL-as-NaN) silently, but
    +Inf poisoned the state FOREVER (inf + x = inf across every later
    batch — state poison is worse than batch poison); the explicit
    finite mask pins one rule for all three classes, matching the
    batch twin's F.sum(finite(value))."""

    def update(key, pdfs, state):
        import numpy as np
        import pandas as pd
        n, total = state.get if state.exists else (0, 0.0)
        batch_n = 0
        for pdf in pdfs:
            batch_n += len(pdf)
            n += len(pdf)
            v = pdf["value"].to_numpy()
            total += float(v[np.isfinite(v)].sum())
        state.update((n, total))
        yield pd.DataFrame({
            "user_id": [key[0]],
            "n_events_total": [n],
            "value_total": [round(total, 2)],
            "batch_events": [batch_n],
        })

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=RUNNING_STATS_SCHEMA,
            stateStructType=_RUNNING_STATE_SCHEMA,
            outputMode="update",
            timeoutConf="NoTimeout",
        )
    )


EMA_OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("ema", DoubleType()),
    StructField("n_seen", LongType()),
])


def stream_user_value_ema(events: DataFrame, alpha: float = 0.3) -> DataFrame:
    """Custom stateful operator on the transformWithStateInPandas API
    (the arbitrary-state v2 successor to applyInPandasWithState):
    per-user exponential moving average of `value`, state carried across
    micro-batches in a typed ValueState. Rows within a batch are applied
    in (ts, event_id) order so the fold is deterministic.

    NOTE: this API needs `protobuf` at runtime (Spark's state-server
    protocol), which this container does not ship — the test skips when
    protobuf is absent. ``stream_running_user_stats``
    (applyInPandasWithState) is the dependency-free arbitrary-state path.
    """
    try:
        import google.protobuf  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "transformWithStateInPandas requires the protobuf package") from e
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
    import pandas as pd

    class EmaProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "ema_state",
                StructType([StructField("ema", DoubleType()),
                            StructField("n", LongType())]))

        def handleInputRows(self, key, rows, timerValues):
            import math
            ema, n = (self._state.get() if self._state.exists() else (None, 0))
            for pdf in rows:
                pdf = pdf.sort_values(["ts", "event_id"])
                for v in pdf["value"]:
                    v = float(v)
                    # non-finite contract (r18): a NaN/±Inf (or NULL →
                    # NaN) value folds NOTHING — one dirty row would
                    # otherwise poison the EMA state for the rest of
                    # the stream. n_seen counts FOLDED values, so the
                    # reported (ema, n) pair stays self-consistent.
                    if not math.isfinite(v):
                        continue
                    ema = v if ema is None else alpha * v + (1 - alpha) * ema
                    n += 1
            self._state.update((ema, n))
            yield pd.DataFrame({"user_id": [key[0]], "ema": [ema], "n_seen": [n]})

        def close(self) -> None:
            pass

    # null-ts rows are excluded like the transition operator's (r20):
    # the fold is ts-ordered, and pandas sorts NaT LAST within a batch
    # where the batch oracle orders nulls first — one null-ts row with
    # a live value would silently reorder the fold on dirty sources
    return (
        events.filter(F.col("ts").isNotNull())
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=EmaProcessor(),
            outputStructType=EMA_OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


def run_to_memory(stream_df: DataFrame, name: str,
                  output_mode: str = "append") -> DataFrame:
    """Execute a streaming query to completion over currently-available
    data (availableNow trigger) into an in-memory table; returns the
    result as a batch DataFrame. Test/backfill harness."""
    q = (
        stream_df.writeStream
        .format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(name)


TRANSITION_OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("from_type", StringType()),
    StructField("to_type", StringType()),
    StructField("n", LongType()),
])

_TRANSITION_STATE_SCHEMA = StructType([
    StructField("last_type", StringType()),
])


def stream_transition_counts(events: DataFrame,
                             watermark: str = "2 hours") -> DataFrame:
    """Per-user first-order transition counts (streaming twin of
    events_transition_matrix's count relation) via
    applyInPandasWithState: state is one carried last-event-type per
    user, so transitions spanning micro-batch boundaries are counted
    exactly once.

    Ordering contract: sequence operators need per-user event-time
    order ACROSS batches (within a batch rows are sorted here on
    (ts, event_id)); the caller feeds time-ordered files — the same
    contract a production deployment meets with ordered log segments
    plus allowed-lateness reorder buffering upstream. State is O(users)
    and partition-local to the user_id shuffle key.

    Null-ts rows are excluded EXPLICITLY (r20, found by the composed
    soup twin test): a transition is ordered by ts, so the batch twin
    (plans/events.events_transition_matrix) drops them — but a
    watermark does NOT drop null event times from a stateful operator
    (it only governs state eviction; probed empirically on
    dropDuplicatesWithinWatermark and applyInPandasWithState), so
    without the filter one null-ts row adds a phantom transition and
    splits stream from batch on dirty sources."""

    def update(key, pdfs, state):
        import pandas as pd
        pdf = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        types = pdf["event_type"].tolist()
        seq = ([state.get[0]] if state.exists else []) + types
        counts: dict = {}
        for a, b in zip(seq, seq[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + 1
        state.update((types[-1],))
        if counts:
            yield pd.DataFrame({
                "user_id": [key[0]] * len(counts),
                "from_type": [a for a, _ in counts],
                "to_type": [b for _, b in counts],
                "n": list(counts.values()),
            })

    return (
        events.filter(F.col("ts").isNotNull())
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=TRANSITION_OUTPUT_SCHEMA,
            stateStructType=_TRANSITION_STATE_SCHEMA,
            outputMode="update",
            timeoutConf="NoTimeout",
        )
    )


def stream_daily_type_counts(events: DataFrame,
                             watermark: str = "2 hours") -> DataFrame:
    """Watermarked 1-day tumbling counts per event type — the streaming
    half of plans/events.event_type_share_drift. Traffic SHARES need
    every type's count for the day (cross-group normalization), which a
    single streaming aggregation cannot express; the contract is the
    standard split: this agg maintains the incremental per-(day, type)
    state, and :func:`daily_shares_from_counts` normalizes each
    finalized day downstream (foreachBatch / the batch sink)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("day"), "event_type", "n")
    )


def daily_shares_from_counts(counts: DataFrame) -> DataFrame:
    """Exact e6 traffic shares from a (day, event_type, n) relation —
    the normalization step applied to finalized streaming output; the
    identical expression the batch twin uses, so stream + normalize ==
    batch."""
    from pyspark.sql import Window as W
    return counts.withColumn(
        "share_e6",
        F.expr("n * 1000000 div sum(n) over (partition by day)"))
