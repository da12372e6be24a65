"""Grouped-map operators: applyInPandas — the escape hatch for per-group
logic the built-in operators can't express (custom per-entity feature
extraction, model scoring, sequence features). Arrow-batched; each group
becomes one pandas DataFrame on an executor.

At 100 TB the contract that matters: groups must fit in executor memory
(they are materialized per group) — callers pick group keys with bounded
cardinality-per-key, or pre-reduce with built-ins first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType, LongType, StructField, StructType,
)

USER_FEATURES_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("n_events", LongType()),
    StructField("span_seconds", DoubleType()),
    StructField("mean_gap_seconds", DoubleType()),
    StructField("max_value_delta", DoubleType()),
])


def user_session_features(events: DataFrame) -> DataFrame:
    """Per-user sequential features that need the full ordered event
    sequence (gaps, deltas) — the canonical applyInPandas shape."""

    def features(pdf):
        import pandas as pd
        pdf = pdf.sort_values(["ts", "event_id"])
        ts = pdf["ts"].astype("int64") / 1e9
        n = len(pdf)
        span = float(ts.iloc[-1] - ts.iloc[0]) if n > 1 else 0.0
        deltas = pdf["value"].diff().abs().dropna()
        return pd.DataFrame({
            "user_id": [pdf["user_id"].iloc[0]],
            "n_events": [n],
            "span_seconds": [span],
            # closed form (== mean of consecutive gaps) — deterministic
            # across engines, no order-dependent float summation
            "mean_gap_seconds": [span / (n - 1) if n > 1 else 0.0],
            "max_value_delta": [float(deltas.max()) if len(deltas) else 0.0],
        })

    return (
        events.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandas(features, USER_FEATURES_SCHEMA)
    )
