"""Sampling / row-identity operators for training-data pipelines.

- ``stratified_sample``: per-stratum fractions via DataFrame.sampleBy —
  Bernoulli per row, seed-deterministic, executor-local (no shuffle).
- ``with_row_ids``: globally-unique stable int64 ids without any shuffle:
  monotonically_increasing_id = (partition_id << 33) | row_in_partition.
  NOT consecutive — consecutive ids at 100 TB would need a total order
  (use ``with_consecutive_ids`` and pay the window/shuffle when required).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window
from pyspark.sql import functions as F


def stratified_sample(df: DataFrame, stratum_col: str,
                      fractions: dict, seed: int = 42) -> DataFrame:
    return df.sampleBy(stratum_col, fractions, seed)


def with_row_ids(df: DataFrame, col_name: str = "row_id") -> DataFrame:
    """Unique (not consecutive) int64 id per row; zero shuffles."""
    return df.withColumn(col_name, F.monotonically_increasing_id())


def with_consecutive_ids(df: DataFrame, order_by: list[str],
                         col_name: str = "row_id") -> DataFrame:
    """Consecutive 0-based ids in a deterministic order — needs a global
    sort (one range shuffle); only for outputs small enough to order."""
    w = Window.orderBy(*[F.col(c) for c in order_by])
    return df.withColumn(col_name, F.row_number().over(w) - 1)
