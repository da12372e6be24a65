"""Bucketed-table helpers: pre-shuffle data ONCE at write time so
repeated joins/aggregations on the bucket key run with zero exchanges.

This is the 100 TB answer to the reference's per-query hash shuffle
(/root/reference/src/WorkerNode.java:47-54 re-partitions every run): a
fact table bucketed by its join key is hash-partitioned on disk, and
every subsequent equi-join or groupBy on that key skips the shuffle
entirely (SortMergeJoin over pre-sorted buckets, no Exchange operator).
"""

from __future__ import annotations

import shutil
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession


def _drop_table_and_location(spark: SparkSession, table: str,
                             path: str | None = None) -> None:
    """DROP TABLE IF EXISTS plus orphan-location cleanup: the default
    catalog is per-session in-memory, so a table directory left by a
    previous session is invisible to DROP TABLE and would collide on the
    next write."""
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    if path is None:
        warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        path = f"{warehouse}/{table.lower()}"
    shutil.rmtree(path, ignore_errors=True)


def write_bucketed(df: DataFrame, table: str, bucket_col: str,
                   n_buckets: int = 8, sort: bool = True,
                   mode: str = "overwrite", path: str | None = None) -> None:
    """Persist as a bucketed (and bucket-sorted) table. Sorting within
    buckets lets SortMergeJoin skip its sort too. With ``path`` the data
    lands at an explicit location (external table) instead of the
    session warehouse — callers that must not write relative to the
    caller's cwd pin an absolute path."""
    if mode == "overwrite":
        _drop_table_and_location(df.sparkSession, table, path)
    writer = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  on: str, how: str = "inner",
                  force_sort_merge: bool = False) -> DataFrame:
    """Join two tables bucketed on the same key with the same bucket
    count — plans with NO Exchange (verify: test_bucketing.py).
    ``force_sort_merge`` pins the bucket-co-located SortMergeJoin even
    when one side is small enough to broadcast — the plan you would get
    at real scale, useful for demonstrations and plan tests."""
    left = spark.table(left_table)
    if force_sort_merge:
        left = left.hint("merge")
    return left.join(spark.table(right_table), on, how)
