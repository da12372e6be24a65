"""Bucketed-table helpers: pre-shuffle data ONCE at write time so
repeated joins/aggregations on the bucket key run with zero exchanges.

This is the 100 TB answer to the reference's per-query hash shuffle
(/root/reference/src/WorkerNode.java:47-54 re-partitions every run): a
fact table bucketed by its join key is hash-partitioned on disk, and
every subsequent equi-join or groupBy on that key skips the shuffle
entirely (SortMergeJoin over pre-sorted buckets, no Exchange operator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, bucket_col: str,
                   n_buckets: int = 8, sort: bool = True,
                   mode: str = "overwrite") -> None:
    """Persist as a bucketed (and bucket-sorted) managed table. Sorting
    within buckets lets SortMergeJoin skip its sort too."""
    writer = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  on: str, how: str = "inner") -> DataFrame:
    """Join two tables bucketed on the same key with the same bucket
    count — plans with NO Exchange (verify: test_bucketing.py)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
