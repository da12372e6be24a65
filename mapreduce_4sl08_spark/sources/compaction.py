"""Small-file compaction — the unglamorous op every long-running 100 TB
lake needs: streaming/incremental writers leave thousands of small files;
scans then pay per-file open cost and lose row-group locality.

``compact`` rewrites a parquet dataset to ~target-sized files using a
content-size estimate (not file count), preserving partitioning columns.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession


def estimate_bytes(spark: SparkSession, path: str) -> int:
    """Total on-disk bytes of a dataset directory (driver-side listing —
    metadata only, never data)."""
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def compact(spark: SparkSession, src: str, dst: str, *,
            target_file_bytes: int = 128 * 1024 * 1024,
            partition_by: list[str] | None = None) -> int:
    """Rewrite `src` parquet into `dst` with ≈target-sized output files.
    Returns the number of output partitions chosen. Uses repartition (full
    shuffle) rather than coalesce so output sizes are even — coalesce
    merges adjacent partitions and preserves skew."""
    n_parts = max(1, math.ceil(estimate_bytes(spark, src) / target_file_bytes))
    df = spark.read.parquet(src)
    writer = df.repartition(n_parts).write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(dst)
    return n_parts
