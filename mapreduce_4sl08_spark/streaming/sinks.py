"""Streaming sinks beyond the built-ins: foreachBatch gives each
micro-batch to arbitrary batch-DataFrame code — the escape hatch for
sinks Spark lacks (upserts, multi-table writes, external stores).

``partitioned_batch_sink`` writes each micro-batch to its own
``batch_id=N`` subdirectory: exactly-once-per-batch by construction
(re-processing a batch overwrites the same directory — idempotent), and
the result is a normal readable partitioned parquet dataset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def partitioned_batch_sink(stream_df: DataFrame, path: str,
                           query_name: str = "batch_sink") -> StreamingQuery:
    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{path}/batch_id={batch_id}")

    return (
        stream_df.writeStream
        .foreachBatch(write_batch)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
