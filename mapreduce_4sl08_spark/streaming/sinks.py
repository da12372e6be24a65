"""Streaming sinks beyond the built-ins: foreachBatch gives each
micro-batch to arbitrary batch-DataFrame code — the escape hatch for
sinks Spark lacks (upserts, multi-table writes, external stores).

``partitioned_batch_sink`` writes each micro-batch to its own
``batch_id=N`` subdirectory: exactly-once-per-batch by construction
(re-processing a batch overwrites the same directory — idempotent), and
the result is a normal readable partitioned parquet dataset.
"""

from __future__ import annotations

import os
from collections.abc import Callable

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


def jsonl_batch_writer(path: str, stream_id: str,
                       legacy_ids: tuple[str, ...] = (),
                       ) -> Callable[[DataFrame, int], None]:
    """Idempotent foreachBatch function for the jsonl_manifest sink —
    the exactly-once streaming contract across kill/restart.

    foreachBatch is at-least-once: if the process dies AFTER the sink's
    manifest commit but BEFORE the streaming checkpoint records the
    batch, the restart re-delivers the same (batch_id, data). The sink
    records every committed batch in its manifest, so the replay is
    detected here and skipped — manifest contents end up exactly-once
    regardless of where the crash landed:

    - crash before sink commit: only temp shards exist (invisible to the
      manifest-gated reader); the replay re-writes and commits them;
    - crash after sink commit: the batch is in the manifest; the replay
      is a no-op.

    ``stream_id`` scopes the recorded keys to ONE query lineage —
    micro-batch ids restart at 0 for every new checkpoint, so an
    unscoped guard would silently drop the early batches of any new
    query appending to a path a prior stream wrote (data loss). Use one
    stable id per (query, checkpoint) pair; ``jsonl_manifest_sink``
    derives it from the checkpoint location, which shares exactly the
    lifetime of the batch numbering it scopes.

    ``legacy_ids`` are alternate spellings of the SAME stream under
    prior id schemes (pre-r6 manifests recorded normpath-based ids;
    the current scheme is realpath-based). The guard takes the max mark
    over every spelling, so a stream whose checkpoint was recorded
    under an old spelling keeps its replay protection across the
    upgrade (ADVICE r6); new commits record under the current id, which
    migrates the stream forward naturally.
    """
    from ..sources.jsonl_sink import (
        JsonlManifestDataSource, last_committed_batch)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        # micro-batch ids are monotonic within one lineage and delivered
        # in order, so the manifest stores ONE high-water mark per
        # stream (bounded manifest; ADVICE r5) and any id at or below
        # it is a replay
        marks = [last_committed_batch(path, s)
                 for s in (stream_id, *legacy_ids)]
        marks = [m for m in marks if m is not None]
        last = max(marks) if marks else None
        if last is not None and batch_id <= last:
            return  # replay of a committed batch — exactly-once guard
        batch_df.sparkSession.dataSource.register(JsonlManifestDataSource)
        (batch_df.write.format("jsonl_manifest")
         .option("path", path).option("stream_id", stream_id)
         .option("batch_id", str(batch_id))
         .mode("append").save())

    return write_batch


def jsonl_manifest_sink(stream_df: DataFrame, path: str,
                        checkpoint: str,
                        query_name: str = "jsonl_sink") -> StreamingQuery:
    """Stream into the manifest-committed JSONL sink exactly-once:
    restartable from ``checkpoint``, idempotent under micro-batch replay
    (see jsonl_batch_writer; the replay-guard scope is the checkpoint
    location — same lifetime as the batch numbering). realpath, not
    normpath: the same checkpoint spelled differently across restarts
    (relative vs absolute, via symlink, different CWD) must map to ONE
    stream id, or the guard silently turns off for the crash-after-
    commit window (ADVICE r5). Manifests written before the realpath
    switch recorded normpath-spelled ids, so those spellings are passed
    as legacy ids — the guard takes the max mark over all of them
    (ADVICE r6: an upgraded stream must not lose its high-water mark)."""
    stream_id = os.path.realpath(checkpoint)
    legacy = tuple({os.path.normpath(checkpoint),
                    os.path.abspath(os.path.normpath(checkpoint))}
                   - {stream_id})
    return (
        stream_df.writeStream
        .foreachBatch(jsonl_batch_writer(path, stream_id, legacy))
        .queryName(query_name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
