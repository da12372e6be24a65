"""Multimodal-column operators.

Pattern (SURVEY §7.3): an opaque ``payload: binary`` column plus a typed
``meta: struct`` column; all per-item work (decode, feature extraction,
resize, frame sampling) runs as Arrow-batched ``mapInPandas`` so bytes
move columnar and Python touches them once per batch, never per row.

The actual image/audio/video codecs are NOT in this container, so the
codec call is isolated in ``_decode_payload`` — a deterministic byte-level
stand-in (length + md5). Replacing it with PIL / soundfile / PyAV is a
one-function change; everything Spark-side (schema, batch shape,
partitioning) is the production configuration and is tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType,
)

DECODE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("mime", StringType()),
    StructField("n_bytes", LongType()),
    StructField("content_md5", StringType()),
])


def _decode_payload(payload: bytes) -> dict:
    """CODEC STUB — deterministic byte-level features. Swap this body for
    a real decoder (e.g. PIL.Image.open(io.BytesIO(payload))) when the
    codec libraries are available; callers are unaffected."""
    return {
        "n_bytes": len(payload),
        "content_md5": hashlib.md5(payload).hexdigest(),
    }


def decode_features(blobs: DataFrame) -> DataFrame:
    """(doc_id, payload binary, meta struct<mime,...>) → per-item features
    via Arrow-batched mapInPandas."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_decode_payload(p) for p in pdf["payload"]]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].values,
                "mime": [m["mime"] for m in pdf["meta"]],
                "n_bytes": [f["n_bytes"] for f in feats],
                "content_md5": [f["content_md5"] for f in feats],
            })

    return blobs.mapInPandas(decode_batches, DECODE_SCHEMA)


def frame_sample(blobs: DataFrame, every_n: int = 10) -> DataFrame:
    """Video-style frame sampling STUB: emits one row per sampled "frame"
    index derived from payload length (stand-in for container demuxing).
    Exercises the 1→N mapInPandas fan-out shape used for real frame
    extraction."""
    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_md5", StringType()),
    ])

    def sample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_idx, out_md5 = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = max(len(payload) // 100, 1)  # fake demux
                for i in range(0, n_frames, every_n):
                    chunk = payload[i * 100:(i + 1) * 100]
                    out_ids.append(doc_id)
                    out_idx.append(i)
                    out_md5.append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame({"doc_id": out_ids, "frame_idx": out_idx,
                                "frame_md5": out_md5})

    return blobs.mapInPandas(sample_batches, schema)
