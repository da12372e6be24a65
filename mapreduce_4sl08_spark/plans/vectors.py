"""Similarity-search and multimodal plans over `embeddings` / `documents`.

- Brute-force cosine top-k: the exactness baseline. JVM-side arithmetic
  (zip_with/aggregate) — no Python in the hot path; the probe side is
  broadcast so the big side never shuffles.
- LSH-bucketed ANN (random hyperplanes, deterministic md5-derived signs):
  the scale path — candidates only within matching sign-buckets.
- Multimodal: binary payload + typed metadata; decode/feature-extract runs
  as an Arrow-batched mapInPandas (the real 100 TB shape); the image/audio
  codec itself is stubbed (not in this container) behind a deterministic
  byte-level "decoder".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window
from pyspark.sql.functions import broadcast

from ..functions import cosine, dot, l2_norm
from .base import QuerySpec, t

_N_PROBES = 5   # vec_id < 5 are the probe vectors
_TOP_K = 5

# ------------------------------------------------------------ brute force


def knn_bruteforce_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k of every probe vs the whole table (self excluded).
    Probe side is tiny → broadcast; the scan side streams, no shuffle until
    the final per-probe top-k (TakeOrdered per group via row_number)."""
    e = t(spark, sf_dir, "embeddings")
    probes = e.filter(F.col("vec_id") < _N_PROBES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"))
    cand = e.select("vec_id", "embedding")
    scored = (
        broadcast(probes).crossJoin(cand)
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", "vec_id",
            cosine(F.col("q_emb"), F.col("embedding")).alias("sim_exact"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim_exact").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _TOP_K)
        .select("query_id", "rk", "vec_id", F.round("sim_exact", 4).alias("cos_sim"))
        .orderBy("query_id", "rk")
    )


KNN_SQL = f"""
WITH probes AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS q_emb
  FROM embeddings WHERE vec_id < {_N_PROBES}
),
scored AS (
  SELECT p.query_id, e.vec_id,
         list_dot_product(p.q_emb, e.embedding::DOUBLE[])
           / (sqrt(list_dot_product(p.q_emb, p.q_emb))
              * sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))) AS sim_exact
  FROM probes p, embeddings e
  WHERE e.vec_id <> p.query_id
),
ranked AS (
  SELECT query_id, vec_id, sim_exact,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY sim_exact DESC, vec_id ASC) AS rk
  FROM scored
)
SELECT query_id, CAST(rk AS INT) AS rk, vec_id, ROUND(sim_exact, 4) AS cos_sim
FROM ranked
WHERE rk <= {_TOP_K}
ORDER BY query_id, rk
"""

# ------------------------------------------------------------ LSH-bucketed ANN
# Random-hyperplane LSH (Charikar, STOC 2002) without any random state:
# hyperplane b's weight for dimension d is +1/-1 from a bit of md5(b:d).
# Deterministic in both engines → oracle-checkable, and at scale the
# bucket key prunes the candidate set before any pairwise work.

_N_PLANES = 6
_EMB_DIM = 64


def _plane_sign_spark(b: int, d: int) -> int:
    # computed at plan-build time in Python; same value the SQL computes
    import hashlib
    h = hashlib.md5(f"{b}:{d}".encode()).hexdigest()
    return 1 if int(h[0], 16) < 8 else -1


def lsh_bucket_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN: probe vs candidates sharing the same hyperplane sign-bucket.
    Output: per probe, matches found in its bucket with exact cosine —
    recall<1 by design (that's the ANN trade: bucket prune, then exact
    rerank inside the bucket)."""
    e = t(spark, sf_dir, "embeddings")

    def bucket_col(emb):
        bits = []
        for b in range(_N_PLANES):
            proj = None
            for d in range(_EMB_DIM):
                term = emb[d].cast("double") * F.lit(float(_plane_sign_spark(b, d)))
                proj = term if proj is None else proj + term
            bits.append(F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))
        return F.concat(*bits)

    tagged = e.select("vec_id", "embedding", bucket_col(F.col("embedding")).alias("bucket"))
    probes = tagged.filter(F.col("vec_id") < _N_PROBES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"),
        F.col("bucket").alias("q_bucket"))
    scored = (
        broadcast(probes)
        .join(tagged, (F.col("bucket") == F.col("q_bucket"))
              & (F.col("vec_id") != F.col("query_id")))
        .select("query_id", "vec_id",
                cosine(F.col("q_emb"), F.col("embedding")).alias("sim_exact"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim_exact").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _TOP_K)
        .select("query_id", "rk", "vec_id", F.round("sim_exact", 4).alias("cos_sim"))
        .orderBy("query_id", "rk")
    )


def _lsh_sql() -> str:
    import hashlib

    def sign(b, d):
        h = hashlib.md5(f"{b}:{d}".encode()).hexdigest()
        return 1.0 if int(h[0], 16) < 8 else -1.0

    bits = []
    for b in range(_N_PLANES):
        terms = " + ".join(f"({sign(b, d)}) * emb[{d + 1}]" for d in range(_EMB_DIM))
        bits.append(f"CASE WHEN {terms} >= 0 THEN '1' ELSE '0' END")
    bucket_expr = " || ".join(bits)
    return f"""
WITH tagged AS (
  SELECT vec_id, embedding::DOUBLE[] AS emb,
         {bucket_expr} AS bucket
  FROM embeddings
),
probes AS (
  SELECT vec_id AS query_id, emb AS q_emb, bucket AS q_bucket
  FROM tagged WHERE vec_id < {_N_PROBES}
),
scored AS (
  SELECT p.query_id, c.vec_id,
         list_dot_product(p.q_emb, c.emb)
           / (sqrt(list_dot_product(p.q_emb, p.q_emb))
              * sqrt(list_dot_product(c.emb, c.emb))) AS sim_exact
  FROM probes p JOIN tagged c
    ON c.bucket = p.q_bucket AND c.vec_id <> p.query_id
),
ranked AS (
  SELECT query_id, vec_id, sim_exact,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY sim_exact DESC, vec_id ASC) AS rk
  FROM scored
)
SELECT query_id, CAST(rk AS INT) AS rk, vec_id, ROUND(sim_exact, 4) AS cos_sim
FROM ranked
WHERE rk <= {_TOP_K}
ORDER BY query_id, rk
"""


LSH_ANN_SQL = _lsh_sql()

# ------------------------------------------------------------ vector norms


def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label vector statistics — array arithmetic fully JVM-side."""
    e = t(spark, sf_dir, "embeddings")
    return (
        e.select("label", l2_norm(F.col("embedding")).alias("norm"),
                 dot(F.col("embedding"), F.col("embedding")).alias("sq"))
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n_vecs"),
             F.round(F.avg("norm"), 4).alias("avg_norm"),
             F.round(F.max("sq"), 4).alias("max_sq_norm"))
        .orderBy("label")
    )


EMB_NORMS_SQL = """
SELECT label,
       COUNT(*) AS n_vecs,
       ROUND(AVG(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))), 4) AS avg_norm,
       ROUND(MAX(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 4) AS max_sq_norm
FROM embeddings
GROUP BY label
ORDER BY label
"""

# ------------------------------------------------------------ multimodal


def multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal-column plumbing, end to end and REAL except the codec:
    text → binary payload column + typed metadata struct, then an
    Arrow-batched mapInPandas "decode" computing byte-level features
    (length + md5). Swapping the stub body for PIL/ffmpeg decode is a
    one-function change; schema, batching and partitioning are the
    production shape. See operators/multimodal.py for the general op.
    """
    from ..operators.multimodal import decode_features

    d = t(spark, sf_dir, "documents")
    blobs = d.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.length(F.col("text")).alias("n_chars"),
        ).alias("meta"),
    )
    return decode_features(blobs).orderBy("doc_id")


MULTIMODAL_SQL = """
SELECT doc_id,
       'text/plain' AS mime,
       octet_length(encode(text)) AS n_bytes,
       md5(text) AS content_md5
FROM documents
ORDER BY doc_id
"""


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling (1→N mapInPandas fan-out): payload →
    sampled frame rows. The demux is a byte-chunk stub (no codecs in
    this container); the fan-out plumbing is the production shape. The
    oracle reproduces the byte arithmetic in SQL (documents are ASCII,
    so byte slices == char slices)."""
    from ..operators.multimodal import frame_sample

    d = t(spark, sf_dir, "documents")
    blobs = d.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))
    return frame_sample(blobs, every_n=10).orderBy("doc_id", "frame_idx")


FRAME_SAMPLE_SQL = """
WITH f AS (
  SELECT doc_id, text, GREATEST(length(text) // 100, 1) AS n_frames
  FROM documents
)
SELECT doc_id, i AS frame_idx,
       md5(substr(text, i * 100 + 1, 100)) AS frame_md5
FROM f, UNNEST(range(0, n_frames, 10)) AS u(i)
ORDER BY doc_id, frame_idx
"""


SPECS: list[QuerySpec] = [
    QuerySpec("knn_bruteforce_cosine", knn_bruteforce_cosine, KNN_SQL,
              "exact cosine top-k, broadcast probes, JVM-side math"),
    QuerySpec("multimodal_frame_sample", multimodal_frame_sample, FRAME_SAMPLE_SQL,
              "1→N frame-sampling fan-out via mapInPandas (stub demux)"),
    QuerySpec("lsh_bucket_ann", lsh_bucket_ann, LSH_ANN_SQL,
              "ANN via deterministic random-hyperplane buckets"),
    QuerySpec("embedding_norms", embedding_norms, EMB_NORMS_SQL,
              "vector arithmetic aggregates"),
    QuerySpec("multimodal_decode_stub", multimodal_decode_stub, MULTIMODAL_SQL,
              "binary payload + metadata + Arrow mapInPandas decode (stub codec)"),
]
