"""Text chunking via Python UDTF (Spark 4 user-defined table function) —
the 1→N row expansion shape used to split documents into overlapping
token-window chunks for embedding/training pipelines.

A UDTF (not explode-on-array) because real chunkers carry per-chunk
logic (sentence snapping, token budgets, metadata) that outgrows a
column expression; the UDTF keeps it vectorizable per-row with lazy row
emission. Deterministic: chunk i covers tokens [i*stride, i*stride+size).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.functions import udtf

CHUNK_SIZE = 50
CHUNK_STRIDE = 40  # 10-token overlap


@udtf(returnType="chunk_idx: int, chunk: string, n_chunk_tokens: int",
      useArrow=True)
class ChunkText:
    """split(text) → overlapping token windows."""

    def eval(self, text: str):
        if text is None:
            return
        # ASCII \s+, NOT str.split() (r16 unicode-census find): Python's
        # argless split treats ANY Unicode whitespace — NBSP U+00A0,
        # ideographic space — as a separator, while the repo-wide
        # tokenizer contract (functions.TOKEN_SPLIT_RE via Java regex,
        # and the DuckDB oracles via the spelled-out class
        # [ \t\n\x0b\f\r]+, since RE2's \s lacks \x0B) is ASCII
        # whitespace only. NBSP is routine in scraped web text, so the engines
        # disagreed on real-world chunk counts. The strip set is ASCII
        # too (r17, ADVICE r16 item 1): an argless .strip() eats a
        # leading NBSP / ideographic space that the splitter would
        # keep, so boundary and interior whitespace obeyed different
        # contracts; CHUNKING_SQL mirrors this exact trim set and the
        # empty-token filter.
        import re
        tokens = re.split(r"\s+", text.strip(" \t\n\r\f\v").lower(),
                          flags=re.ASCII)
        tokens = [t for t in tokens if t]
        if not tokens:
            return
        idx = 0
        start = 0
        while start < len(tokens):
            window = tokens[start:start + CHUNK_SIZE]
            yield idx, " ".join(window), len(window)
            idx += 1
            start += CHUNK_STRIDE


def chunk_documents(docs: DataFrame) -> DataFrame:
    """documents(doc_id, text) → (doc_id, chunk_idx, chunk, n_chunk_tokens)."""
    spark = docs.sparkSession
    spark.udtf.register("chunk_text", ChunkText)
    docs.createOrReplaceTempView("_chunk_input")
    return spark.sql("""
        SELECT doc_id, c.chunk_idx, c.chunk, c.n_chunk_tokens
        FROM _chunk_input, LATERAL chunk_text(text) AS c
    """)
