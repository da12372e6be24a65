"""Custom Python DataSource (Spark 4 API): a deterministic synthetic
text-corpus generator — the reference's text-file source (S1,
/root/reference/src/MasterNode.java:64-66) generalized into a pluggable,
PARTITIONED connector: the driver never materializes data; each Spark
partition generates its own shard from (seed, partition_id).

Usage::

    spark.dataSource.register(SyntheticCorpusDataSource)
    df = (spark.read.format("synthetic_corpus")
          .option("n_docs", 1000).option("n_partitions", 8)
          .option("seed", 42).load())
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (
    IntegerType, LongType, StringType, StructField, StructType,
)

CORPUS_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("text", StringType()),
    StructField("n_tokens", IntegerType()),
])

_VOCAB = [
    "the", "a", "of", "data", "spark", "query", "join", "merge", "sort",
    "hash", "scan", "table", "row", "column", "batch", "stream", "window",
    "filter", "group", "agg", "vector", "key", "value", "order", "line",
]


class _Shard(InputPartition):
    def __init__(self, index: int, start: int, end: int, seed: int):
        self.index, self.start, self.end, self.seed = index, start, end, seed


class SyntheticCorpusReader(DataSourceReader):
    def __init__(self, options):
        self.n_docs = int(options.get("n_docs", 1000))
        self.n_partitions = int(options.get("n_partitions", 4))
        self.seed = int(options.get("seed", 42))

    def partitions(self):
        per = -(-self.n_docs // self.n_partitions)  # ceil
        return [
            _Shard(i, i * per, min((i + 1) * per, self.n_docs), self.seed)
            for i in range(self.n_partitions)
            if i * per < self.n_docs
        ]

    def read(self, partition: _Shard):
        # per-partition deterministic RNG: (seed, doc_id) → doc
        import random
        for doc_id in range(partition.start, partition.end):
            rng = random.Random(partition.seed * 1_000_003 + doc_id)
            n = rng.randint(20, 80)
            words = rng.choices(_VOCAB, k=n)
            yield doc_id, " ".join(words), n


class SyntheticCorpusDataSource(DataSource):
    @classmethod
    def name(cls):
        return "synthetic_corpus"

    def schema(self):
        return CORPUS_SCHEMA

    def reader(self, schema):
        return SyntheticCorpusReader(self.options)
