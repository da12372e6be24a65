"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship query (the whole reference engine as one
Spark query) at sf0.001; ``queries``/``oracle_sql`` expose the full
operator inventory from mapreduce_4sl08_spark.plans (one entry per
implemented operator from SURVEY.md §2 / §7).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mapreduce_4sl08_spark.plans import QUERIES, oracle_sqls, query_fns
from mapreduce_4sl08_spark.session import apply_engine_conf

SF_SMOKE_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: reference-parity word count (SURVEY §2.3) over
    documents.text at sf0.001."""
    apply_engine_conf(spark)
    return QUERIES["wordcount_documents"].fn(spark, SF_SMOKE_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return query_fns()


def oracle_sql() -> dict[str, str]:
    return oracle_sqls()
