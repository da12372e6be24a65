"""Query-registry plumbing.

Each implemented operator from SURVEY §2 is exposed as a named QuerySpec:
a Spark plan builder ``(spark, sf_dir) -> DataFrame`` plus (where
SQL-expressible) the ANSI-SQL oracle string DuckDB runs on the same parquet
tables. The driver hash-compares the two at sf0.01 (CORRECTNESS_r{N}.json).

Conventions that make hash-matching deterministic (SURVEY §5.2.2):
- every computed column is explicitly aliased, identically in both engines;
- every query ends in an ORDER BY over a unique key;
- float aggregates are rounded (2-4 dp) in BOTH engines before comparison.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from ..sources import load_table


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    doc: str = ""


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Shorthand table loader used by every plan builder."""
    return load_table(spark, sf_dir, name)
