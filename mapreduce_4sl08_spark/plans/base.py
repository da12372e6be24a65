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


class SessionMemo(dict):
    """Materialized-view memo for iterative/multi-consumer intermediates
    (shingle index, near-dup pairs, CC labels, co-purchase edges,
    pagerank), keyed by tuples whose FIRST element is the owning
    SparkContext's applicationId.

    Eviction (VERDICT r5 item 4): only one SparkContext can be live per
    Python process, so on every access any entry keyed by a DIFFERENT
    applicationId belongs to a stopped context — its persisted /
    checkpointed blocks died with the executors and the DataFrame handle
    is unusable. Dropping those entries bounds the memo to the live
    application's working set no matter how many sessions a long-lived
    harness process cycles. (Multiple SparkSessions over ONE context
    share an applicationId and still share the memo, as intended.)

    Contract: callers always mint keys from the LIVE session
    (``spark.sparkContext.applicationId``) — the sweep trusts the
    accessed key's app id to identify the living application.
    """

    def _sweep(self, app_id: str) -> None:
        for k in [k for k in self if k[0] != app_id]:
            super().pop(k, None)

    def get(self, key, default=None):
        self._sweep(key[0])
        return super().get(key, default)

    def __setitem__(self, key, value) -> None:
        self._sweep(key[0])
        super().__setitem__(key, value)
