"""Assembled query registry — the driver-facing operator inventory.

Every entry is one implemented operator/query from SURVEY §2 (reference
parity) or §7.2-7.3 (extended relational / streaming-twin / LLM-pipeline
surface). ``__spark_entry__`` exposes exactly this.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import events, extended, relational, text, vectors
from .base import QuerySpec

_ALL_SPECS: list[QuerySpec] = [
    *text.SPECS,
    *relational.SPECS,
    *events.SPECS,
    *vectors.SPECS,
    *extended.SPECS,
]

QUERIES: dict[str, QuerySpec] = {s.name: s for s in _ALL_SPECS}
assert len(QUERIES) == len(_ALL_SPECS), "duplicate query name in registry"


def query_fns() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in QUERIES.items()}


def oracle_sqls() -> dict[str, str]:
    return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle}
