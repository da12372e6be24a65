"""Query-registry plumbing.

Each implemented operator from SURVEY §2 is exposed as a named QuerySpec:
a Spark plan builder ``(spark, sf_dir) -> DataFrame`` plus (where
SQL-expressible) the ANSI-SQL oracle string DuckDB runs on the same parquet
tables. The driver hash-compares the two at sf0.01 (CORRECTNESS_r{N}.json).

Conventions that make hash-matching deterministic (SURVEY §5.2.2):
- every computed column is explicitly aliased, identically in both engines;
- every query ends in an ORDER BY over a unique key;
- float aggregates are rounded (2-4 dp) in BOTH engines before comparison.

Cross-engine contracts added by the r17 censuses (violating any of
these is a latent divergence the ASCII fixtures cannot see):
- never bare ``trim(x)`` in oracle SQL — DuckDB's default trim strips
  the Unicode Zs set (NBSP, U+3000) where Spark's F.trim strips ASCII
  0x20 only; the contract is ``trim(x, ' ')``;
- never ``\\s`` in oracle regexes — RE2's \\s lacks \\x0B where
  Java's (and Python re.ASCII's) includes it; spell the class out as
  ``[ \\t\\n\\x0b\\f\\r]+`` (and in any pattern string SHARED verbatim
  by both engines, e.g. the BPE pretokenizer);
- rows with a NULL timestamp carry no position on the time axis:
  time-bucketed plans rely on Spark's own drop semantics with a
  mirrored oracle WHERE; lag/argmax/rank plans filter explicitly on
  BOTH sides (Spark sorts NULL ts FIRST, DuckDB LAST);
- any rank/percentile over a NULLABLE key either pins the convention
  (oracle mirrors Spark: ASC NULLS FIRST / DESC NULLS LAST) or
  filters the nulls before ranking on both sides.
Gates: tests/test_null_columns.py (both fixtures, full value compare),
tests/test_unicode_text.py (boundary-extended corpus, no exceptions).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table


# ---------------------------------------------------- exact money sums
# Shared carrier for every 2-decimal money SUM outside the TPC-H product
# measures (those live in plans/relational.py's integer-unit block, with
# the full rationale). A double SUM's accumulated error grows ~√n·ε·|S|:
# safe at the graded fixtures (margin to the .005 rounding boundary is
# ~5000× at sf0.1) but NOT at 100 TB group sizes, where it reaches
# dollars — the same class the r9 10× sweep caught in q1, one scale
# decade later. So: sum exact integer cents (lossless for 2-dec data),
# convert once post-agg. A LongType hash/window agg is also cheaper than
# the double+round form, and in Structured Streaming the long partials
# are exactly the incrementally-maintainable state shape. Per-group
# overflow: max money cents ~6e6/row → BIGINT holds ~1.5e12 rows/group.


def cents(col: str | Column) -> Column:
    """Exact integer cents of a 2-decimal double money column
    (``round(x*100)`` is integer-valued to ±ulp, so the cast is exact —
    the same idiom as relational.py's per-row unit fragments)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("long")


def cents_sql(col: str) -> str:
    """Oracle twin of :func:`cents` (DuckDB CAST from double rounds to
    nearest, exact on the integer-valued operand)."""
    return f"CAST(ROUND({col} * 100) AS BIGINT)"


def dollars(col: str | Column, alias: str) -> Column:
    """Summed cents → 2-decimal dollars, one cast to double — the same
    exact integer converts to the same IEEE double in both engines."""
    c = F.col(col) if isinstance(col, str) else col
    return (c.cast("double") / 100.0).alias(alias)


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    doc: str = ""


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Shorthand table loader used by every plan builder."""
    return load_table(spark, sf_dir, name)


def vecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The embeddings relation as VECTOR OPERATORS see it: rows whose
    embedding is NULL are excluded (r16 null-sweep find — a missing
    vector has no geometry; NULL lists crashed the numpy signature /
    dot UDFs in Spark and list_inner_product in DuckDB). Every oracle
    applies the same ``WHERE embedding IS NOT NULL``, so both engines
    agree row-for-row. NOTE the (w, L) derivation deliberately counts
    ALL rows (corpus_vec_count reads parquet footers, which cannot see
    nulls; the oracle params CTEs mirror with an unfiltered COUNT(*)) —
    a slightly-wide width on a null-heavy corpus is safe, a
    cross-engine width split is not."""
    return (load_table(spark, sf_dir, "embeddings")
            .filter(F.col("embedding").isNotNull()))


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
