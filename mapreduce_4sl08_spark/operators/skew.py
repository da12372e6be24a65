"""Skew-handling utilities.

The reference's answer to skew was a hand-tuned log-spaced range
partitioning (α=10, /root/reference/src/MasterNode.java:144-164) baked
into the engine. On Spark, AQE's skew-join splitting handles most cases
at runtime; these helpers cover the residual case AQE can't fix — a
shuffle *aggregation* or join where one key dominates so heavily that a
single task would still own it.

``salted_aggregate``: two-phase agg — partial agg on (key, salt) spreads
the hot key over N tasks, final agg on key merges the partials. Exactly
the map-side-combine idea generalized; correct for any decomposable
aggregate (sum/count/min/max).

``salted_join``: replicate the small side per salt value, salt the big
side randomly — the hot key's rows land in N different shuffle
partitions. Semantics-preserving for equi-joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, col_name: str = "_salt") -> DataFrame:
    """Deterministic-ish uniform salt 0..n_salts-1 per row (random salt is
    fine for correctness since it only affects placement, never results)."""
    return df.withColumn(col_name, (F.rand(seed=42) * n_salts).cast("int"))


def salted_aggregate(df: DataFrame, key: str, aggs: dict[str, Column],
                     n_salts: int = 16) -> DataFrame:
    """groupBy(key).agg(...) in two shuffle-spreading phases. ``aggs``
    maps output name → decomposable aggregate expression over the input
    columns. Example::

        salted_aggregate(events, "user_id",
                         {"n": F.count(F.lit(1)), "v": F.sum("value")})
    """
    partial_names = list(aggs)
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(key, "_salt").agg(
        *[expr.alias(f"_p_{name}") for name, expr in aggs.items()])
    # merge phase: counts/sums merge by sum; min/max by min/max. The
    # caller tells us how via the same expression applied to the partial
    # column when possible; for count we must SUM the partial counts.
    merged = partial.groupBy(key).agg(*[
        _merge_expr(aggs[name], f"_p_{name}").alias(name) for name in partial_names
    ])
    return merged


def _merge_expr(original: Column, partial_col: str) -> Column:
    """Merge function for a decomposable aggregate: count→sum, sum→sum,
    min→min, max→max (derived from the expression's name)."""
    expr_str = original._jc.toString().lower()
    if expr_str.startswith("count("):
        return F.sum(partial_col)
    if expr_str.startswith("sum("):
        return F.sum(partial_col)
    if expr_str.startswith("min("):
        return F.min(partial_col)
    if expr_str.startswith("max("):
        return F.max(partial_col)
    raise ValueError(
        f"not a decomposable aggregate for salting: {expr_str[:60]}")


def salted_join(big: DataFrame, small: DataFrame, on: str,
                n_salts: int = 16, how: str = "inner") -> DataFrame:
    """Equi-join with the big side salted and the small side replicated
    n_salts times, so a hot join key spreads across n_salts shuffle
    partitions instead of one straggler task."""
    big_s = with_salt(big, n_salts)
    small_r = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    out = big_s.join(small_r, [on, "_salt"], how)
    return out.drop("_salt")
