"""Sketch-tolerance contract — the non-vacuous branch is PROVEN live
(r19, VERDICT r18 item 5).

The r18 tiny-group fix made `within_tol` vacuously TRUE under n=100
(the sketch's discrete pick and the exact-rank pick are different
DEFINITIONS, up to one element apart on sparse groups), which left the
sketch-sanity contract tested nowhere smaller than a 100-row group —
and, if the fixtures' groups ever shrank, tested NOWHERE, silently.
This module pins both directions:

1. the smoke fixture's lineitem returnflag groups are all >= 100 rows,
   so the non-vacuous branch actually evaluates in every sweep — and
   it evaluates to TRUE (the sketch path is sane);
2. the PRODUCTION tolerance predicates (module-level in plans/
   extended.py and plans/warehouse.py, the exact Columns the plans
   ship) FAIL on a deliberately-broken sketch value — the band really
   fires, it is not a tautology.
"""
import pytest

from mapreduce_4sl08_spark.plans import QUERIES
from mapreduce_4sl08_spark.plans.extended import _within_rel_tol
from mapreduce_4sl08_spark.plans.warehouse import _sketch_within_2pct
from tests.conftest import SF_SMOKE


def test_smoke_groups_exercise_non_vacuous_branch(spark):
    """Every returnflag group must be >= 100 rows on the smoke fixture
    — if a fixture regeneration ever shrinks them, the sketch contract
    would silently become vacuous everywhere; fail loudly instead."""
    from pyspark.sql import functions as F

    from mapreduce_4sl08_spark.plans.base import t
    sizes = [r.n for r in t(spark, SF_SMOKE, "lineitem")
             .groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n"))
             .collect()]
    assert sizes and min(sizes) >= 100, (
        f"lineitem returnflag groups {sizes} — under 100 rows the "
        f"within_tol checks are vacuous and the sketch path untested")


@pytest.mark.parametrize("name,cols", [
    ("agg_approx_distinct", ["within_tol"]),
    ("approx_percentile_check", ["p50_within_tol", "p95_within_tol"]),
])
def test_within_tol_true_on_live_branch(spark, name, cols):
    rows = QUERIES[name].fn(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        for c in cols:
            assert r[c] is True, f"{name}.{c} failed on {r}"
    if name == "approx_percentile_check":
        # and the branch is genuinely live: every group is >= 100
        assert all(r["n"] >= 100 for r in rows)


def test_rel_tol_predicate_fires_on_broken_sketch(spark):
    """Mutation check for agg_approx_distinct's 5%-relative band: the
    production predicate must reject a 10%-off sketch value and accept
    a 1%-off one."""
    df = spark.createDataFrame(
        [(110.0, 100.0), (101.0, 100.0)], ["approx", "exact"])
    got = [r.ok for r in
           df.select(_within_rel_tol("approx", "exact").alias("ok"))
           .collect()]
    assert got == [False, True], got


def test_sketch_2pct_predicate_fires_on_broken_sketch(spark):
    """Mutation check for approx_percentile_check's 2% band, exact
    integer form: |ap - exact| * 50 <= exact. 10300 vs 10000 cents
    (3% off) must fail; 10100 (1%) and the exact 2% boundary pass."""
    df = spark.createDataFrame(
        [([10300], 10000), ([10100], 10000), ([10200], 10000)],
        ["ap", "p50_cents"])
    got = [r.ok for r in
           df.select(_sketch_within_2pct("ap[0]", "p50_cents")
                     .alias("ok")).collect()]
    assert got == [False, True, True], got
