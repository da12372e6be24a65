"""Bucketed tables: the pre-shuffled join must produce identical results
with NO Exchange in the plan (the write-once-shuffle-never pattern)."""

import pytest
from pyspark.sql import functions as F

from mapreduce_4sl08_spark.sources import load_table
from mapreduce_4sl08_spark.sources.bucketing import bucketed_join, write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_smoke_dir):
    o = load_table(spark, sf_smoke_dir, "orders")
    l = load_table(spark, sf_smoke_dir, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey")
    write_bucketed(o, "b_orders", "o_orderkey", n_buckets=8)
    write_bucketed(l, "b_lineitem", "o_orderkey", n_buckets=8)
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_no_exchange(spark, bucketed_tables):
    """With broadcast off (at real scale NEITHER side broadcasts), the
    bucketed join must SortMergeJoin directly over the buckets with no
    shuffle exchange — the pre-shuffled-on-disk payoff."""
    lt, rt = bucketed_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, lt, rt, "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan[:800]
        assert "Exchange" not in plan, plan[:800]
        assert "Bucketed: true" in plan, plan[:800]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_matches_plain(spark, sf_smoke_dir, bucketed_tables):
    lt, rt = bucketed_tables
    got = (bucketed_join(spark, lt, rt, "o_orderkey")
           .groupBy("o_orderpriority")
           .agg(F.count(F.lit(1)).alias("n"),
                F.round(F.sum("l_quantity"), 2).alias("q"))
           .orderBy("o_orderpriority"))
    o = load_table(spark, sf_smoke_dir, "orders")
    l = load_table(spark, sf_smoke_dir, "lineitem")
    want = (l.join(o, l.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("l_quantity"), 2).alias("q"))
            .orderBy("o_orderpriority"))
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in want.collect()]


def test_bucketed_groupby_no_exchange(spark, bucketed_tables):
    lt, _ = bucketed_tables
    agg = (spark.table(lt).groupBy("o_orderkey")
           .agg(F.count(F.lit(1)).alias("n")))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:800]
