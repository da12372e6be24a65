"""Skew utilities: salted aggregation/join must be result-identical to
their unsalted forms (placement changes, results don't)."""

from pyspark.sql import functions as F

from mapreduce_4sl08_spark.operators.skew import salted_aggregate, salted_join
from mapreduce_4sl08_spark.sources import load_table


def test_salted_aggregate_matches_plain(spark, sf_smoke_dir):
    e = load_table(spark, sf_smoke_dir, "events")
    plain = {(r.user_id, r.n, round(r.v, 2))
             for r in e.groupBy("user_id")
             .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v")).collect()}
    salted = {(r.user_id, r.n, round(r.v, 2))
              for r in salted_aggregate(
                  e, "user_id",
                  {"n": F.count(F.lit(1)), "v": F.sum("value")}).collect()}
    assert plain == salted


def test_salted_aggregate_minmax(spark, sf_smoke_dir):
    e = load_table(spark, sf_smoke_dir, "events")
    plain = {(r.user_id, r.lo, r.hi)
             for r in e.groupBy("user_id")
             .agg(F.min("value").alias("lo"), F.max("value").alias("hi")).collect()}
    salted = {(r.user_id, r.lo, r.hi)
              for r in salted_aggregate(
                  e, "user_id",
                  {"lo": F.min("value"), "hi": F.max("value")}).collect()}
    assert plain == salted


def test_salted_join_matches_plain(spark, sf_smoke_dir):
    """Skewed big side (every lineitem keyed to few suppliers) joined to
    supplier dim — salted join must produce the identical multiset."""
    l = load_table(spark, sf_smoke_dir, "lineitem").select(
        F.col("l_suppkey").alias("s_suppkey"), "l_orderkey", "l_quantity")
    s = load_table(spark, sf_smoke_dir, "supplier")
    plain = sorted((r.l_orderkey, r.s_suppkey, r.s_name)
                   for r in l.join(s, "s_suppkey").collect())
    salted = sorted((r.l_orderkey, r.s_suppkey, r.s_name)
                    for r in salted_join(l, s, "s_suppkey").collect())
    assert plain == salted
