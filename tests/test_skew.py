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
                  {"n": (F.count(F.lit(1)), "sum"),
                   "v": (F.sum("value"), "sum")}).collect()}
    assert plain == salted


def test_salted_aggregate_minmax(spark, sf_smoke_dir):
    e = load_table(spark, sf_smoke_dir, "events")
    plain = {(r.user_id, r.lo, r.hi)
             for r in e.groupBy("user_id")
             .agg(F.min("value").alias("lo"), F.max("value").alias("hi")).collect()}
    salted = {(r.user_id, r.lo, r.hi)
              for r in salted_aggregate(
                  e, "user_id",
                  {"lo": (F.min("value"), "min"),
                   "hi": (F.max("value"), "max")}).collect()}
    assert plain == salted


def test_salted_aggregate_rejects_distinct(spark, sf_smoke_dir):
    import pytest
    e = load_table(spark, sf_smoke_dir, "events")
    with pytest.raises(ValueError, match="DISTINCT"):
        salted_aggregate(e, "user_id",
                         {"d": (F.count_distinct("event_type"), "sum")})


def test_looks_distinct_introspection_failure_warns(spark, sf_smoke_dir,
                                                    monkeypatch):
    """VERDICT r16 blemish 2: if plan introspection breaks (private-API
    drift), the DISTINCT guard must degrade LOUDLY — a silent False
    would let a distinct aggregate be salted into an overcount."""
    import warnings

    import pytest

    from mapreduce_4sl08_spark.operators import skew
    e = load_table(spark, sf_smoke_dir, "events")

    def boom(self, *a, **k):
        raise AttributeError("_jdf moved")

    # break the guard's trial-plan path (limit(0) is its first step and
    # is not used elsewhere in salted_aggregate)
    monkeypatch.setattr(type(e), "limit", boom)
    with pytest.warns(RuntimeWarning, match="DISTINCT"):
        out = salted_aggregate(e, "user_id",
                               {"n": (F.count(F.lit(1)), "sum")})
    assert out is not None  # degraded to the explicit merge contract


def test_looks_distinct_guard_is_flat_class_tuple():
    """Regression (r17 self-review): the except clause's error set must
    be a FLAT tuple of exception classes — a nested empty tuple (the
    old py4j-less fallback shape) makes Python 3 raise TypeError at
    catch time, crashing salted_aggregate on exactly the Spark Connect
    sessions the fallback exists for."""
    from mapreduce_4sl08_spark.operators.skew import _INTROSPECTION_ERRORS
    assert all(isinstance(c, type) and issubclass(c, BaseException)
               for c in _INTROSPECTION_ERRORS)
    # the catch shape must be valid even with the py4j-less fallback
    try:
        raise AttributeError("probe")
    except _INTROSPECTION_ERRORS:
        pass


def test_salted_join_rejects_outer_small_side(spark, sf_smoke_dir):
    import pytest
    l = load_table(spark, sf_smoke_dir, "lineitem").select(
        F.col("l_suppkey").alias("s_suppkey"), "l_orderkey")
    s = load_table(spark, sf_smoke_dir, "supplier")
    for how in ("right", "full", "full_outer", "right_outer"):
        with pytest.raises(ValueError, match="salted_join"):
            salted_join(l, s, "s_suppkey", how=how)


def test_salted_join_anti_matches_plain(spark, sf_smoke_dir):
    l = load_table(spark, sf_smoke_dir, "lineitem").select(
        F.col("l_suppkey").alias("s_suppkey"), "l_orderkey")
    s = load_table(spark, sf_smoke_dir, "supplier").filter(
        F.col("s_suppkey") % 3 == 0)
    plain = sorted((r.l_orderkey, r.s_suppkey)
                   for r in l.join(s, "s_suppkey", "left_anti").collect())
    salted = sorted((r.l_orderkey, r.s_suppkey)
                    for r in salted_join(l, s, "s_suppkey", how="left_anti").collect())
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


def test_salting_actually_spreads_hot_key(spark):
    """Effectiveness, not just equivalence: a 90%-hot key must spread
    across many shuffle partitions after salting (it lands in ONE
    without)."""
    from pyspark.sql import functions as F
    hot = spark.range(0, 9000).select(F.lit(7).alias("k"), F.col("id").alias("v"))
    cold = spark.range(0, 1000).select((F.col("id") % 100).alias("k"), F.col("id").alias("v"))
    df = hot.unionByName(cold)

    from mapreduce_4sl08_spark.operators.skew import with_salt
    salted = with_salt(df, 16)
    spread = (salted.filter(F.col("k") == 7)
              .repartition(32, "k", "_salt")
              .select(F.spark_partition_id().alias("pid"))
              .distinct().count())
    unsalted_spread = (df.filter(F.col("k") == 7)
                       .repartition(32, "k")
                       .select(F.spark_partition_id().alias("pid"))
                       .distinct().count())
    assert unsalted_spread == 1
    assert spread >= 8  # hot key now occupies many partitions


def test_cluster_conf_sizing(spark):
    """The 100 TB sizing math: partition counts scale with input bytes
    and floor at 2x cores."""
    from mapreduce_4sl08_spark.session import cluster_conf
    small = cluster_conf(total_cores=32, input_bytes=10 * 1024**3)
    assert int(small["spark.sql.shuffle.partitions"]) == 64  # floor: 2x cores
    big = cluster_conf(total_cores=4000, input_bytes=100 * 1024**4)
    n = int(big["spark.sql.shuffle.partitions"])
    assert 400_000 <= n <= 500_000  # ~1 per 256MB of 100TB
    assert big["spark.sql.adaptive.enabled"] == "true"
