"""Scale-technique queries: the remaining TPC-H shapes (Q12/Q20 adapted
to the fixture schema) plus registry-visible demonstrations of the skew
and bucketing utilities (operators/skew.py, sources/bucketing.py) — the
techniques a 100 TB deployment leans on, exposed as driver-checkable
queries instead of test-only helpers.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from .base import QuerySpec, cents, cents_sql, dollars, t
from .warehouse import _share_e6_expr

# ------------------------------------------------------ TPC-H Q12 (adapted)
# The fixture schema has no l_shipmode/l_receiptdate; the ship-delay
# bucket (days between order and ship date) stands in for ship mode —
# the SHAPE is Q12's: fact⋈dim with a two-way conditional count per
# categorical group.


def q12_priority_by_ship_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: per ship-delay bucket, how many high- vs
    low-priority orders shipped in 1997 — conditional aggregation after
    a selective fact⋈fact join."""
    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp")))
    o = t(spark, sf_dir, "orders")
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    bucket = (F.when(delay <= 30, "FAST")
              .when(delay <= 60, "MEDIUM")
              .otherwise("SLOW"))
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(bucket.alias("ship_bucket"))
        .agg(F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
             F.sum(F.when(is_high, 0).otherwise(1)).alias("low_line_count"))
        .orderBy("ship_bucket")
    )


Q12_SQL = """
SELECT CASE WHEN CAST(l_shipdate AS DATE) - CAST(o_orderdate AS DATE) <= 30 THEN 'FAST'
            WHEN CAST(l_shipdate AS DATE) - CAST(o_orderdate AS DATE) <= 60 THEN 'MEDIUM'
            ELSE 'SLOW' END AS ship_bucket,
       SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)::BIGINT
         AS high_line_count,
       SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END)::BIGINT
         AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY 1
ORDER BY ship_bucket
"""

# ------------------------------------------------------ TPC-H Q20 (adapted)
# No partsupp table; "excess stock" becomes "excess share of shipments":
# a supplier qualifies if, for some Brand#1 part, it shipped more than
# 10% of that part's total shipped quantity (calibrated to the uniform
# fixture data: ~27 qualifying suppliers at sf0.01). The SHAPE is Q20's: a
# doubly-nested subquery chain collapsing into a semi join on supplier.


def q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers dominating shipments of a filtered
    part family — per-(supplier, part) aggregate, compared against the
    per-part total, semi-joined back to the supplier dim."""
    l = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    p = t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    per_sp = (
        l.join(broadcast(p.select("p_partkey")), l.l_partkey == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("sp_qty"))
    )
    per_part = per_sp.groupBy("l_partkey").agg(F.sum("sp_qty").alias("p_qty"))
    dominant = (
        per_sp.join(per_part, "l_partkey")
        .filter(F.col("sp_qty") > 0.1 * F.col("p_qty"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(dominant, s.s_suppkey == dominant.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name", F.round("s_acctbal", 2).alias("acctbal"))
        .orderBy("s_suppkey")
    )


Q20_SQL = """
SELECT s_suppkey, s_name, ROUND(s_acctbal, 2) AS acctbal
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey
  FROM (
    SELECT l_suppkey, l_partkey, SUM(l_quantity) AS sp_qty
    FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_brand = 'Brand#1')
    GROUP BY 1, 2
  ) sp
  JOIN (
    SELECT l_partkey, SUM(l_quantity) AS p_qty
    FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_brand = 'Brand#1')
    GROUP BY 1
  ) pt USING (l_partkey)
  WHERE sp_qty > 0.1 * p_qty
)
ORDER BY s_suppkey
"""

# ------------------------------------------------------ salted hot-key agg
# events has 5 event types over the whole table — exactly the
# hot-key-aggregation regime where one reducer would own 20% of the
# data. salted_aggregate spreads each key over (key, salt) partials and
# merges; results are placement-independent, so the plain GROUP BY is
# the oracle.


def salted_hot_key_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over a 5-hot-key column (see
    operators/skew.py): partial agg on (event_type, salt), explicit
    merge on event_type."""
    from ..operators.skew import salted_aggregate
    e = t(spark, sf_dir, "events")
    # exact-cents total (plans/base.py block): long partials are also
    # the natural salted-merge carrier — the (key, salt) partial sums
    # and the final merge are both plain BIGINT adds. MAX is
    # order-independent, so it stays double.
    out = salted_aggregate(
        e, "event_type",
        {"n_events": (F.count(F.lit(1)), "sum"),
         "total_cents": (F.sum(cents("value")), "sum"),
         "max_value": (F.max("value"), "max")},
        n_salts=16)
    return (
        out.select("event_type", "n_events",
                   dollars("total_cents", "total_value"),
                   F.round("max_value", 2).alias("max_value"))
        .orderBy("event_type")
    )


SALTED_AGG_SQL = f"""
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM({cents_sql('value')}) AS DOUBLE) / 100.0 AS total_value,
       ROUND(MAX(value), 2) AS max_value
FROM events
GROUP BY event_type
ORDER BY event_type
"""

# ------------------------------------------------------ bucketed join
# Pre-shuffled storage: both sides bucketed on the join key at write
# time, so the join (and any later groupBy on the key) runs with ZERO
# exchanges — the 100 TB answer to re-shuffling the fact table on every
# query. The write happens into the session warehouse; the read-side
# plan is asserted Exchange-free in tests/test_plans.py.

_BUCKETS = 8


def _bucket_root(spark: SparkSession) -> str:
    """Bucket-table location: the session's configured warehouse dir
    (never a hardcoded checkout path — the driver may run from any cwd),
    suffixed with the Spark applicationId so concurrent sessions running
    this query don't clobber each other's fixed-name tables."""
    warehouse = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse").removeprefix("file:")
    return os.path.join(warehouse, f"bkt-{spark.sparkContext.applicationId}")


def bucketed_join_zero_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders⋈customer co-located via bucketBy(custkey): per-segment
    order stats without a join-time shuffle."""
    from ..sources.bucketing import bucketed_join, write_bucketed
    root = _bucket_root(spark)
    o = t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    write_bucketed(o, "bkt_orders", "o_custkey", _BUCKETS,
                   path=f"{root}/bkt_orders")
    write_bucketed(c.withColumnRenamed("c_custkey", "o_custkey"),
                   "bkt_customer", "o_custkey", _BUCKETS,
                   path=f"{root}/bkt_customer")
    joined = bucketed_join(spark, "bkt_orders", "bkt_customer", "o_custkey",
                           force_sort_merge=True)
    return (
        joined.groupBy("c_mktsegment")
        # exact-cents revenue (plans/base.py block)
        .agg(F.count(F.lit(1)).alias("n_orders"),
             F.sum(cents("o_totalprice")).alias("_rev_c"))
        .select("c_mktsegment", "n_orders", dollars("_rev_c", "revenue"))
        .orderBy("c_mktsegment")
    )


BUCKETED_JOIN_SQL = f"""
SELECT c_mktsegment,
       COUNT(*) AS n_orders,
       CAST(SUM({cents_sql('o_totalprice')}) AS DOUBLE) / 100.0 AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


# ------------------------------------------------ stratified hash sampling
# Reproducible per-stratum sampling: df.sampleBy is Bernoulli (seed-
# and partitioning-dependent — not cross-engine checkable, not even
# stable across repartitions of the same data). Hash-mod sampling keys
# the keep decision on md5(doc_id), so the sample is a pure function of
# the data: identical on every run, every engine, every cluster size —
# the property a training-data pipeline needs for reproducible ablations.

_STRATA_PCT = {"en": 10, "de": 30, "fr": 30}  # keep-% per language
_DEFAULT_PCT = 50


def stratified_sample_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample of documents: keep
    md5(doc_id) mod 100 < pct(lang), with per-language rates —
    downsample the dominant language, keep more of the rare ones."""
    d = t(spark, sf_dir, "documents")
    bucket = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
                    16, 10).cast("long") % 100
    pct = F.lit(_DEFAULT_PCT)
    for lang, p in _STRATA_PCT.items():
        pct = F.when(F.col("lang") == lang, p).otherwise(pct)
    return (
        d.withColumn("bucket", bucket)
        .filter(F.col("bucket") < pct)
        .select("doc_id", "lang", F.col("bucket").cast("int").alias("bucket"))
        .orderBy("doc_id")
    )


def _stratified_sql() -> str:
    cases = " ".join(
        f"WHEN lang = '{lang}' THEN {p}" for lang, p in _STRATA_PCT.items())
    return f"""
SELECT doc_id, lang,
       (('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100)::INT AS bucket
FROM documents
WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100
      < CASE {cases} ELSE {_DEFAULT_PCT} END
ORDER BY doc_id
"""


STRATIFIED_SQL = _stratified_sql()


SPECS: list[QuerySpec] = [
    QuerySpec("q12_priority_by_ship_delay", q12_priority_by_ship_delay, Q12_SQL,
              "TPC-H Q12 shape: conditional counts per ship-delay bucket"),
    QuerySpec("q20_dominant_suppliers", q20_dominant_suppliers, Q20_SQL,
              "TPC-H Q20 shape: nested-subquery semi join on dominant suppliers"),
    QuerySpec("salted_hot_key_agg", salted_hot_key_agg, SALTED_AGG_SQL,
              "skew-salted two-phase aggregation over a hot-key column"),
    QuerySpec("bucketed_join_zero_shuffle", bucketed_join_zero_shuffle, BUCKETED_JOIN_SQL,
              "bucketBy co-located join — zero exchanges at read time"),
    QuerySpec("stratified_sample_documents", stratified_sample_documents, STRATIFIED_SQL,
              "deterministic hash-mod stratified sampling per language"),
]


# ------------------------------------------------------------ Z-order layout
# Multi-dimensional data clustering: interleave the bits of two key
# columns into a Morton (Z-order) code, so sorting by the code co-locates
# rows that are close in BOTH dimensions — the lakehouse layout trick
# that lets min/max file statistics prune on either column. The query
# computes per-Z-bucket extents: tight user_id AND hour ranges per bucket
# are exactly what makes file skipping work at 100 TB. Pure integer bit
# arithmetic, generated identically for Spark and DuckDB.

_Z_BITS = 8  # bits per dimension interleaved (16-bit Morton code)


def _interleave_expr(a: str, b: str, bits: int) -> str:
    """Bit-interleave SQL expression (same text works in Spark SQL and
    DuckDB: &, <<, | all shared): a's bit i -> position 2i+1, b's -> 2i."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i})")
    return " | ".join(terms)


def zorder_layout_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton-code bucketing of events on (user_id, hour-of-stream):
    per Z-bucket row counts and per-dimension extents. Buckets = the
    top 8 bits of the 16-bit code (256 logical 'files')."""
    e = t(spark, sf_dir, "events")
    base = e.select(
        F.expr("user_id % 256").alias("u"),
        F.expr("(unix_micros(ts) div 3600000000) % 256").alias("h"),
    )
    z = _interleave_expr("u", "h", _Z_BITS)
    return (
        base.select("u", "h", F.expr(f"({z}) >> 8").alias("z_bucket"))
        .groupBy("z_bucket")
        .agg(F.count(F.lit(1)).alias("n_rows"),
             F.min("u").alias("u_min"), F.max("u").alias("u_max"),
             F.min("h").alias("h_min"), F.max("h").alias("h_max"))
        .orderBy("z_bucket")
    )


def _zorder_sql() -> str:
    z = _interleave_expr("u", "h", _Z_BITS)
    return f"""
WITH base AS (
  SELECT user_id % 256 AS u,
         (epoch_us(ts) // 3600000000) % 256 AS h
  FROM events
)
SELECT (({z}) >> 8)::BIGINT AS z_bucket,
       COUNT(*) AS n_rows,
       MIN(u)::BIGINT AS u_min, MAX(u)::BIGINT AS u_max,
       MIN(h)::BIGINT AS h_min, MAX(h)::BIGINT AS h_max
FROM base
GROUP BY 1
ORDER BY z_bucket
"""


ZORDER_SQL = _zorder_sql()

SPECS.append(
    QuerySpec("zorder_layout_stats", zorder_layout_stats, ZORDER_SQL,
              "Morton/Z-order layout keys: per-Z-bucket extents on (user, hour)"))


# ------------------------------------------------------------ key-skew profile
# The diagnostic you run BEFORE choosing a skew strategy: per-key
# frequency distribution of a join/agg key, reduced to the numbers that
# decide between plain hash, AQE skew-join, and salting (see
# salted_hot_key_agg above). Exact: key counts are integers; the
# interpolated percentiles use the Spark `percentile` / DuckDB
# `quantile_cont` shared definition proven by agg_percentiles; the
# top-1 share is exact pure-BIGINT per-million via the split-multiplier
# _share_e6_expr (ADVICE r12: a double product loses exactness once
# max_cnt*1e6 exceeds 2^53 — ~9e9 rows on one key, exactly the hot-key
# regime this diagnostic targets). Plan: one map-side-combined count per key
# (the only data-sized shuffle), then a scalar reduce over the ~|keys|
# count relation — at 100 TB the profile costs one pass and shuffles
# only the distinct keys.


def key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = t(spark, sf_dir, "lineitem").select("l_partkey")
    counts = l.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("cnt"))
    prof = counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").alias("n_rows"),
        F.max("cnt").alias("max_cnt"),
        F.percentile("cnt", 0.5).alias("p50"),
        F.percentile("cnt", 0.99).alias("p99"),
    )
    return prof.select(F.expr(
        "stack(6,"
        " 'n_keys', cast(n_keys as double),"
        " 'n_rows', cast(n_rows as double),"
        " 'max_cnt', cast(max_cnt as double),"
        " 'p50_cnt', round(p50, 4),"
        " 'p99_cnt', round(p99, 4),"
        " 'top1_share_e6',"
        # zero-total guard (ADVICE r13): Spark div yields NULL on /0 but
        # DuckDB // raises — CASE in BOTH engines keeps an empty-table
        # run a value-compare, never a hard error
        "   cast(CASE WHEN n_rows > 0 THEN "
        f"     {_share_e6_expr('max_cnt', 'n_rows')} END as double)"
        ") as (stat, value)"
    )).orderBy("stat")


KEY_SKEW_SQL = f"""
WITH counts AS (
  SELECT l_partkey, COUNT(*) AS cnt FROM lineitem GROUP BY l_partkey
),
prof AS (
  SELECT COUNT(*) AS n_keys,
         SUM(cnt)::BIGINT AS n_rows,
         MAX(cnt) AS max_cnt,
         quantile_cont(cnt, 0.5) AS p50,
         quantile_cont(cnt, 0.99) AS p99
  FROM counts
)
SELECT stat, value FROM (
  SELECT 'n_keys' AS stat, n_keys::DOUBLE AS value FROM prof
  UNION ALL SELECT 'n_rows', n_rows::DOUBLE FROM prof
  UNION ALL SELECT 'max_cnt', max_cnt::DOUBLE FROM prof
  UNION ALL SELECT 'p50_cnt', ROUND(p50, 4) FROM prof
  UNION ALL SELECT 'p99_cnt', ROUND(p99, 4) FROM prof
  UNION ALL SELECT 'top1_share_e6',
    (CASE WHEN n_rows > 0 THEN
       {_share_e6_expr('max_cnt', 'n_rows').replace(' div ', ' // ')}
     END)::DOUBLE FROM prof
)
ORDER BY stat
"""

SPECS.append(
    QuerySpec("key_skew_profile", key_skew_profile, KEY_SKEW_SQL,
              "per-key frequency skew diagnostic (counts, percentiles, top-1 share)"))
