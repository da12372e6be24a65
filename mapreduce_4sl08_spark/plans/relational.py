"""Relational query plans (SURVEY §7.2): scans, project/filter, hash
aggregation (reference A1/A2 generalized), joins of every flavor, sorts /
top-k (X2+O1+O2 generalized), set ops, grouping sets, window functions.

All plans are declarative DataFrame compositions — Catalyst handles
predicate pushdown, column pruning, and join selection; small dims
(region/nation) are explicitly broadcast so the 6-table join never
shuffles them at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window
from pyspark.sql.functions import broadcast

from .base import (
    QuerySpec, cents, cents_sql, dollars, finite, finite_sql, t,
)


# ------------------------------------------------- exact money arithmetic
# Every money SUM in this module runs in EXACT INTEGER UNITS, not double
# and not decimal. Why not double: order-dependent summation (~1 ulp =
# 4e-6 at the 2.8e10 magnitudes a 10x fixture reaches) lands on .005
# rounding boundaries often enough that the r9 10x sweep caught q1's
# sum_charge rounding to .35 in Spark and .34 in DuckDB. Why not decimal:
# exact, but Spark's decimal hash-agg is markedly slower than BIGINT
# (q1 paid 2.25x in r9; the integer form below measures ~0.66 s vs
# ~1.09 s decimal at sf0.1, bit-identical values).
#
# The scheme: source measures are exactly 2-decimal (verified over the
# fixtures), so ``round(x*100)`` is a lossless "cents" integer and the
# per-row products below are exact e4/e6-unit integers far below 2^63.
# Each money SUM is carried as TWO plain-LongType partial sums — the
# cents part and the sub-cent remainder:
#
#     SUM(units) = 100..10000 * SUM(units div U) + SUM(units % U)
#
# which keeps per-group accumulators < 2^63 up to ~1e12 rows PER GROUP
# (petabyte-class lineitem; a single e6-unit sum would overflow a global
# group near SF 50). Post-agg, half-up rounding to cents is the integer
# identity ``(U*a + b + 50') div U = a + (b + 50') div U`` (50' = U/2),
# then ONE cast to double — the same exact integer converts to the same
# IEEE double in Spark and DuckDB, so results are deterministic and
# engine-identical at any scale. Oracle twins mirror the expressions
# verbatim (DuckDB sums into HUGEINT — same identity, more slack; its
# ``//`` truncates toward zero exactly like Spark's ``div``, and all
# money units here are non-negative).

#: per-row exact integer-unit SQL fragments (shared Spark/DuckDB syntax;
#: non-finite source values → NULL units — the r18 contract: one NaN
#: row must degrade to a missing measure, not throw ANSI CAST_OVERFLOW
#: and abort a 100 TB job. TRY_CAST, not a finite_frag CASE guard:
#: round(non-finite·100) stays non-finite and try-cast maps exactly
#: that to NULL for free, where the per-measure CASE+isnan+abs form
#: measured ~20-25 % slower on the scan-bound q1 (interleaved A/B,
#: ROUND_NOTES r18); TRY_CAST parses identically in both engines)
_QTY_E2 = "TRY_CAST(ROUND(l_quantity * 100) AS BIGINT)"
_PRICE_C = "TRY_CAST(ROUND(l_extendedprice * 100) AS BIGINT)"
_DISC_PTS = "TRY_CAST(ROUND(l_discount * 100) AS BIGINT)"
_TAX_PTS = "TRY_CAST(ROUND(l_tax * 100) AS BIGINT)"
#: revenue  extprice*(1-disc)            e4 units, <= ~1.1e9 / row
_REV_E4 = f"({_PRICE_C} * (100 - {_DISC_PTS}))"
#: charge   extprice*(1-disc)*(1+tax)    e6 units, <= ~1.2e11 / row
_CHARGE_E6 = f"({_REV_E4} * (100 + {_TAX_PTS}))"
#: q6 forecast  extprice*disc            e4 units
_FORECAST_E4 = f"({_PRICE_C} * {_DISC_PTS})"
#: q11 stock    extprice*quantity        e4 units, <= ~5.3e10 / row
_STOCK_E4 = f"({_PRICE_C} * {_QTY_E2})"


def _part_sums(units_sql: str, unit: int, name: str) -> tuple:
    """The two BIGINT partial sums (cents part, sub-cent remainder) for
    an exact integer-unit money measure; ``unit`` = units per cent."""
    return (F.sum(F.expr(f"{units_sql} div {unit}")).alias(f"_{name}_c"),
            F.sum(F.expr(f"{units_sql} % {unit}")).alias(f"_{name}_s"))


def _money(name: str, unit: int, alias: str | None = None) -> F.Column:
    """Recombine the partial sums, round half-up to exact cents, cast
    once to double (2-decimal dollars, engine-identical)."""
    return F.expr(
        f"CAST(_{name}_c + (_{name}_s + {unit // 2}) div {unit} AS DOUBLE)"
        " / 100.0").alias(alias or name)


def _part_sums_sql(units_sql: str, unit: int, name: str) -> str:
    """Oracle-side twin of :func:`_part_sums` (one SELECT fragment)."""
    return (f"SUM(({units_sql}) // {unit}) AS _{name}_c, "
            f"SUM(({units_sql}) % {unit}) AS _{name}_s")


def _money_sql(name: str, unit: int) -> str:
    """Oracle-side twin of :func:`_money` (DuckDB ``//`` = Spark ``div``
    for these non-negative operands)."""
    return (f"CAST(_{name}_c + (_{name}_s + {unit // 2}) // {unit}"
            f" AS DOUBLE) / 100.0")


def _rev_sums() -> tuple:
    """Partial sums for the ubiquitous revenue measure."""
    return _part_sums(_REV_E4, 100, "rev")


def _rev_money(alias: str = "revenue") -> F.Column:
    return _money("rev", 100, alias)


_REV_SUMS_SQL = _part_sums_sql(_REV_E4, 100, "rev")
_REV_MONEY_SQL = _money_sql("rev", 100)


# ---------------------------------------------------------------- q1
# TPC-H Q1 shape: the reference's A1 hash-agg generalized to multi-measure.
# Map-side partial agg + single hash shuffle on a 6-value key; at 100 TB
# this is scan-bound, exactly as it should be.


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1. Money SUMs run in exact integer units (see the module
    helper block): plain-LongType hash-agg partials, half-up-rounded to
    exact cents post-agg, one cast to double — deterministic and
    engine-identical at any scale (the r9 10× sweep caught sum_charge's
    double form straddling a .005 boundary; the r9 decimal form was
    exact but 2.25× slower). sum_qty/sum_base_price are single e2
    sums (≤5e3 / ≤1.1e7 per row — no remainder split needed below
    ~1e12 rows/group); the e4/e6 products carry the hi/lo split. The
    AVGs stay double: their quotients are not decimal-round numbers,
    so the tie class doesn't apply, and 1/n shrinks the error."""
    # NO fan-out here (r21, measured twice): the map-side partial agg
    # collapses everything to 4 groups BEFORE the shuffle, so a
    # pre-agg exchange ships raw rows that the combine would have
    # reduced to nothing — interleaved A/B: without 0.78 s vs with
    # 0.94 s at sf0.1, 1.27 vs 1.53 s at the 10x fixture. Fan-out pays
    # only where downstream KEEPS cardinality (tokenize/explode,
    # windows, join probes) — see sources/tables.py.
    l = t(spark, sf_dir, "lineitem")
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.expr(_QTY_E2)).alias("_qty_e2"),
            F.sum(F.expr(_PRICE_C)).alias("_bp_c"),
            *_part_sums(_REV_E4, 100, "dp"),
            *_part_sums(_CHARGE_E6, 10000, "ch"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .select(
            "l_returnflag", "l_linestatus",
            F.expr("CAST(_qty_e2 AS DOUBLE) / 100.0").alias("sum_qty"),
            F.expr("CAST(_bp_c AS DOUBLE) / 100.0").alias("sum_base_price"),
            _money("dp", 100, "sum_disc_price"),
            _money("ch", 10000, "sum_charge"),
            "avg_qty", "avg_price", "avg_disc", "count_order",
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
       CAST(_qty_e2 AS DOUBLE) / 100.0 AS sum_qty,
       CAST(_bp_c AS DOUBLE) / 100.0 AS sum_base_price,
       {_money_sql('dp', 100)} AS sum_disc_price,
       {_money_sql('ch', 10000)} AS sum_charge,
       avg_qty, avg_price, avg_disc, count_order
FROM (
  SELECT l_returnflag, l_linestatus,
         SUM({_QTY_E2}) AS _qty_e2,
         SUM({_PRICE_C}) AS _bp_c,
         {_part_sums_sql(_REV_E4, 100, 'dp')},
         {_part_sums_sql(_CHARGE_E6, 10000, 'ch')},
         ROUND(AVG(l_quantity), 4) AS avg_qty,
         ROUND(AVG(l_extendedprice), 4) AS avg_price,
         ROUND(AVG(l_discount), 4) AS avg_disc,
         COUNT(*) AS count_order
  FROM lineitem
  WHERE l_shipdate <= TIMESTAMP '1998-09-02'
  GROUP BY l_returnflag, l_linestatus
)
ORDER BY l_returnflag, l_linestatus
"""

# ---------------------------------------------------------------- q3
# 3-way equi-join + agg + top-k: customer is the selective side.


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    # fanout on the probe side only: lineitem feeds two broadcast-hash
    # probes + the revenue partial agg, single-task otherwise (r21: 0.76x)
    l = t(spark, sf_dir, "lineitem", fanout=True).filter(F.col("l_shipdate") > F.lit("1997-01-01").cast("timestamp"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(*_rev_sums())
        .select("l_orderkey", "o_orderdate", "o_orderpriority", _rev_money())
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


Q3_SQL = f"""
SELECT l_orderkey, o_orderdate, o_orderpriority,
       {_REV_MONEY_SQL} AS revenue
FROM (
  SELECT l_orderkey, o_orderdate, o_orderpriority, {_REV_SUMS_SQL}
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  WHERE c_mktsegment = 'BUILDING'
    AND o_orderdate < TIMESTAMP '1998-01-01'
    AND l_shipdate > TIMESTAMP '1997-01-01'
  GROUP BY l_orderkey, o_orderdate, o_orderpriority
)
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""

# ---------------------------------------------------------------- q5
# 6-table star join. region/nation broadcast (they are 5/25 rows at every
# SF); customer/supplier co-partition with lineitem on the shuffle keys.


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = t(spark, sf_dir, "nation")
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    l = t(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(c, (o.o_custkey == c.c_custkey) & (c.c_nationkey == s.s_nationkey))
        .join(broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(*_rev_sums())
        .select("n_name", _rev_money())
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


Q5_SQL = f"""
SELECT n_name, {_REV_MONEY_SQL} AS revenue
FROM (
  SELECT n_name, {_REV_SUMS_SQL}
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'ASIA'
    AND o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate < TIMESTAMP '1998-01-01'
  GROUP BY n_name
)
ORDER BY revenue DESC, n_name ASC
"""

# ---------------------------------------------------------------- q6
# Pure scan + filter + scalar agg: predicate pushdown showcase.


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = t(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.03) & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(*_part_sums(_FORECAST_E4, 100, "fc"),
             F.count(F.lit(1)).alias("n_items"))
        .select(_money("fc", 100, "revenue"), "n_items")
    )


Q6_SQL = f"""
SELECT {_money_sql('fc', 100)} AS revenue, n_items
FROM (
  SELECT {_part_sums_sql(_FORECAST_E4, 100, 'fc')},
         COUNT(*) AS n_items
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1997-01-01'
    AND l_discount BETWEEN 0.03 AND 0.07
    AND l_quantity < 24
)
"""

# ---------------------------------------------------------------- joins


def join_left_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving order-less customers (count=0)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        # exact-cents sum (plans/base.py block); coalesce AFTER the sum
        # so order-less customers still read 0.00
        .agg(F.count("o_orderkey").alias("n_orders"),
             F.coalesce(F.sum(cents("o_totalprice")), F.lit(0)).alias("_ts_c"))
        .select("c_custkey", "c_name", "n_orders",
                dollars("_ts_c", "total_spend"))
        .orderBy("c_custkey")
    )


JOIN_LEFT_SQL = f"""
SELECT c_custkey, c_name,
       COUNT(o_orderkey) AS n_orders,
       CAST(COALESCE(SUM({cents_sql('o_totalprice')}), 0) AS DOUBLE) / 100.0
         AS total_spend
FROM customer
LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_name
ORDER BY c_custkey
"""


def join_semi_big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: customers having ≥1 order above 400k."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


JOIN_SEMI_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_totalprice > 400000)
ORDER BY c_custkey
"""


def join_anti_inactive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers with no orders at all."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


JOIN_ANTI_SQL = """
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
ORDER BY c_custkey
"""


def join_full_nation_presence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of per-nation customer vs supplier counts."""
    c = (t(spark, sf_dir, "customer").groupBy("c_nationkey")
         .agg(F.count(F.lit(1)).alias("n_customers")))
    s = (t(spark, sf_dir, "supplier").groupBy("s_nationkey")
         .agg(F.count(F.lit(1)).alias("n_suppliers")))
    return (
        c.join(s, c.c_nationkey == s.s_nationkey, "full")
        .select(
            F.coalesce(c.c_nationkey, s.s_nationkey).alias("nationkey"),
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        )
        .orderBy("nationkey")
    )


JOIN_FULL_SQL = """
SELECT COALESCE(c.c_nationkey, s.s_nationkey) AS nationkey,
       COALESCE(n_customers, 0) AS n_customers,
       COALESCE(n_suppliers, 0) AS n_suppliers
FROM (SELECT c_nationkey, COUNT(*) AS n_customers FROM customer GROUP BY c_nationkey) c
FULL JOIN (SELECT s_nationkey, COUNT(*) AS n_suppliers FROM supplier GROUP BY s_nationkey) s
  ON c.c_nationkey = s.s_nationkey
ORDER BY nationkey
"""


def range_join_prompt_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi + range predicate join: lineitems shipped within 30 days of
    their order date, per priority. The equi key carries the shuffle; the
    range predicate evaluates post-join (no cross product)."""
    o = t(spark, sf_dir, "orders")
    l = t(spark, sf_dir, "lineitem")
    return (
        l.join(o, (l.l_orderkey == o.o_orderkey)
               & (l.l_shipdate >= o.o_orderdate)
               & (l.l_shipdate < F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_prompt_items"))
        .orderBy("o_orderpriority")
    )


RANGE_JOIN_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_prompt_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
 AND l_shipdate >= o_orderdate
 AND l_shipdate < o_orderdate + INTERVAL 30 DAY
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

# ---------------------------------------------------------------- aggregation depth


def agg_rollup_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup includes the global ``()`` group — the worst case for an
    order-dependent double SUM (all rows, one accumulator), so sum_qty
    runs as a single exact e2-integer sum like q1's (≤5e3/row keeps a
    BIGINT safe to ~1.8e15 rows globally; VERDICT r10 item 3)."""
    l = t(spark, sf_dir, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(F.sum(F.expr(_QTY_E2)).alias("_qty_e2"),
             F.count(F.lit(1)).alias("n_rows"))
        .select("l_returnflag", "l_linestatus",
                F.expr("CAST(_qty_e2 AS DOUBLE) / 100.0").alias("sum_qty"),
                "n_rows")
        .orderBy(F.col("l_returnflag").asc_nulls_first(), F.col("l_linestatus").asc_nulls_first())
    )


AGG_ROLLUP_SQL = f"""
SELECT l_returnflag, l_linestatus,
       CAST(SUM({_QTY_E2}) AS DOUBLE) / 100.0 AS sum_qty,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
"""


def agg_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"),
             F.round(F.avg("o_totalprice"), 2).alias("avg_price"))
        .orderBy(F.col("o_orderstatus").asc_nulls_first(), F.col("o_orderpriority").asc_nulls_first())
    )


AGG_CUBE_SQL = """
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n_orders,
       ROUND(AVG(o_totalprice), 2) AS avg_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
"""


def agg_stats_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates incl. exact distinct count (two-level agg).
    Measures run through finite() (r18 contract): one NaN row made
    DuckDB's STDDEV_SAMP throw OutOfRange while Spark returned NaN —
    non-finite → NULL drops out of every moment identically."""
    l = t(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp(finite("l_extendedprice")), 4).alias("std_price"),
            F.round(F.var_samp(finite("l_discount")), 6).alias("var_disc"),
            F.round(F.min(finite("l_extendedprice")), 2).alias("min_price"),
            F.round(F.max(finite("l_extendedprice")), 2).alias("max_price"),
            F.countDistinct("l_suppkey").alias("n_supp"),
        )
        .orderBy("l_returnflag")
    )


AGG_STATS_SQL = f"""
SELECT l_returnflag,
       ROUND(STDDEV_SAMP({finite_sql('l_extendedprice')}), 4) AS std_price,
       ROUND(VAR_SAMP({finite_sql('l_discount')}), 6) AS var_disc,
       ROUND(MIN({finite_sql('l_extendedprice')}), 2) AS min_price,
       ROUND(MAX({finite_sql('l_extendedprice')}), 2) AS max_price,
       COUNT(DISTINCT l_suppkey) AS n_supp,
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""

# ---------------------------------------------------------------- sorts / top-k


def topk_expensive_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans TakeOrderedAndProject — no full sort,
    per-partition heaps + driver merge; the scalable form of O1+O2."""
    o = t(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("o_totalprice"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(25)
    )


TOPK_SQL = """
SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 25
"""


def sort_customers_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global multi-column sort — Exchange rangepartitioning (X2+O1+O2
    generalized; sampled boundaries replace MasterNode.java:154-164)."""
    c = t(spark, sf_dir, "customer")
    return (
        c.select("c_custkey", "c_mktsegment", F.round("c_acctbal", 2).alias("c_acctbal"))
        .orderBy(F.col("c_mktsegment").asc(), F.col("c_acctbal").desc(), F.col("c_custkey").asc())
    )


SORT_MULTI_SQL = """
SELECT c_custkey, c_mktsegment, ROUND(c_acctbal, 2) AS c_acctbal
FROM customer
ORDER BY c_mktsegment ASC, c_acctbal DESC, c_custkey ASC
"""

# ---------------------------------------------------------------- set ops


def set_ops_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION in one result: tag per membership class
    of nation keys across customer vs supplier."""
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").cast("int").alias("nationkey")).distinct()
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").cast("int").alias("nationkey")).distinct()
    both = c.intersect(s).withColumn("membership", F.lit("both"))
    c_only = c.exceptAll(s).withColumn("membership", F.lit("customer_only"))
    s_only = s.exceptAll(c).withColumn("membership", F.lit("supplier_only"))
    return both.unionByName(c_only).unionByName(s_only).orderBy("nationkey")


SET_OPS_SQL = """
WITH c AS (SELECT DISTINCT c_nationkey::INT AS nationkey FROM customer),
     s AS (SELECT DISTINCT s_nationkey::INT AS nationkey FROM supplier)
SELECT nationkey, 'both' AS membership FROM (SELECT nationkey FROM c INTERSECT SELECT nationkey FROM s)
UNION ALL
SELECT nationkey, 'customer_only' AS membership FROM (SELECT nationkey FROM c EXCEPT SELECT nationkey FROM s)
UNION ALL
SELECT nationkey, 'supplier_only' AS membership FROM (SELECT nationkey FROM s EXCEPT SELECT nationkey FROM c)
ORDER BY nationkey
"""

# ---------------------------------------------------------------- windows


def window_topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via row_number — the scalable alternative to a
    global sort when k × groups ≪ rows."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return (
        o.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "rk", "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"))
        .orderBy("o_custkey", "rk")
    )


WINDOW_TOPK_SQL = """
SELECT o_custkey, CAST(rk AS INT) AS rk, o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
  FROM orders
)
WHERE rk <= 3
ORDER BY o_custkey, rk
"""


def window_running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running cumulative sum per customer over order time (rows frame)."""
    o = t(spark, sf_dir, "orders")
    w = (Window.partitionBy("o_custkey")
         .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        o.select(
            "o_custkey", "o_orderkey", "o_orderdate",
            # exact-cents running sum (plans/base.py block): the frame
            # prefix IS an order-dependent accumulation by construction
            dollars(F.sum(cents("o_totalprice")).over(w), "running_spend"),
        )
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    )


WINDOW_RUNNING_SQL = f"""
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(SUM({cents_sql('o_totalprice')}) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 100.0
         AS running_spend
FROM orders
ORDER BY o_custkey, o_orderdate, o_orderkey
"""


def window_lag_gap_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() analytic: days since the customer's previous order."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
    return (
        o.select(
            "o_custkey", "o_orderkey",
            F.datediff(F.col("o_orderdate"), F.lag("o_orderdate", 1).over(w)).alias("gap_days"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


WINDOW_LAG_SQL = """
SELECT o_custkey, o_orderkey,
       DATE_DIFF('day',
                 LAG(o_orderdate, 1) OVER (PARTITION BY o_custkey
                                           ORDER BY o_orderdate ASC, o_orderkey ASC),
                 o_orderdate)::INT AS gap_days
FROM orders
ORDER BY o_custkey, o_orderkey
"""

def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returns per customer, top 20."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp")))
    l = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = t(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(*_rev_sums())
        .select("c_custkey", "c_name", "n_name", _rev_money())
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


Q10_SQL = f"""
SELECT c_custkey, c_name, n_name, {_REV_MONEY_SQL} AS revenue
FROM (
  SELECT c_custkey, c_name, n_name, {_REV_SUMS_SQL}
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  WHERE l_returnflag = 'R'
    AND o_orderdate >= TIMESTAMP '1997-01-01'
    AND o_orderdate < TIMESTAMP '1997-07-01'
  GROUP BY c_custkey, c_name, n_name
)
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING on an aggregate (orders whose total
    quantity exceeds a threshold), joined back for customer context."""
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    # total_qty as an exact e2-integer sum; the HAVING compares exact
    # integers (150.00 → 15000 e2 units), never a rounded double near
    # the threshold (the q11 HAVING fix applied here; VERDICT r10 item 3).
    big = (l.groupBy("l_orderkey")
           .agg(F.sum(F.expr(_QTY_E2)).alias("_qty_e2"))
           .filter(F.col("_qty_e2") > 15000)
           .select("l_orderkey",
                   F.expr("CAST(_qty_e2 AS DOUBLE) / 100.0").alias("total_qty")))
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select("c_custkey", "c_name", "o_orderkey",
                F.round("o_totalprice", 2).alias("o_totalprice"), "total_qty")
        .orderBy(F.col("o_orderkey").asc())
    )


Q18_SQL = f"""
SELECT c_custkey, c_name, o_orderkey,
       ROUND(o_totalprice, 2) AS o_totalprice, total_qty
FROM (
  SELECT l_orderkey, CAST(SUM({_QTY_E2}) AS DOUBLE) / 100.0 AS total_qty
  FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM({_QTY_E2}) > 15000
)
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_orderkey ASC
"""


def window_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The complete ranking family in one plan: rank, dense_rank,
    percent_rank, cume_dist, ntile — per market segment over acctbal."""
    c = t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc())
    return (
        c.select(
            "c_mktsegment", "c_custkey",
            F.rank().over(w).cast("long").alias("rnk"),
            F.dense_rank().over(w).cast("long").alias("drnk"),
            F.round(F.percent_rank().over(w), 6).alias("prnk"),
            F.round(F.cume_dist().over(w), 6).alias("cdist"),
            F.ntile(4).over(w).cast("long").alias("quartile"),
        )
        .orderBy("c_mktsegment", "c_custkey")
    )


WINDOW_RANK_FAMILY_SQL = """
SELECT c_mktsegment, c_custkey,
       RANK() OVER w AS rnk,
       DENSE_RANK() OVER w AS drnk,
       ROUND(PERCENT_RANK() OVER w, 6) AS prnk,
       ROUND(CUME_DIST() OVER w, 6) AS cdist,
       NTILE(4) OVER w AS quartile
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC)
ORDER BY c_mktsegment, c_custkey
"""


def string_functions_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function surface: pad, translate, replace, position,
    reverse, repeat, predicates."""
    n = t(spark, sf_dir, "nation")
    return (
        n.select(
            "n_nationkey",
            F.lpad("n_name", 12, "*").alias("padded"),
            F.translate("n_name", "_N", "-n").alias("translated"),
            F.replace(F.col("n_name"), F.lit("NATION"), F.lit("COUNTRY")).alias("replaced"),
            F.instr(F.col("n_name"), "_").cast("long").alias("underscore_at"),
            F.reverse(F.col("n_name")).alias("reversed"),
            F.repeat(F.substring("n_name", 1, 1), 3).alias("tripled"),
            F.col("n_name").startswith("NATION").cast("int").alias("is_nation"),
            F.col("n_name").endswith("_1").cast("int").alias("ends_1"),
        )
        .orderBy("n_nationkey")
    )


STRING_FUNCS_SQL = """
SELECT n_nationkey,
       lpad(n_name, 12, '*') AS padded,
       translate(n_name, '_N', '-n') AS translated,
       replace(n_name, 'NATION', 'COUNTRY') AS replaced,
       strpos(n_name, '_')::BIGINT AS underscore_at,
       reverse(n_name) AS reversed,
       repeat(substr(n_name, 1, 1), 3) AS tripled,
       CAST(starts_with(n_name, 'NATION') AS INT) AS is_nation,
       CAST(n_name LIKE '%\\_1' ESCAPE '\\' AS INT) AS ends_1
FROM nation
ORDER BY n_nationkey
"""


def lineitem_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unpivot (melt): wide measure columns to (measure, value) long form
    — the inverse of events_pivot_types. Restricted to one order's items
    to keep the golden sharp."""
    l = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 100)
    return (
        l.unpivot(
            ids=["l_orderkey", "l_linenumber"],
            values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
            variableColumnName="measure",
            valueColumnName="value",
        )
        .select("l_orderkey", "l_linenumber", "measure",
                F.round("value", 4).alias("value"))
        .orderBy("l_orderkey", "l_linenumber", "measure")
    )


UNPIVOT_SQL = """
SELECT l_orderkey, l_linenumber, measure, ROUND(value, 4) AS value
FROM (
  SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS value
  FROM lineitem WHERE l_orderkey <= 100
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
  FROM lineitem WHERE l_orderkey <= 100
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
  FROM lineitem WHERE l_orderkey <= 100
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
  FROM lineitem WHERE l_orderkey <= 100
)
ORDER BY l_orderkey, l_linenumber, measure
"""


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs predicates across the join — Catalyst
    distributes the common join key out of the disjunction."""
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    cond = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size").between(1, 15))
         & (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 30))
        | ((F.col("p_brand") == "Brand#2") & (F.col("p_size").between(10, 30))
           & (F.col("l_quantity") >= 5) & (F.col("l_quantity") <= 40))
    )
    return (
        l.join(broadcast(p), l.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(*_rev_sums(), F.count(F.lit(1)).alias("n_items"))
        .select(_rev_money(), "n_items")
    )


Q19_SQL = f"""
SELECT {_REV_MONEY_SQL} AS revenue, n_items
FROM (
  SELECT {_REV_SUMS_SQL}, COUNT(*) AS n_items
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
         AND l_quantity BETWEEN 1 AND 30)
     OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
         AND l_quantity BETWEEN 5 AND 40)
)
"""


def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar subquery (global average) + anti join —
    above-average-balance customers with no orders in a window."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
    # Scalar subquery as a broadcast cross join: the global average stays
    # inside ONE lazy plan (no driver .collect() → no double customer scan
    # at 100 TB; the 1-row agg is broadcast to every partition).
    # The above-average threshold compares EXACT integers — bal > sum/n
    # as bal_cents·n > sum_cents (same move as q11's HAVING): a double
    # AVG is order-dependent, and a customer sitting exactly at an
    # exactly-2-decimal average could flip membership between engines.
    # Product bound: max cents 1.1e6 × n customers < 2^63 to ~8e12 rows.
    bal = c.filter(F.col("c_acctbal") > 0).agg(
        F.sum(cents("c_acctbal")).alias("_bal_c"),
        F.count(F.lit(1)).alias("_bal_n"))
    return (
        c.crossJoin(broadcast(bal))
        .filter(cents("c_acctbal") * F.col("_bal_n") > F.col("_bal_c"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"),
             F.sum(cents("c_acctbal")).alias("_tb_c"))
        .select("c_mktsegment", "n_customers", dollars("_tb_c", "total_bal"))
        .orderBy("c_mktsegment")
    )


Q22_SQL = f"""
WITH bal AS (
  SELECT SUM({cents_sql('c_acctbal')}) AS bal_c, COUNT(*) AS bal_n
  FROM customer WHERE c_acctbal > 0
)
SELECT c_mktsegment, COUNT(*) AS n_customers,
       CAST(SUM({cents_sql('c_acctbal')}) AS DOUBLE) / 100.0 AS total_bal
FROM customer, bal
WHERE {cents_sql('c_acctbal')} * bal_n > bal_c
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def window_value_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value over an explicit frame."""
    o = t(spark, sf_dir, "orders")
    w = (Window.partitionBy("o_custkey")
         .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
         .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
    return (
        o.select(
            "o_custkey", "o_orderkey",
            F.first("o_orderkey").over(w).alias("first_order"),
            F.last("o_orderkey").over(w).alias("last_order"),
            F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


WINDOW_VALUE_SQL = """
SELECT o_custkey, o_orderkey,
       FIRST_VALUE(o_orderkey) OVER w AS first_order,
       LAST_VALUE(o_orderkey) OVER w AS last_order,
       NTH_VALUE(o_orderkey, 2) OVER w AS second_order
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
ORDER BY o_custkey, o_orderkey
"""


def q13_order_count_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: double aggregation — orders per customer, then
    the histogram of those counts (including zero-order customers via
    the outer join)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy(F.col("n_customers").desc(), F.col("c_count").desc())
    )


Q13_SQL = """
SELECT c_count, COUNT(*) AS n_customers
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey
   AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY n_customers DESC, c_count DESC
"""


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: group aggregate kept only if it exceeds a
    fraction of the GLOBAL total (HAVING vs scalar subquery). The
    threshold comparison is EXACT INTEGER, not double: a supplier
    sitting at the 1.05% cutoff must not flip membership between
    engines on an order-dependent double sum (same class as the money
    sums; ``sv > 0.0105·total ⇔ 10000·sv_e4 > 105·total_e4``). The
    per-supplier e4 sum recombines to ONE BIGINT: worst-case _STOCK_E4
    is ~5.3e10/row, so 2^63 is reached near ~1.7e8 WORST-CASE rows per
    supplier (~1e9-1e10 at average values) — ample for TPC-H, where
    rows-per-supplier is bounded (~600 at any SF), but NOT a general
    1e12-rows/group bound (ADVICE r10); a skewed non-TPC-H supplier key
    would need the split form kept through the comparison. Only the
    global total — which passes 2^63 far earlier — widens to
    DECIMAL(38,0), a per-supplier scalar op on the tiny second-level
    agg, not a per-row cost."""
    l = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    per_supp = (
        l.join(s, l.l_suppkey == s.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(*_part_sums(_STOCK_E4, 100, "sv"))
        .select("s_suppkey", "s_name",
                F.expr("_sv_c * 100 + _sv_s").alias("_sv_e4"))
    )
    # Global total via broadcast cross join, not a driver .collect():
    # the shared per_supp subplan is computed once (ReusedExchange) instead
    # of two full lineitem⋈supplier scans.
    total = per_supp.agg(
        F.sum(F.expr("CAST(_sv_e4 AS DECIMAL(38,0))")).alias("_total_e4"))
    return (
        per_supp.crossJoin(broadcast(total))
        .filter(F.expr("CAST(_sv_e4 AS DECIMAL(38,0)) * 10000"
                       " > 105 * _total_e4"))
        .select("s_suppkey", "s_name",
                F.expr("CAST((_sv_e4 + 50) div 100 AS DOUBLE) / 100.0")
                .alias("stock_value"))
        .orderBy(F.col("stock_value").desc(), F.col("s_suppkey").asc())
    )


Q11_SQL = f"""
WITH per_supp AS (
  SELECT s_suppkey, s_name, _sv_c * 100 + _sv_s AS _sv_e4
  FROM (
    SELECT s_suppkey, s_name, {_part_sums_sql(_STOCK_E4, 100, 'sv')}
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_suppkey, s_name
  )
)
SELECT s_suppkey, s_name,
       CAST((_sv_e4 + 50) // 100 AS DOUBLE) / 100.0 AS stock_value
FROM per_supp
WHERE CAST(_sv_e4 AS HUGEINT) * 10000
      > 105 * (SELECT SUM(_sv_e4) FROM per_supp)
ORDER BY stock_value DESC, s_suppkey ASC
"""


def q16_supplier_cnt_by_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: NOT IN subquery (excluded suppliers) + distinct
    count per part attribute group."""
    p = t(spark, sf_dir, "part").filter(F.col("p_type") != "PROMO")
    l = t(spark, sf_dir, "lineitem")
    excluded = t(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 500).select("s_suppkey")
    return (
        l.join(broadcast(p), l.l_partkey == p.p_partkey)
        .join(excluded, l.l_suppkey == excluded.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), F.col("p_brand").asc(), F.col("p_type").asc())
    )


Q16_SQL = """
SELECT p_brand, p_type, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_type <> 'PROMO'
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 500)
GROUP BY p_brand, p_type
ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: a nation's share of regional revenue per year —
    conditional aggregation (share = sum(if)/sum) over the full star."""
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    n_c = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("c_region"))
    n_s = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    # both the share's numerator and denominator are exact integer e4
    # sums (hi/lo split); the ratio is then double-of-the-same-integers
    # in both engines, so ROUND(...,6) cannot diverge
    is_n3 = F.col("supp_nation") == "NATION_3"
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(broadcast(n_c), c.c_nationkey == F.col("cn_key"))
        .join(broadcast(n_s), s.s_nationkey == F.col("sn_key"))
        .join(broadcast(r), F.col("c_region") == r.r_regionkey)
        .withColumn("o_year", F.year("o_orderdate"))
        .withColumn("_rc", F.expr(f"{_REV_E4} div 100"))
        .withColumn("_rs", F.expr(f"{_REV_E4} % 100"))
        .groupBy("o_year")
        .agg(
            F.coalesce(F.sum(F.when(is_n3, F.col("_rc"))), F.lit(0))
            .alias("_n3_c"),
            F.coalesce(F.sum(F.when(is_n3, F.col("_rs"))), F.lit(0))
            .alias("_n3_s"),
            F.sum("_rc").alias("_rev_c"),
            F.sum("_rs").alias("_rev_s"),
        )
        .select(
            "o_year",
            F.expr("ROUND((CAST(_n3_c AS DOUBLE) * 100.0"
                   " + CAST(_n3_s AS DOUBLE))"
                   " / (CAST(_rev_c AS DOUBLE) * 100.0"
                   " + CAST(_rev_s AS DOUBLE)), 6)").alias("mkt_share"),
            _rev_money("total_volume"),
        )
        .orderBy("o_year")
    )


Q8_SQL = f"""
SELECT o_year,
       ROUND((CAST(_n3_c AS DOUBLE) * 100.0 + CAST(_n3_s AS DOUBLE))
             / (CAST(_rev_c AS DOUBLE) * 100.0 + CAST(_rev_s AS DOUBLE)),
             6) AS mkt_share,
       {_REV_MONEY_SQL} AS total_volume
FROM (
  SELECT EXTRACT(year FROM o_orderdate)::INT AS o_year,
         COALESCE(SUM(CASE WHEN ns.n_name = 'NATION_3'
                           THEN ({_REV_E4}) // 100 END), 0) AS _n3_c,
         COALESCE(SUM(CASE WHEN ns.n_name = 'NATION_3'
                           THEN ({_REV_E4}) % 100 END), 0) AS _n3_s,
         {_REV_SUMS_SQL}
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation nc ON c_nationkey = nc.n_nationkey
  JOIN nation ns ON s_nationkey = ns.n_nationkey
  JOIN region ON nc.n_regionkey = r_regionkey
  WHERE r_name = 'ASIA'
  GROUP BY 1
)
ORDER BY o_year
"""


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: chained EXISTS / NOT EXISTS over aliases of the
    same relation — suppliers whose lineitem was the ONLY late one in a
    multi-supplier order. Each correlated predicate becomes one
    semi/anti join."""
    l = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    o_all = t(spark, sf_dir, "orders")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 45 DAYS")

    # One pass over the fact instead of three self-joins: reduce to the
    # (order, supplier) grain, then per-order window stats decide both
    # correlated predicates at once — EXISTS(other supplier) ⟺
    # n_supp ≥ 2, NOT EXISTS(other LATE supplier) ⟺ n_late_supp = 1
    # (the row's own supplier is late). The inequality self-joins of the
    # literal translation are the part that cannot scale: each is a
    # near-cross-join within every multi-line order.
    jo = (
        l.select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(o_all.select("o_orderkey", "o_orderdate", "o_orderstatus"),
              l.l_orderkey == F.col("o_orderkey"))
        .withColumn("is_late", late.cast("int"))
    )
    per_os = jo.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("is_late").alias("late_any"),
        F.max("o_orderstatus").alias("o_status"))
    w = Window.partitionBy("l_orderkey")
    flagged = (
        per_os
        .withColumn("n_supp", F.count(F.lit(1)).over(w))
        .withColumn("n_late_supp", F.sum("late_any").over(w))
    )
    sole_late = (
        flagged.filter((F.col("late_any") == 1)
                       & (F.col("o_status") == "F")
                       & (F.col("n_supp") >= 2)
                       & (F.col("n_late_supp") == 1))
        .select("l_orderkey", "l_suppkey")
    )
    return (
        sole_late.join(s, sole_late.l_suppkey == s.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.countDistinct("l_orderkey").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_suppkey").asc())
    )


Q21_SQL = """
SELECT s_suppkey, s_name, COUNT(DISTINCT l1.l_orderkey) AS numwait
FROM lineitem l1
JOIN orders ON l1.l_orderkey = o_orderkey
JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 45 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  JOIN orders o3 ON l3.l_orderkey = o3.o_orderkey
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o3.o_orderdate + INTERVAL 45 DAY)
GROUP BY s_suppkey, s_name
ORDER BY numwait DESC, s_suppkey ASC
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: revenue 'view' + equality with its MAX (no limit
    — ties all surface, which is the point of the original)."""
    # The explicit isnotnull(l_suppkey) mirrors the null filter the supplier
    # join pushes into the main branch — with both branches canonically
    # identical, Spark reuses the revenue exchange instead of scanning
    # lineitem twice.
    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        & F.col("l_suppkey").isNotNull())
    s = t(spark, sf_dir, "supplier")
    revenue = (
        l.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(*_rev_sums())
        .select("supplier_no", _rev_money("total_revenue"))
    )
    # MAX as a broadcast cross join keeps the revenue agg in one lazy plan
    # (ReusedExchange) instead of a driver .collect() + second lineitem scan.
    max_rev = revenue.agg(F.max("total_revenue").alias("_max_rev"))
    return (
        revenue.crossJoin(broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("_max_rev"))
        .join(s, revenue.supplier_no == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


Q15_SQL = f"""
WITH revenue AS (
  SELECT supplier_no, {_REV_MONEY_SQL} AS total_revenue
  FROM (
    SELECT l_suppkey AS supplier_no, {_REV_SUMS_SQL}
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1997-04-01'
    GROUP BY l_suppkey
  )
)
SELECT s_suppkey, s_name, total_revenue
FROM revenue
JOIN supplier ON supplier_no = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: per-part correlated average — lineitems below
    20% of their part's mean quantity. The correlated subquery becomes a
    broadcast of the per-part aggregate."""
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    # exact integer-cents average (cross-engine round-tie discipline)
    per_part = (
        l.groupBy(F.col("l_partkey").alias("pk"))
        .agg((F.sum(F.expr(_QTY_E2))
              / (F.count(F.lit(1)) * 100.0)).alias("avg_qty"))
    )
    # avg_yearly from an exact integer-cents sum: SUM(double) is
    # order-dependent and was the one remaining money sum in the .005
    # tie class (ADVICE r9). sum_cents/700 can never land exactly on a
    # half-cent boundary (2·sum_cents = 7·odd has no integer solution),
    # so the same exact BIGINT → same double → same ROUND in both
    # engines, at any scale.
    return (
        l.join(broadcast(p), l.l_partkey == p.p_partkey)
        .join(broadcast(per_part), l.l_partkey == F.col("pk"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(F.sum(F.expr(_PRICE_C)).alias("_ep_c"),
             F.count(F.lit(1)).alias("n_items"))
        .select(F.expr("ROUND(CAST(_ep_c AS DOUBLE) / 700.0, 2)")
                .alias("avg_yearly"), "n_items")
    )


Q17_SQL = f"""
WITH per_part AS (
  SELECT l_partkey AS pk,
         SUM({_QTY_E2}) / (COUNT(*) * 100.0) AS avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT ROUND(CAST(_ep_c AS DOUBLE) / 700.0, 2) AS avg_yearly, n_items
FROM (
  SELECT SUM({_PRICE_C}) AS _ep_c, COUNT(*) AS n_items
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN per_part ON l_partkey = pk
  WHERE p_brand = 'Brand#3'
    AND l_quantity < 0.2 * avg_qty
)
"""


# ---------------------------------------------------------------- scalar-function surface


def functions_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String / date / math / conditional scalar functions in one plan —
    the curated facade exercised end-to-end (SURVEY §7.2 step 2).
    o_totalprice runs through finite() (r18): Spark compares NaN as
    greater-than-everything (bucket 'high') where DuckDB follows IEEE
    (false → 'low') — non-finite → NULL takes the same CASE fallthrough
    on both engines, and sqrt/ln of NULL is NULL rather than NaN."""
    o = t(spark, sf_dir, "orders")
    price = finite("o_totalprice")
    return (
        o.select(
            "o_orderkey",
            F.concat(F.upper(F.substring("o_orderpriority", 1, 1)),
                     F.lit("/"), F.lower("o_orderstatus")).alias("pri_code"),
            F.length("o_orderpriority").alias("pri_len"),
            F.year("o_orderdate").alias("o_year"),
            F.month("o_orderdate").alias("o_month"),
            F.round(F.sqrt(F.abs(price)), 4).alias("sqrt_price"),
            F.round(F.ln(price + 1), 4).alias("ln_price"),
            F.when(price > 300000, "high")
             .when(price > 100000, "mid")
             .otherwise("low").alias("bucket"),
        )
        .orderBy("o_orderkey")
    )


FUNCTIONS_SQL = f"""
SELECT o_orderkey,
       UPPER(SUBSTR(o_orderpriority, 1, 1)) || '/' || LOWER(o_orderstatus) AS pri_code,
       LENGTH(o_orderpriority)::INT AS pri_len,
       EXTRACT(year FROM o_orderdate)::INT AS o_year,
       EXTRACT(month FROM o_orderdate)::INT AS o_month,
       ROUND(SQRT(ABS({finite_sql('o_totalprice')})), 4) AS sqrt_price,
       -- positivity arm (r18 --neg census): Spark's ln() returns NULL
       -- for a non-positive argument where DuckDB THROWS — a refund
       -- row (negative price) must yield NULL ln_price on both engines
       CASE WHEN {finite_sql('o_totalprice')} + 1 > 0
            THEN ROUND(LN({finite_sql('o_totalprice')} + 1), 4) END AS ln_price,
       CASE WHEN {finite_sql('o_totalprice')} > 300000 THEN 'high'
            WHEN {finite_sql('o_totalprice')} > 100000 THEN 'mid'
            ELSE 'low' END AS bucket
FROM orders
ORDER BY o_orderkey
"""


def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: supplier-nation × customer-nation trade volume by
    year for a nation pair, both directions. Dims broadcast; the fact
    join carries the shuffle."""
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation"))
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation"))
    pair = (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2") | \
           (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(broadcast(n1), s.s_nationkey == F.col("s_nkey"))
        .join(broadcast(n2), c.c_nationkey == F.col("c_nkey"))
        .filter(pair)
        .withColumn("l_year", F.year("l_shipdate"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(*_rev_sums())
        .select("supp_nation", "cust_nation", "l_year", _rev_money())
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


Q7_SQL = f"""
SELECT supp_nation, cust_nation, l_year, {_REV_MONEY_SQL} AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         EXTRACT(year FROM l_shipdate)::INT AS l_year,
         {_REV_SUMS_SQL}
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
  GROUP BY 1, 2, 3
)
ORDER BY supp_nation, cust_nation, l_year
"""


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit per supplier-nation per year for parts
    matching a name pattern (LIKE pushdown on the part dim)."""
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%")) \
        .select("p_partkey", "p_retailprice")
    n = t(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(broadcast(p), l.l_partkey == p.p_partkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(broadcast(n), s.s_nationkey == n.n_nationkey)
        .withColumn("o_year", F.year("o_orderdate"))
        # profit terms are 4-decimal multiples; double sums of mixed signs
        # land on 2dp rounding ties where engines disagree — sum exact
        # 1e-4-unit integers and floor to cents instead
        .withColumn("profit_e4", F.round(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))
             - F.col("p_retailprice") * F.col("l_quantity")) * 10000).cast("long"))
        .groupBy("n_name", "o_year")
        .agg(F.sum("profit_e4").alias("sum_e4"),
             F.count(F.lit(1)).alias("n_items"))
        .select("n_name", "o_year",
                (F.floor(F.col("sum_e4") / 100.0) / 100.0).alias("profit"), "n_items")
        .orderBy("n_name", "o_year")
    )


Q9_SQL = """
SELECT n_name, o_year, FLOOR(sum_e4 / 100.0) / 100.0 AS profit, n_items
FROM (
  SELECT n_name, EXTRACT(year FROM o_orderdate)::INT AS o_year,
         SUM(CAST(ROUND((l_extendedprice * (1 - l_discount)
                         - p_retailprice * l_quantity) * 10000) AS BIGINT)) AS sum_e4,
         COUNT(*) AS n_items
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%widget%'
  GROUP BY 1, 2
)
ORDER BY n_name, o_year
"""


def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-aggregation ratio (promo revenue
    share) over one month — case-when inside sum."""
    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-06-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp")))
    p = t(spark, sf_dir, "part")
    # numerator, denominator, and their ratio are all derived from the
    # same exact integer e4 sums — engine-identical at any scale
    is_promo = F.col("p_type") == "PROMO"
    return (
        l.join(broadcast(p), l.l_partkey == p.p_partkey)
        .withColumn("_rc", F.expr(f"{_REV_E4} div 100"))
        .withColumn("_rs", F.expr(f"{_REV_E4} % 100"))
        .agg(
            F.coalesce(F.sum(F.when(is_promo, F.col("_rc"))), F.lit(0))
            .alias("_pr_c"),
            F.coalesce(F.sum(F.when(is_promo, F.col("_rs"))), F.lit(0))
            .alias("_pr_s"),
            F.sum("_rc").alias("_rev_c"),
            F.sum("_rs").alias("_rev_s"),
        )
        .select(
            _money("pr", 100, "promo_revenue"),
            _rev_money("total_revenue"),
            F.expr("ROUND((CAST(_pr_c AS DOUBLE) * 100.0"
                   " + CAST(_pr_s AS DOUBLE)) * 100.0"
                   " / (CAST(_rev_c AS DOUBLE) * 100.0"
                   " + CAST(_rev_s AS DOUBLE)), 2)").alias("promo_pct"),
        )
    )


Q14_SQL = f"""
SELECT {_money_sql('pr', 100)} AS promo_revenue,
       {_REV_MONEY_SQL} AS total_revenue,
       ROUND((CAST(_pr_c AS DOUBLE) * 100.0 + CAST(_pr_s AS DOUBLE)) * 100.0
             / (CAST(_rev_c AS DOUBLE) * 100.0 + CAST(_rev_s AS DOUBLE)),
             2) AS promo_pct
FROM (
  SELECT COALESCE(SUM(CASE WHEN p_type = 'PROMO'
                           THEN ({_REV_E4}) // 100 END), 0) AS _pr_c,
         COALESCE(SUM(CASE WHEN p_type = 'PROMO'
                           THEN ({_REV_E4}) % 100 END), 0) AS _pr_s,
         {_REV_SUMS_SQL}
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1997-06-01'
    AND l_shipdate < TIMESTAMP '1997-07-01'
)
"""


def join_right_order_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join (orders ⟖ customer): every customer row kept."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "right")
        .groupBy("c_nationkey")
        .agg(F.count("o_orderkey").alias("n_orders"),
             F.countDistinct("c_custkey").alias("n_customers"))
        .orderBy("c_nationkey")
    )


JOIN_RIGHT_SQL = """
SELECT c_nationkey,
       COUNT(o_orderkey) AS n_orders,
       COUNT(DISTINCT c_custkey) AS n_customers
FROM orders
RIGHT JOIN customer ON o_custkey = c_custkey
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-latest dedup via max_by (argmax) — the standard CDC/upsert
    compaction shape: one aggregation, no window sort.

    Null-ts contract (r17, VERDICT r16 item 1): "latest" is undefined
    for an event with no time, so null-ts events are excluded on BOTH
    sides (Spark max_by and DuckDB arg_max disagree on NULL ordering
    keys — the r16 same-row census surfaced a NULL last_event_id from
    the oracle where Spark still picked a row)."""
    e = t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    # deterministic argmax key: fixed-width (ts, event_id) string —
    # lexicographic order == numeric order, portable across engines
    key = F.format_string("%020d%010d", F.unix_micros("ts"), F.col("event_id"))
    return (
        e.groupBy("user_id")
        .agg(
            F.max_by("event_id", key).alias("last_event_id"),
            F.max("ts").alias("last_ts"),
            F.max_by("event_type", key).alias("last_type"),
        )
        .orderBy("user_id")
    )


LATEST_EVENT_SQL = """
SELECT user_id,
       arg_max(event_id, printf('%020d%010d', epoch_us(ts), event_id)) AS last_event_id,
       MAX(ts) AS last_ts,
       arg_max(event_type, printf('%020d%010d', epoch_us(ts), event_id)) AS last_type
FROM events
WHERE ts IS NOT NULL
GROUP BY user_id
ORDER BY user_id
"""


def window_trailing_30d_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame: per-customer trailing-30-day spend (value-based frame
    over days-since-epoch — range frames complete the rows-frame surface)."""
    o = t(spark, sf_dir, "orders").withColumn(
        "day", F.datediff("o_orderdate", F.lit("1970-01-01").cast("timestamp")))
    w = (Window.partitionBy("o_custkey").orderBy("day")
         .rangeBetween(-30, 0))
    return (
        o.select(
            "o_custkey", "o_orderkey", "day",
            # exact-cents range-frame sum (plans/base.py block)
            dollars(F.sum(cents("o_totalprice")).over(w), "spend_30d"),
        )
        .orderBy("o_custkey", "day", "o_orderkey")
    )


WINDOW_RANGE_SQL = f"""
WITH d AS (
  SELECT o_custkey, o_orderkey, o_totalprice,
         date_diff('day', TIMESTAMP '1970-01-01', o_orderdate)::INT AS day
  FROM orders
)
SELECT o_custkey, o_orderkey, day,
       CAST(SUM({cents_sql('o_totalprice')}) OVER (
         PARTITION BY o_custkey ORDER BY day
         RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE) / 100.0
         AS spend_30d
FROM d
ORDER BY o_custkey, day, o_orderkey
"""


def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (linear interpolation) per group — Spark
    `percentile` and DuckDB `quantile_cont` share the definition.
    The measure runs through finite() (r18): Spark's percentile ranks
    NaN as the greatest value where DuckDB's quantile_cont poisons the
    whole quantile to NaN — non-finite → NULL is skipped identically."""
    l = t(spark, sf_dir, "lineitem")
    price = finite("l_extendedprice")
    return (
        l.groupBy("l_linestatus")
        .agg(
            F.round(F.percentile(price, 0.25), 4).alias("p25"),
            F.round(F.percentile(price, 0.5), 4).alias("p50"),
            F.round(F.percentile(price, 0.75), 4).alias("p75"),
        )
        .orderBy("l_linestatus")
    )


AGG_PERCENTILES_SQL = f"""
SELECT l_linestatus,
       ROUND(quantile_cont({finite_sql('l_extendedprice')}, 0.25), 4) AS p25,
       ROUND(quantile_cont({finite_sql('l_extendedprice')}, 0.50), 4) AS p50,
       ROUND(quantile_cont({finite_sql('l_extendedprice')}, 0.75), 4) AS p75
FROM lineitem
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


SPECS: list[QuerySpec] = [
    QuerySpec("q1_pricing_summary", q1_pricing_summary, Q1_SQL,
              "TPC-H Q1: multi-measure hash agg (reference A1 generalized)"),
    QuerySpec("q7_nation_volume", q7_nation_volume, Q7_SQL,
              "TPC-H Q7: nation-pair trade volume, dual-dim join"),
    QuerySpec("q9_product_profit", q9_product_profit, Q9_SQL,
              "TPC-H Q9: profit per nation-year, LIKE-filtered part dim"),
    QuerySpec("q14_promo_share", q14_promo_share, Q14_SQL,
              "TPC-H Q14: conditional-agg ratio (promo share)"),
    QuerySpec("join_right_order_customer", join_right_order_customer, JOIN_RIGHT_SQL,
              "right outer join + agg"),
    QuerySpec("latest_event_per_user", latest_event_per_user, LATEST_EVENT_SQL,
              "keep-latest dedup via max_by argmax"),
    QuerySpec("window_trailing_30d_spend", window_trailing_30d_spend, WINDOW_RANGE_SQL,
              "RANGE-frame trailing 30-day window"),
    QuerySpec("agg_percentiles", agg_percentiles, AGG_PERCENTILES_SQL,
              "exact interpolated percentiles"),
    QuerySpec("q3_shipping_priority", q3_shipping_priority, Q3_SQL,
              "3-way join + agg + top-k"),
    QuerySpec("q5_local_supplier_volume", q5_local_supplier_volume, Q5_SQL,
              "6-table star join w/ broadcast dims"),
    QuerySpec("q6_forecast_revenue", q6_forecast_revenue, Q6_SQL,
              "scan+filter+scalar agg, pushdown showcase"),
    QuerySpec("join_left_order_counts", join_left_order_counts, JOIN_LEFT_SQL,
              "left outer join + agg"),
    QuerySpec("join_semi_big_spenders", join_semi_big_spenders, JOIN_SEMI_SQL,
              "left-semi join (EXISTS)"),
    QuerySpec("join_anti_inactive", join_anti_inactive, JOIN_ANTI_SQL,
              "left-anti join (NOT EXISTS)"),
    QuerySpec("join_full_nation_presence", join_full_nation_presence, JOIN_FULL_SQL,
              "full outer join of two aggs"),
    QuerySpec("range_join_prompt_ship", range_join_prompt_ship, RANGE_JOIN_SQL,
              "equi+range predicate join"),
    QuerySpec("agg_rollup_lineitem", agg_rollup_lineitem, AGG_ROLLUP_SQL,
              "ROLLUP grouping sets"),
    QuerySpec("agg_cube_orders", agg_cube_orders, AGG_CUBE_SQL,
              "CUBE grouping sets"),
    QuerySpec("agg_stats_by_flag", agg_stats_by_flag, AGG_STATS_SQL,
              "stddev/var/min/max/count-distinct"),
    QuerySpec("topk_expensive_orders", topk_expensive_orders, TOPK_SQL,
              "global top-k (TakeOrderedAndProject)"),
    QuerySpec("sort_customers_multi", sort_customers_multi, SORT_MULTI_SQL,
              "global multi-column range sort (X2+O1+O2)"),
    QuerySpec("set_ops_nations", set_ops_nations, SET_OPS_SQL,
              "intersect/except/union"),
    QuerySpec("window_topk_orders_per_customer", window_topk_orders_per_customer,
              WINDOW_TOPK_SQL, "row_number per-group top-k"),
    QuerySpec("window_running_spend", window_running_spend, WINDOW_RUNNING_SQL,
              "cumulative sum, rows frame"),
    QuerySpec("window_lag_gap_days", window_lag_gap_days, WINDOW_LAG_SQL,
              "lag analytic"),
    QuerySpec("functions_showcase", functions_showcase, FUNCTIONS_SQL,
              "string/date/math/conditional scalar functions"),
    QuerySpec("q10_returned_items", q10_returned_items, Q10_SQL,
              "TPC-H Q10: returned-item revenue, 4-way join top-k"),
    QuerySpec("q18_large_orders", q18_large_orders, Q18_SQL,
              "TPC-H Q18: HAVING on aggregate + join back"),
    QuerySpec("window_rank_family", window_rank_family, WINDOW_RANK_FAMILY_SQL,
              "rank/dense_rank/percent_rank/cume_dist/ntile"),
    QuerySpec("string_functions_showcase", string_functions_showcase, STRING_FUNCS_SQL,
              "pad/translate/replace/position/reverse/repeat/predicates"),
    QuerySpec("lineitem_unpivot_measures", lineitem_unpivot_measures, UNPIVOT_SQL,
              "unpivot/melt wide measures to long form"),
    QuerySpec("q19_disjunctive_revenue", q19_disjunctive_revenue, Q19_SQL,
              "TPC-H Q19: OR-of-ANDs predicates across a join"),
    QuerySpec("q13_order_count_histogram", q13_order_count_histogram, Q13_SQL,
              "TPC-H Q13: double aggregation histogram incl. zeros"),
    QuerySpec("q11_important_stock", q11_important_stock, Q11_SQL,
              "TPC-H Q11: HAVING vs global-total scalar subquery"),
    QuerySpec("q16_supplier_cnt_by_part", q16_supplier_cnt_by_part, Q16_SQL,
              "TPC-H Q16: NOT IN exclusion + distinct count"),
    QuerySpec("q8_market_share", q8_market_share, Q8_SQL,
              "TPC-H Q8: market-share ratio via conditional agg, 7-table star"),
    QuerySpec("q21_waiting_suppliers", q21_waiting_suppliers, Q21_SQL,
              "TPC-H Q21: chained EXISTS/NOT EXISTS self-joins"),
    QuerySpec("q15_top_supplier", q15_top_supplier, Q15_SQL,
              "TPC-H Q15: revenue view + max-equality (ties surface)"),
    QuerySpec("q17_small_quantity_revenue", q17_small_quantity_revenue, Q17_SQL,
              "TPC-H Q17: per-part correlated average filter"),
    QuerySpec("q22_idle_rich_customers", q22_idle_rich_customers, Q22_SQL,
              "TPC-H Q22: scalar subquery + anti join"),
    QuerySpec("window_value_functions", window_value_functions, WINDOW_VALUE_SQL,
              "first/last/nth_value over explicit frames"),
]
