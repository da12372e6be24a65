"""Test-star-schema loaders.

Generalizes the reference's source operator S1 (driver-side
``Files.readString`` over CLI paths, /root/reference/src/MasterNode.java:64-66)
into distributed, schema-aware scans. Nothing is ever materialized on the
driver — the #1 scale ceiling of the reference (SURVEY §4.3).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# Small dimensions a planner should broadcast in joins at any scale.
BROADCAST_TABLES = frozenset({"region", "nation"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one parquet table. Column pruning / predicate pushdown are left
    to Catalyst — callers express plans declaratively and the scan narrows
    itself (verify with .explain: PushedFilters / ReadSchema).

    `events.ts` has shipped as TIMESTAMP(NANOS) parquet (Spark can't read
    it natively — [PARQUET_TYPE_ILLEGAL] — so nanos are read as long and
    converted, exact for this data) and as TIMESTAMP(MICROS) (read as
    TIMESTAMP_NTZ). Both normalize to session-zone TimestampType here —
    the session zone is pinned UTC (session.py), so the value equals the
    naive instant DuckDB sees, and downstream epoch math (`unix_micros`)
    stays valid. This is the ONLY place ts typing is handled."""
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        from pyspark.sql import functions as F
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # integer division — ns epoch values exceed double's exact range
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # Zone-explicit conversion (ADVICE r4): the NTZ wall-clock IS
            # the UTC instant for this data. A plain cast interprets the
            # naive value in spark.sql.session.timeZone — correct only
            # because the engine pins UTC elsewhere; a raw session with a
            # local zone would silently shift every instant. timestampdiff
            # is pure NTZ arithmetic (no zone involved), so epoch micros —
            # and the instant built from them — are session-zone-invariant.
            df = df.withColumn("ts", F.timestamp_micros(F.expr(
                "timestampdiff(MICROSECOND,"
                " TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str, names=TABLE_NAMES) -> None:
    """Register temp views so spark.sql(...) queries mirror the DuckDB
    oracle's pre-registered view names one-to-one."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
