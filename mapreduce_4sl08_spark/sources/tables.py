"""Test-star-schema loaders.

Generalizes the reference's source operator S1 (driver-side
``Files.readString`` over CLI paths, /root/reference/src/MasterNode.java:64-66)
into distributed, schema-aware scans. Nothing is ever materialized on the
driver — the #1 scale ceiling of the reference (SURVEY §4.3).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# Small dimensions a planner should broadcast in joins at any scale.
BROADCAST_TABLES = frozenset({"region", "nation"})

# --------------------------- timestamp-representability quarantine (r19)
#
# The engine's Arrow/pandas crossings (grouped-map operators and any
# toPandas consumer) can only represent timestamps inside the
# datetime64[ns] window [1677-09-21, 2262-04-11] — ONE year-9999 row
# aborted 21 pandas-crossing queries with OutOfBoundsDatetime in the
# r18 census (logs/ts_extremes_census_r18_wide.txt), the "one bad
# record kills a 100 TB job" failure mode. r18 made the class
# observable (dq_constraint_report's *_ts_representable counters);
# this is the r19 ENFORCEMENT (VERDICT r18 item 1): rows whose event
# time lies outside the window are excluded at the scan, the same
# choke-point pattern as base.finite()/vecs(). NULL timestamps are NOT
# quarantined — they belong to the r17 null-ts contract. The window is
# one day of slack inside the true ns bounds on each side, identical
# to the dq counters' definition (plans/quality.py imports these), and
# every oracle that reads a quarantined table applies the same WHERE
# through a mechanically-prepended shadow CTE
# (plans/registry._wrap_ts_quarantine). The quality-gate queries
# (dq report, column profiles) read through quarantine=False — they
# are the upstream census that must still SEE the rows they count.
TS_WINDOW_LO = "1677-09-22 00:00:00"
TS_WINDOW_HI = "2262-04-10 23:59:59"

#: event-time columns the quarantine governs, per table (the only
#: temporal columns in the corpus — pinned against the live parquet
#: schemas by tests/test_plans.py::test_ts_quarantine_cols_cover_schema)
TS_QUARANTINE_COLS: dict[str, tuple[str, ...]] = {
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
    "events": ("ts",),
}


def ts_window_us() -> tuple[int, int]:
    """The quarantine window as epoch-MICROSECOND instants — the
    session-timezone-invariant form for filtering an instant-typed
    (TimestampType) column. A ``TIMESTAMP '<bound>'`` literal is
    interpreted in spark.sql.session.timeZone, so a non-UTC session
    would shift the boundary relative to the batch choke point and the
    oracle (ADVICE r19 item 3); ``timestamp_micros(<exact int>)``
    denotes the same instant in every session. Exact: the bounds are
    whole seconds, and their µs magnitudes (~9.2e15) are plain Python
    ints here — no float step."""
    return (_ts_window_ns(TS_WINDOW_LO) // 1000,
            _ts_window_ns(TS_WINDOW_HI) // 1000)


def _ts_window_ns(bound: str) -> int:
    """Window bound as ns-epoch, in pure integer arithmetic (the value
    is ~±9.2e18 — past double's 2^53 exact range, so no float step may
    touch it)."""
    import datetime as _dt
    dt = _dt.datetime.strptime(bound, "%Y-%m-%d %H:%M:%S")
    days = (dt.date() - _dt.date(1970, 1, 1)).days
    secs = days * 86400 + dt.hour * 3600 + dt.minute * 60 + dt.second
    return secs * 10**9


def ts_quarantine_sql(table: str) -> str:
    """The oracle twin of the load_table filter: a shadow-CTE body that
    replaces the raw view for every ts-reading oracle (DuckDB resolves
    the ``main.``-qualified name to the registered view while the bare
    name binds to this CTE). Text-identity with the Spark filter's
    window is pinned by tests."""
    preds = " AND ".join(
        f"({c} IS NULL OR {c} BETWEEN TIMESTAMP '{TS_WINDOW_LO}' "
        f"AND TIMESTAMP '{TS_WINDOW_HI}')"
        for c in TS_QUARANTINE_COLS[table])
    return f"{table} AS (SELECT * FROM main.{table} WHERE {preds})"


def load_table(spark: SparkSession, sf_dir: str, name: str,
               quarantine: bool = True) -> DataFrame:
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
    if quarantine:
        # Quarantine on the RAW columns, BEFORE the events ts
        # normalization: the predicate then reaches the parquet scan as
        # a pushed filter (Or(IsNull, And(GtEq, LtEq)) — row-group
        # stats prune it to metadata on clean data) instead of running
        # post-conversion on a derived column. The window bounds are
        # converted to each raw representation exactly (NTZ wall-clock
        # IS the UTC instant for this data; ns epoch via pure-integer
        # date arithmetic — ~±9.2e18 exceeds double's exact range).
        dtypes = dict(df.dtypes)
        for col in TS_QUARANTINE_COLS.get(name, ()):
            dt = dtypes.get(col)
            if dt is None:
                # partial-schema fixture (column-projected copies are
                # legitimate test/test-bench inputs); the full corpus
                # is pinned two-way by tests/test_plans.py::
                # test_ts_quarantine_cols_cover_schema
                continue
            if dt == "bigint":  # TIMESTAMP(NANOS) read as ns epoch long
                lo_hi = (F.lit(_ts_window_ns(TS_WINDOW_LO)),
                         F.lit(_ts_window_ns(TS_WINDOW_HI)))
            else:
                kw = "TIMESTAMP_NTZ" if dt == "timestamp_ntz" else "TIMESTAMP"
                lo_hi = (F.expr(f"{kw} '{TS_WINDOW_LO}'"),
                         F.expr(f"{kw} '{TS_WINDOW_HI}'"))
            df = df.filter(F.col(col).isNull() | F.col(col).between(*lo_hi))
    if name == "events":
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
