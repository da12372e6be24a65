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


# --------------------------------------------- scan fan-out (r21, perf)
#
# The graded fixtures ship each table as ONE parquet file with ONE row
# group, and a row group is parquet's unit of split parallelism — so
# every scan runs as a single task and everything below the first
# Exchange is single-threaded regardless of core count (measured r21:
# the _shingle_sets builds were ~4.8 s single-task stages at sf0.1 on
# local[32]). Optimization-guide remedy (§2.5 input skew): "one huge
# unsplittable file … repartition immediately after the read". Design:
#
# - CONDITIONAL and scale-adaptive: fires only when the scan would
#   yield fewer splits than the session's shuffle parallelism
#   (estimated from file bytes vs maxPartitionBytes, the same
#   arithmetic FilePartition uses, minus openCost) and the table is
#   big enough for parallelism to matter. On a real cluster (the
#   100 TB path) scans produce thousands of row-group splits and this
#   is a structural no-op — nothing here is tuned to local[32].
# - KEYED (hash), never round-robin: a keyless repartition(n) pays a
#   local single-task sort of its input for retry determinism
#   (spark.sql.execution.sortBeforeRepartition, SPARK-23207); hashing
#   a stable high-cardinality key is deterministic for free. The key
#   is the column downstream operators cluster by most, so the fan-out
#   exchange is REUSED (ClusteredDistribution is satisfied by any
#   HashPartitioning over a subset of the grouping keys): per-doc
#   aggregations (minhash signatures, simhash bit sums, wordcount-
#   adjacent text ops) and per-user windows (sessionize, applyInPandas
#   features) then run WITHOUT their own shuffle.
# - OPT-IN PER CALL SITE (`load_table(..., fanout=True)`), because the
#   caller knows the downstream work shape and the scan does not: the
#   r21 A/B bench (logs/bench_r21_baseline.json vs bench_r21_fanout.json)
#   showed a table-global fan-out wins 0.55-0.83x exactly where per-row
#   JVM compute is heavy (tokenize/shingle/md5 pipelines, multi-measure
#   aggs, per-pair vector math) and loses a fixed exchange cost — or a
#   32x Python-worker spin-up, for mapInPandas/applyInPandas consumers —
#   on cheap queries (sort_customers 2.0x, multimodal_decode 3.0x).
#   Dimensions (nation/region/supplier/part) never fan out: they feed
#   BroadcastExchange, where a repartition parallelizes nothing. And
#   NEVER in front of a low-cardinality full aggregation: map-side
#   partial agg already collapses the shuffle to a handful of groups,
#   so a pre-agg exchange ships raw rows the combiner would have
#   eliminated (q1 measured 0.78 s without vs 0.94 s with, interleaved).
#   Fan-out pays where the downstream operator KEEPS cardinality —
#   tokenize/explode pipelines, windows, join probes.
#
# Catalyst pushes caller filters and projections below the repartition,
# so PushedFilters/ReadSchema at the parquet scan are unchanged and the
# exchange carries post-filter, post-projection bytes only (verified in
# plans/r21/*_after.txt). Value identity: a hash exchange only MOVES
# rows, and every registry query orders its output by a unique key —
# but row order does feed the combine order of floating-point
# aggregates downstream, so for double SUM/AVG consumers the identity
# is covered empirically by the oracle comparison (full 168/168 sweep
# at sf0.01 with fan-out active on every fact table,
# logs/sweep_r21_fanout_sf001.log) and its tolerance, not guaranteed
# bit-for-bit by construction (ADVICE r21 item 3).
_FANOUT_KEYS: dict[str, str] = {
    "customer": "c_custkey",
    "documents": "doc_id",
    "embeddings": "vec_id",
    "events": "user_id",     # 1500 distinct, 0 nulls at sf0.1
    "lineitem": "l_orderkey",
    "orders": "o_custkey",
}

#: below this, a single-task scan is cheaper than any exchange
_FANOUT_MIN_BYTES = 32 * 1024


def _parse_bytes(v: str) -> int:
    """Parse a Spark byte conf ('134217728', '128m', '1g')."""
    s = v.strip().lower().removesuffix("b")
    mult = {"k": 1024, "m": 1024**2, "g": 1024**3, "t": 1024**4}
    if s and s[-1] in mult:
        return int(float(s[:-1]) * mult[s[-1]])
    return int(s)


def _scan_fanout_n(spark: SparkSession, path: str) -> int:
    """Target partition count for the post-scan fan-out, or 0 to leave
    the scan's own split parallelism alone. ``SPARK_GRAFT_SCAN_FANOUT``
    overrides: ``off``/``0`` disables, an integer pins the count,
    ``auto`` (default) derives it from input size vs session conf."""
    mode = os.environ.get("SPARK_GRAFT_SCAN_FANOUT", "auto").strip().lower()
    if mode in ("off", "0"):
        return 0
    try:
        if os.path.isdir(path):
            sizes = [e.stat().st_size for e in os.scandir(path)
                     if e.is_file() and not e.name.startswith(("_", "."))]
        else:
            sizes = [os.path.getsize(path)]
    except OSError:
        return 0  # non-local path (cluster storage): splits are fine there
    if sum(sizes) < _FANOUT_MIN_BYTES:
        return 0
    if mode != "auto":
        # a typo'd value ('false', '-4') must not take the plan build
        # down or flow a negative count into repartition() (ADVICE r21
        # item 1): unparseable or non-positive pins fall back to auto
        try:
            pinned = int(mode)
        except ValueError:
            pinned = -1
        if pinned > 0:
            return pinned
    try:
        max_pb = _parse_bytes(spark.conf.get("spark.sql.files.maxPartitionBytes"))
        n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except Exception:
        return 0  # unparseable/cluster-managed conf: leave the scan alone
    est_splits = sum(-(-s // max_pb) for s in sizes)
    return n if est_splits < n else 0


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
               quarantine: bool = True, fanout: bool = False) -> DataFrame:
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
            elif dt == "timestamp_ntz":
                lo_hi = (F.expr(f"TIMESTAMP_NTZ '{TS_WINDOW_LO}'"),
                         F.expr(f"TIMESTAMP_NTZ '{TS_WINDOW_HI}'"))
            else:
                # instant-typed: session-tz-invariant epoch-µs bounds
                # (ADVICE r20 item 3 — a TIMESTAMP '<literal>' resolves
                # in spark.sql.session.timeZone, so a raw non-UTC
                # session would shift the quarantine boundary; these
                # fold to the same constant under the pinned UTC zone)
                lo_us, hi_us = ts_window_us()
                lo_hi = (F.timestamp_micros(F.lit(lo_us)),
                         F.timestamp_micros(F.lit(hi_us)))
            df = df.filter(F.col(col).isNull() | F.col(col).between(*lo_hi))
    # fan-out BEFORE the events ts normalization below, so the per-row
    # conversion runs on the post-exchange parallelism, not in the
    # single scan task (key columns are raw scan columns either way)
    fan_key = _FANOUT_KEYS.get(name) if fanout else None
    if fan_key is not None and fan_key in df.columns:
        n_fan = _scan_fanout_n(spark, os.path.join(sf_dir, f"{name}.parquet"))
        if n_fan:
            df = df.repartition(n_fan, F.col(fan_key))
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
