"""Timestamp-representability contract (r18 ts-extremes census).

The engine's Arrow/pandas crossings (grouped-map ops, the driver's own
comparison harness) can only represent timestamps inside the
datetime64[ns] window [1677-09-21, 2262-04-11] — a year-9999 value
crashes them with OutOfBoundsDatetime (21 queries in the wide census,
logs/ts_extremes_census_r18_wide.txt). The contract:

- INSIDE the window, value equality holds registry-wide at the far
  edges (tools/extremes_census.py --ts: 168/168 OK at 1678/2262 after
  the to_seconds() oracle fix — DuckDB's ``BIGINT * INTERVAL 1
  SECOND`` casts the multiplier to INT32 and overflowed at year 2038).
- OUTSIDE the window, rows are quarantine material:
  dq_constraint_report's ``*_ts_representable`` rows count them in the
  all-JVM path that can still see them, BEFORE any pandas-crossing
  operator would abort. This test pins that the counter actually fires
  on a year-9999 row (and that the dq report itself — whose output
  carries no timestamps — survives data its downstream consumers
  cannot).
"""
import datetime
import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

from mapreduce_4sl08_spark.plans import QUERIES
from tests.conftest import SF_SMOKE as SRC
from tests.oracle import compare_frames
from tools.null_fixtures import TABLES


def _build_out_of_window(out: str) -> str:
    for t in TABLES:
        tab = pq.read_table(os.path.join(SRC, f"{t}.parquet")).slice(0, 4)
        d = tab.to_pydict()
        for col, field in zip(tab.column_names, tab.schema):
            if pa.types.is_timestamp(field.type):
                d[col][2] = datetime.datetime(9999, 12, 31, 23, 59, 59)
                d[col][3] = datetime.datetime(1, 1, 2, 0, 0, 0)
        pq.write_table(pa.table(d, schema=tab.schema),
                       os.path.join(out, f"{t}.parquet"))
    return out


def test_dq_counts_out_of_window_timestamps(spark, tmp_path):
    sf = _build_out_of_window(str(tmp_path))
    rows = {r["constraint_name"]: r["n_violations"]
            for r in QUERIES["dq_constraint_report"].fn(spark, sf).collect()}
    for c in ("orders_orderdate_ts_representable",
              "lineitem_shipdate_ts_representable",
              "events_ts_representable"):
        assert rows[c] == 2, f"{c}: expected 2 out-of-window, got {rows[c]}"

    # and the dq report stays oracle-equal on data its downstream
    # pandas-crossing consumers cannot even convert
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    spec = QUERIES["dq_constraint_report"]
    compare_frames(spec.fn(spark, sf).toPandas(),
                   con.execute(spec.oracle).fetchdf(), "dq_ts_window")
