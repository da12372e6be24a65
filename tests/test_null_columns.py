"""Every registry query must survive NULL values in non-key columns —
and, outside a documented divergence list, agree with its oracle on
them (r16, self-directed after the VERDICT r15 item 6 sweeps; at
100 TB, rows with a missing embedding / text / timestamp are routine,
not exotic).

The fixture is two rows per table with every non-key column of row 1
nulled. The r16 census on it:

- 12 CRASHES, all one class — NULL embedding values crashed the numpy
  signature/dot UDFs (np.stack over None) in Spark and
  list_inner_product in DuckDB; NULL text crashed the multimodal
  decode UDFs on a NULL payload. CLOSED this round by a uniform
  contract: vector operators exclude null vectors (plans/base.vecs +
  WHERE embedding IS NOT NULL in every vector oracle), decode
  operators exclude null payloads. This test pins the class shut with
  full value equality.

- 14 residual VALUE divergences in two classes, recorded below and
  asserted EXECUTION-ONLY here (the r17 agenda, one contract decision
  per query): the null-TIMESTAMP class (Spark's window()/
  session_window drop null-ts rows where DuckDB's time_bucket(NULL)
  keeps a NULL group) and the null-TEXT class (split/size/concat_ws
  NULL propagation differs). Shrink this list by aligning engines,
  never by relaxing the compare.
"""
import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mapreduce_4sl08_spark.plans import QUERIES
from tests.conftest import SF_SMOKE as SRC
from tests.oracle import compare_frames

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()

KEY_COLS = {"doc_id", "vec_id", "event_id", "user_id"}

#: r16 census residual — null-ts and null-text contract divergences,
#: execution-only until each gets an aligned cross-engine contract
KNOWN_DIVERGENT = {
    # null-TIMESTAMP class (Spark windowing drops null ts; DuckDB
    # time_bucket/date_trunc keep a NULL group)
    "daily_new_vs_returning",
    "events_session_window_native", "events_sliding_windows",
    "events_tumbling_hourly", "events_user_features",
    "events_windowed_topk", "latest_event_per_user",
    "rolling_active_users",
    # null-TEXT class (split/size/concat_ws/percentile NULL
    # propagation differs)
    "map_functions_showcase", "session_path_topk",
    "text_token_positions",
}
# r16 follow-up: class C (agg_approx_distinct, approx_percentile_check,
# sequence_packing_bins — a bare equi-join on a nullable group key
# silently DROPPED the NULL group both sides kept) was fixed with
# eqNullSafe rejoins the same round the census found it; those three
# now go through the full value compare below.


@pytest.fixture(scope="module")
def sfnull_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("sfnull")
    for t in TABLES:
        tab = pq.read_table(os.path.join(SRC, f"{t}.parquet")).slice(0, 2)
        d = tab.to_pydict()
        for col in tab.column_names:
            if col.endswith("key") or col in KEY_COLS:
                continue
            d[col][1] = None
        pq.write_table(pa.table(d, schema=tab.schema),
                       os.path.join(str(out), f"{t}.parquet"))
    return str(out)


@pytest.fixture(scope="module")
def duck_sfnull(sfnull_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{sfnull_dir}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_handles_null_columns(spark, sfnull_dir, duck_sfnull, name):
    spec = QUERIES[name]
    spark_pdf = spec.fn(spark, sfnull_dir).toPandas()
    if spec.oracle is None:
        assert spark_pdf is not None
        return
    oracle_pdf = duck_sfnull.execute(spec.oracle).fetchdf()
    if name in KNOWN_DIVERGENT:
        return  # executed in both engines; value contract is r17 work
    compare_frames(spark_pdf, oracle_pdf, name)


# ---------------------------------------------------------------------------
# Staggered variant (r16): nulls land on DIFFERENT rows per column
# family — row 1 strings, row 2 numerics, row 3 temporal/list — so
# "null X alongside live Y" is exercised (the same-row fixture above
# structurally cannot: it first crashed events_user_features via
# NaT -> INT64_MIN span overflow only HERE). Execution-only for now;
# the value contract across engines is the r17 class work
# (logs/null_census_staggered_r16.txt has the per-query census).

@pytest.fixture(scope="module")
def sfnull_staggered_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("sfnull_stag")
    for t in TABLES:
        tab = pq.read_table(os.path.join(SRC, f"{t}.parquet")).slice(0, 4)
        d = tab.to_pydict()
        nrows = len(tab)
        for col, field in zip(tab.column_names, tab.schema):
            if col.endswith("key") or col in KEY_COLS:
                continue
            ty = field.type
            if pa.types.is_string(ty) or pa.types.is_large_string(ty):
                row = 1
            elif (pa.types.is_timestamp(ty) or pa.types.is_date(ty)
                  or pa.types.is_list(ty) or pa.types.is_large_list(ty)):
                row = 3
            else:
                row = 2
            if row < nrows:
                d[col][row] = None
        pq.write_table(pa.table(d, schema=tab.schema),
                       os.path.join(str(out), f"{t}.parquet"))
    return str(out)


@pytest.fixture(scope="module")
def duck_sfnull_staggered(sfnull_staggered_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{sfnull_staggered_dir}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_survives_staggered_nulls(spark, sfnull_staggered_dir,
                                        duck_sfnull_staggered, name):
    spec = QUERIES[name]
    rows = spec.fn(spark, sfnull_staggered_dir).collect()
    assert isinstance(rows, list)  # executed without an engine error
    if spec.oracle is not None:
        duck_sfnull_staggered.execute(spec.oracle).fetchall()
