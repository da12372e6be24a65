"""Malformed-JSON props contract (r17): a dirty semi-structured record
must degrade to NULL extraction, never kill the job or split the
engines — at 100 TB, a few malformed props rows are a certainty.

Spark side: get_json_object / from_json (PERMISSIVE) already return
NULL on malformed input; events_variant_extract uses try_parse_json
(plain parse_json is FAILFAST — one bad record would abort the whole
job). Oracle side: DuckDB's json functions THROW on malformed input,
so every props-consuming oracle routes through json_valid().

Documented boundary: the engines' validity DIALECTS differ on edge
inputs — DuckDB (yyjson) accepts a trailing comma ('{"k": 1, }') that
Spark (Jackson) rejects — so this gate pins the CLEARLY-malformed
class (truncated object, non-JSON text, empty string) where both
dialects agree the input is invalid. Full dialect alignment would need
a shared parser UDF on both sides; out of scope until a real corpus
shows the edge class matters.
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

#: clearly-malformed in BOTH JSON dialects
MALFORMED = ['{"k":', "not json", ""]


@pytest.fixture(scope="module")
def sfbadjson_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("sfbadjson")
    for t in TABLES:
        tab = pq.read_table(os.path.join(SRC, f"{t}.parquet"))
        if t == "events":
            d = tab.to_pydict()
            for i, s in enumerate(MALFORMED):
                d["props"][i] = s
            tab = pa.table(d, schema=tab.schema)
        pq.write_table(tab, os.path.join(str(out), f"{t}.parquet"))
    return str(out)


@pytest.fixture(scope="module")
def duck_sfbadjson(sfbadjson_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{sfbadjson_dir}/{t}.parquet'")
    return con


#: every query that reads the props column (the rest of the registry
#: is unaffected by this fixture and already swept elsewhere)
PROPS_CONSUMERS = [
    "events_json_extract",
    "events_variant_extract",
    "map_functions_showcase",
    # reads props as a RAW string (null counts / distinct / min-max) —
    # no JSON parsing, but kept in the gate so raw-string treatment of
    # malformed payloads stays value-equal too
    "column_profile_events",
]


def test_props_consumer_list_is_complete():
    """If a new oracle starts reading props, it must join this gate."""
    readers = sorted(n for n, s in QUERIES.items()
                     if s.oracle and "props" in s.oracle)
    assert readers == sorted(PROPS_CONSUMERS), (
        f"props-consuming queries changed: {readers} — add them to "
        f"PROPS_CONSUMERS so the malformed-JSON contract covers them")


@pytest.mark.parametrize("name", PROPS_CONSUMERS)
def test_query_matches_oracle_on_malformed_props(spark, sfbadjson_dir,
                                                 duck_sfbadjson, name):
    spec = QUERIES[name]
    spark_pdf = spec.fn(spark, sfbadjson_dir).toPandas()
    oracle_pdf = duck_sfbadjson.execute(spec.oracle).fetchdf()
    compare_frames(spark_pdf, oracle_pdf, name)
