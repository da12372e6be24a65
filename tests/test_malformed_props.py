"""Malformed-JSON props contract (r17): a dirty semi-structured record
must degrade to NULL extraction, never kill the job or split the
engines — at 100 TB, a few malformed props rows are a certainty.

Spark side: get_json_object / from_json (PERMISSIVE) already return
NULL on malformed input; events_variant_extract uses try_parse_json
(plain parse_json is FAILFAST — one bad record would abort the whole
job). Oracle side: DuckDB's json functions THROW on malformed input,
so every props-consuming oracle routes through json_valid().

r18 (ADVICE r17 item 2) extends the pinned class with VALID-but-
non-object props ('123', '[1]'): Spark's from_json-to-MapType yields a
NULL map while json_valid() is true, so the map oracle adds an ordered
json_type(props) = 'OBJECT' CASE arm; the variant/json-path consumers
already align (a non-object has no $.k on either engine).

r19 (VERDICT r18 item 4) PINS the type-mismatched-value class that r18
documented out of scope: VALID objects whose $.k value cannot be an
int — non-numeric strings ('{"k": "abc"}'), string-typed integers,
non-scalar values, int32 overflow, whitespace-padded string-ints.
Contract: mismatched value → NULL extraction on both engines — Spark
via try_cast / try_variant_get / PERMISSIVE from_json map-nulling
(plain cast/variant_get would ABORT the job on one bad record), DuckDB
via the strict-integer regex mirror (plans/events._K_STRICT — a bare
TRY_CAST would ROUND '1.5' where Spark NULLs it) and the fully-general
map-level arm (plans/extended._MAP_BAD_VALUE).

r20 (ADVICE r19 item 2) PINS the numeric/boolean COERCION class that
r19 documented as a boundary: '{"k": 20.0}', '{"k": 1.5}',
'{"k": true}'. The string paths already NULLed these
(get_json_object serializes 20.0 to '20.0'; try_cast and the oracle
regex both reject it) and the map query's map-level arm fires for
every non-integer type — but the VARIANT path coerced (try_variant_get
truncated 1.5 -> 1, kept 20.0 as 20: a silent CARDINALITY split under
events_variant_extract's % 10 filter, the one boundary that changed
row counts). Closed by gating extraction on the k sub-variant's
schema (BIGINT/STRING only — plans/events.events_variant_extract).

Documented boundary — one class stays OUT of scope until a real
corpus shows it matters (full alignment needs a shared parser on both
sides): validity DIALECTS on edge inputs — DuckDB (yyjson) accepts a
trailing comma ('{"k": 1, }') that Spark (Jackson) rejects.
"""
import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mapreduce_4sl08_spark.plans import QUERIES
from tests.conftest import SF_SMOKE as SRC
from tests.oracle import compare_frames
from tools.extremes_census import TYPE_MISMATCH_PROPS

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()

#: rows 0-2: clearly-malformed in BOTH JSON dialects;
#: rows 3-4: VALID JSON that is not an object (r18 — json_valid passes,
#: from_json-to-MapType still yields a NULL map);
#: rows 5-13 (r19 + r20 coercion classes): valid objects with
#: TYPE-MISMATCHED $.k values, sourced from the census pin list;
#: last row (r19): 1500-deep nesting — a VALIDITY-DIALECT probe (Jackson
#: rejects depth > 1000 so Spark's parses yield NULL, DuckDB's yyjson
#: accepts unbounded depth) that stays ALIGNED because a nested-object
#: $.k extracts to NULL through every consumer's contract on both sides
MALFORMED = ['{"k":', "not json", "", "123", "[1]", *TYPE_MISMATCH_PROPS,
             '{"k":' * 1500 + '1' + '}' * 1500]


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
    """If a new oracle starts reading props, it must join this gate.

    Detection is SEMANTIC, not substring (ADVICE r17 item 3: 'props'
    substring missed SELECT-* and quoted-identifier consumers): run
    every oracle twice on fixtures identical except the props values
    differ — any output difference means the oracle read props. The
    substring detector is kept as a union (a consumer whose output
    coincidentally matches on both prop sets would escape the semantic
    probe)."""
    con_a, con_b = duckdb.connect(), duckdb.connect()
    base = pq.read_table(os.path.join(SRC, "events.parquet"))
    d = base.to_pydict()
    d["props"] = ['{"__probe__": %d}' % i for i in range(len(base))]
    import tempfile
    with tempfile.TemporaryDirectory() as tmp:
        pq.write_table(pa.table(d, schema=base.schema),
                       os.path.join(tmp, "events_probe.parquet"))
        for t in TABLES:
            path = os.path.join(SRC, f"{t}.parquet")
            con_a.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
            con_b.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"'{tmp}/events_probe.parquet'" if t == "events"
                else f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
        semantic = []
        for name, spec in sorted(QUERIES.items()):
            if spec.oracle is None:
                continue
            a = con_a.execute(spec.oracle).fetchall()
            b = con_b.execute(spec.oracle).fetchall()
            if a != b:
                semantic.append(name)
    substring = [n for n, s in QUERIES.items() if s.oracle and "props" in s.oracle]
    readers = sorted(set(semantic) | set(substring))
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
