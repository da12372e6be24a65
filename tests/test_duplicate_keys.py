"""Duplicate-key contract (r18 --dup census): a reingested/replayed
batch duplicating primary keys is routine dirt at 100 TB.

Two-part contract:
- the dedup/cluster family (connected components, cluster stats, best
  survivor, curation pipeline, winnowing) is DEFINED over key-unique
  corpora — duplicated doc_ids make the entity itself ambiguous, and
  the census shows the engines legitimately diverge there (documented
  boundary in tools/extremes_census.py's _DUP_BOUNDARY);
- every fact table's key-uniqueness is therefore a QUARANTINE
  constraint: dq_constraint_report carries a ``*_pk_unique`` row per
  table so the precondition violation is counted upstream, in a report
  the duplication cannot break.

This test pins the quarantine side: on a fixture duplicating row 0 of
every table, each ``*_pk_unique`` row must read exactly 1, and the dq
report must stay value-equal to its oracle. The rest of the registry's
behavior on duplicated keys is swept by the census (163 OK + 5
boundary rows, logs/dup_census_r18_final.txt).
"""
import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

from mapreduce_4sl08_spark.plans import QUERIES
from tests.conftest import SF_SMOKE as SRC
from tests.oracle import compare_frames
from tools.null_fixtures import TABLES


def _build_dup(out: str) -> str:
    for t in TABLES:
        tab = pq.read_table(os.path.join(SRC, f"{t}.parquet")).slice(0, 4)
        pq.write_table(pa.concat_tables([tab, tab.slice(0, 1)]),
                       os.path.join(out, f"{t}.parquet"))
    return out


def test_dq_counts_duplicate_keys(spark, tmp_path):
    sf = _build_dup(str(tmp_path))
    rows = {r["constraint_name"]: r["n_violations"]
            for r in QUERIES["dq_constraint_report"].fn(spark, sf).collect()}
    for c in ("orders_pk_unique", "events_pk_unique",
              "embeddings_pk_unique", "documents_pk_unique"):
        assert rows[c] == 1, f"{c}: expected 1 duplicate, got {rows[c]}"

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    spec = QUERIES["dq_constraint_report"]
    compare_frames(spec.fn(spark, sf).toPandas(),
                   con.execute(spec.oracle).fetchdf(), "dq_dup_keys")
