"""t2-style correctness: every registry query with an oracle hash-matches
DuckDB at sf0.01 (the driver's own gate, run locally)."""

import pytest

from mapreduce_4sl08_spark.plans import QUERIES

from .oracle import duckdb_connection, run_compare

ORACLE_SPECS = [s for s in QUERIES.values() if s.oracle]
# Every registry query must carry an oracle — rows-only entries were
# eliminated in round 3 (HLL → within_tol contract, PageRank → unrolled
# CTE); this assert keeps it that way.
NO_ORACLE_SPECS = [s for s in QUERIES.values() if not s.oracle]
assert not NO_ORACLE_SPECS, [s.name for s in NO_ORACLE_SPECS]


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_connection(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("spec", ORACLE_SPECS, ids=lambda s: s.name)
def test_oracle_match(spark, con, sf_dir, spec):
    n = run_compare(spark, con, spec, sf_dir)
    assert n >= 0


