"""DuckDB-oracle comparison harness, mirroring the driver's t2 check:
run the Spark plan and the oracle SQL on the same parquet tables, then
compare row count, schema shape, and values (columns sorted by name, rows
sorted by all columns) — the same canonicalization the driver hashes.
"""

from __future__ import annotations

import datetime
import math

import duckdb
import pandas as pd

TABLES = ("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings")


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'")
    return con


def _canon_cell(v):
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<nan>"
        if v == 0.0:
            v = 0.0  # normalize -0.0
        return f"{v:.6f}"
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        # No tz-normalization: a tz-aware oracle value vs a naive Spark
        # value must FAIL here, exactly as the driver's hash check fails.
        # (Oracle SQL must produce naive timestamps — see
        # spark-duckdb discipline notes; DuckDB to_timestamp() is tz-aware.)
        return pd.Timestamp(v).isoformat()
    if isinstance(v, datetime.date):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canonicalize(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(_canon_cell(v) for v in row)
            for row in df[cols].itertuples(index=False, name=None)]
    return sorted(rows)


def _dtype_key(dtype) -> str:
    """Canonical dtype family+width: catches int32-vs-int64 drift between
    the Spark plan and the oracle SQL (values alone wouldn't)."""
    kind = dtype.kind if hasattr(dtype, "kind") else "O"
    if kind in "iu":
        return f"int{dtype.itemsize * 8}"
    if kind == "f":
        return "float"
    if kind == "M":
        # Distinguish tz-aware from naive: the driver's schema check does
        # (Spark window().start is naive; DuckDB TIMESTAMPTZ is not).
        tz = getattr(dtype, "tz", None)
        return f"timestamp[tz={tz}]" if tz is not None else "timestamp"
    if kind == "b":
        return "bool"
    return "object"


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str):
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: column mismatch {sorted(spark_pdf.columns)} vs {sorted(oracle_pdf.columns)}")
    s_types = {c: _dtype_key(spark_pdf[c].dtype) for c in spark_pdf.columns}
    o_types = {c: _dtype_key(oracle_pdf[c].dtype) for c in oracle_pdf.columns}
    mismatched = {c: (s_types[c], o_types[c]) for c in s_types if s_types[c] != o_types[c]}
    assert not mismatched, f"{name}: dtype mismatch {mismatched}"
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count {len(spark_pdf)} vs {len(oracle_pdf)}")
    s_rows, o_rows = canonicalize(spark_pdf), canonicalize(oracle_pdf)
    mismatches = [(i, a, b) for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b]
    assert not mismatches, (
        f"{name}: {len(mismatches)} value mismatches; first 3: {mismatches[:3]}")


def run_compare(spark, con, spec, sf_dir: str):
    spark_pdf = spec.fn(spark, sf_dir).toPandas()
    oracle_pdf = con.execute(spec.oracle).fetchdf()
    compare_frames(spark_pdf, oracle_pdf, spec.name)
    return len(spark_pdf)
