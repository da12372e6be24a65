"""Generic format readers/sinks (reference operators S1/S2 + K1/K2
generalized — SURVEY §2.1).

The reference supports exactly one source (whole-text-file on the driver)
and one sink (a decorated text file written by the master,
/root/reference/src/MasterNode.java:200-209). Here every format is a
distributed scan/write; ``write_any`` supports partitioned parquet sinks —
the 100 TB-sane replacement for the reference's single ``final_result.txt``
(K2 "KEEP_LOCAL" mode ≙ a distributed write, K2 "EXPLICIT" ≙ collect()).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_FORMATS = ("parquet", "csv", "json", "text", "orc")


def read_any(spark: SparkSession, fmt: str, path: str, *,
             schema=None, options: dict | None = None) -> DataFrame:
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {_FORMATS}")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if options:
        reader = reader.options(**options)
    if fmt == "csv" and (not options or "header" not in options):
        reader = reader.option("header", "true").option("inferSchema", schema is None)
    return reader.format(fmt).load(path)


def write_any(df: DataFrame, fmt: str, path: str, *,
              mode: str = "overwrite",
              partition_by: list[str] | None = None,
              single_file: bool = False,
              options: dict | None = None) -> None:
    """Distributed write. ``single_file=True`` mirrors the reference's
    one-output-file semantics (master-side gather, K1) via coalesce(1) —
    only for small results; at scale use partition_by instead."""
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {_FORMATS}")
    if single_file:
        df = df.coalesce(1)
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if options:
        writer = writer.options(**options)
    if fmt == "csv" and (not options or "header" not in options):
        writer = writer.option("header", "true")
    writer.format(fmt).save(path)
