"""Batch merge/upsert (CDC apply) over plain parquet — the lakehouse
MERGE INTO shape without a table format: combine a base snapshot with a
changes feed (inserts/updates/deletes), keeping the latest version per
key. One union + one per-key argmax; no joins.

At 100 TB: partition both sides by the merge key's hash at write time
(bucketing) and this runs without a shuffle; deletes are tombstone rows
(op='D') dropped after versioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(base: DataFrame, changes: DataFrame, key: str,
                 version_col: str, op_col: str = "op") -> DataFrame:
    """Apply a CDC feed to a base snapshot.

    ``changes`` carries ``op_col`` with 'U' (upsert) or 'D' (delete);
    ``base`` rows are implicitly version-0 upserts. The survivor per key
    is the row with the highest (version, is_change) — a change at the
    same version beats base. Deletes win like any other change, then
    their keys vanish from the output.
    """
    data_cols = [c for c in base.columns]
    b = base.select(*data_cols).withColumn(op_col, F.lit("U")) \
            .withColumn("_src", F.lit(0))
    c = changes.select(*data_cols, op_col).withColumn("_src", F.lit(1))
    unioned = b.unionByName(c)
    # fixed-width composite so max_by is a single aggregation
    rank = F.format_string("%020d%01d", F.col(version_col).cast("long"), F.col("_src"))
    survivors = (
        unioned.groupBy(key)
        .agg(*[F.max_by(col, rank).alias(col)
               for col in data_cols + [op_col] if col != key])
    )
    return survivors.filter(F.col(op_col) == "U").drop(op_col)
