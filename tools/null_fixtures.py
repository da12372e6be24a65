"""Shared builders for the two null-robustness fixtures (r16 census,
r17 contract closure). Both tests/test_null_columns.py and the ad-hoc
census tool build from here so the gate and the iteration loop can
never drift.

- same_row: two rows per table, every non-key column of row 1 nulled
  (the r16 original — all-null rows).
- staggered: four rows per table, nulls land on DIFFERENT rows per
  column family (row 1 strings, row 2 numerics, row 3 temporal/list)
  so "null X alongside live Y" is exercised. r17 adds the
  docs_with_embeddings unmasking direction (VERDICT r16 item 3): the
  documents/embeddings tables carry a NULL-text + live-embedding row
  AND the converse live-text + NULL-embedding row by construction
  (documents.text nulls on row 1, embeddings.embedding nulls on
  row 3, doc_id/vec_id keys live on all four rows).
"""

from __future__ import annotations

import math
import os

import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()

KEY_COLS = {"doc_id", "vec_id", "event_id", "user_id"}


def build_same_row(src: str, out: str) -> str:
    for t in TABLES:
        tab = pq.read_table(os.path.join(src, f"{t}.parquet")).slice(0, 2)
        d = tab.to_pydict()
        for col in tab.column_names:
            if col.endswith("key") or col in KEY_COLS:
                continue
            d[col][1] = None
        pq.write_table(pa.table(d, schema=tab.schema),
                       os.path.join(out, f"{t}.parquet"))
    return out


def build_nonfinite(src: str, out: str) -> str:
    """r18 non-finite fixture: four rows per table, every float column
    carries ALL THREE non-finite classes at once — NaN on row 1, +Inf
    on row 2, -Inf on row 3 (row 0 and all keys stay live). One fixture
    exercises what the two single-class censuses (tools/nan_census.py,
    which never injects -Inf) cannot: mixed-class groups, and -Inf —
    which sorts OPPOSITE to NaN/+Inf, so any query leaning on an
    engine's non-finite sort order diverges here even if both censuses
    pass. Vector class included (r18 vector census): one ELEMENT of
    embeddings.embedding per poisoned row carries the same per-row
    class — the vecs()/vec_finite_sql exclusion must drop exactly
    those vectors on both engines. Row 4 (r19, ADVICE r18): scalars
    stay LIVE but one embedding ELEMENT is NULL — the class where
    Spark's three-valued exists() dropped the vector while DuckDB's
    list_filter silently discarded the NULL element and KEPT it; the
    explicit ``x IS NULL`` arm of vec_finite_sql() must drop it on
    both sides and embeddings_components_finite must count it."""
    for t in TABLES:
        tab = pq.read_table(os.path.join(src, f"{t}.parquet")).slice(0, 5)
        d = tab.to_pydict()
        nrows = len(tab)
        for col, field in zip(tab.column_names, tab.schema):
            if col.endswith("key") or col in KEY_COLS:
                continue
            is_float_vec = (
                (pa.types.is_list(field.type)
                 or pa.types.is_large_list(field.type))
                and (pa.types.is_float32(field.type.value_type)
                     or pa.types.is_float64(field.type.value_type)))
            if (pa.types.is_float64(field.type)
                    or pa.types.is_float32(field.type) or is_float_vec):
                for row, val in ((1, math.nan), (2, math.inf),
                                 (3, -math.inf)):
                    if row >= nrows:
                        continue
                    if is_float_vec:
                        if d[col][row] is not None:
                            vec = list(d[col][row])
                            vec[0] = val
                            d[col][row] = vec
                    else:
                        d[col][row] = val
        if t == "embeddings" and nrows > 4 and d["embedding"][4] is not None:
            vec = list(d["embedding"][4])
            vec[1] = None  # NULL ELEMENT, scalars live (r19 class)
            d["embedding"][4] = vec
        pq.write_table(pa.table(d, schema=tab.schema),
                       os.path.join(out, f"{t}.parquet"))
    return out


def build_staggered(src: str, out: str) -> str:
    for t in TABLES:
        tab = pq.read_table(os.path.join(src, f"{t}.parquet")).slice(0, 4)
        d = tab.to_pydict()
        nrows = len(tab)
        str_seen = 0
        for col, field in zip(tab.column_names, tab.schema):
            if col.endswith("key") or col in KEY_COLS:
                continue
            ty = field.type
            if pa.types.is_string(ty) or pa.types.is_large_string(ty):
                # alternate WITHIN the string family too (r17
                # self-review): two string columns nulled on the same
                # row cannot exercise "null X with live Y" between
                # THEMSELVES — events.props NULL + live event_type was
                # masked exactly this way (map_concat null-intolerance)
                row = 1 if str_seen % 2 == 0 else 0
                str_seen += 1
            elif (pa.types.is_timestamp(ty) or pa.types.is_date(ty)
                  or pa.types.is_list(ty) or pa.types.is_large_list(ty)):
                row = 3
            else:
                row = 2
            if row < nrows:
                d[col][row] = None
        pq.write_table(pa.table(d, schema=tab.schema),
                       os.path.join(out, f"{t}.parquet"))
    return out
