#!/usr/bin/env python
"""Build an N× KEY-SHIFTED copy of a testdata scale dir for scaling
probes (VERDICT r5 item 2 — run the full headline bench at 10×).

    python tools/make_scale_fixture.py [src_sf_dir] [out_dir] [copies]

Defaults: /root/testdata/sf0.1 → <repo>/.benchdata/sf0.1x10, 10 copies.

Replicating rows verbatim multiplies join/graph DENSITY, not data size
(the r5 probe lesson: an un-shifted co-purchase probe legitimately
explodes — ROUND_NOTES). Real growth adds NEW keys, so every copy
shifts its keys by copy_index × (max_key + 1):

- customer/supplier/part/orders/lineitem: all primary AND foreign keys
  shifted consistently — each copy is a disjoint, referentially-intact
  sub-warehouse (per-key join fan-in stays constant).
- events: event/user ids shifted; ts striped +32 days per copy so the
  (type, hour) group count scales with the data instead of densifying.
- documents: doc_id shifted; for copies > 0 every text token gets a
  copy-specific suffix (regex \\w+ run → run + 'q<i>'). The map is a
  bijection on tokens WITHIN a copy, so each copy's shingle-set /
  near-dup structure is identical to the original corpus, while
  cross-copy Jaccard collapses to ~0 — near-dup cluster sizes stay
  constant as the corpus grows (the honest 100 TB shape: more docs,
  not more copies of each doc). n_chars re-derived from the new text.
- embeddings: vec_id shifted; for copies > 0 each vector's dimensions
  are cyclically rotated by copy_index*7 mod dim (r13). The rotation is
  a bijection WITHIN a copy, so every copy's intra-copy angular
  structure (planted near-dup pairs, label geometry) is identical to
  the original — while cross-copy cosine collapses to ~background, the
  same honest-growth design as the documents token remap. Before r13
  vectors were copied verbatim: every vector had copies-1 exact
  cross-copy duplicates, which inflated embedding near-dup output
  ~766x at 10x and made embedding scale checks measure fixture
  artifacts (logs/lsh_occupancy_r13.txt).
- region/nation: shared dimensions, copied once verbatim.

Pure pyarrow (no JVM): preserves each column's physical parquet type —
notably events.ts TIMESTAMP(NANOS), which the engine's load_table
special-cases (sources/tables.py).
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

VERBATIM = ("region", "nation")

# table -> {column: key-space} ; equal key-space strings share one shift
KEYED = {
    "customer": {"c_custkey": "cust"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "lineitem": {"l_orderkey": "order", "l_partkey": "part",
                 "l_suppkey": "supp"},
    "events": {"event_id": "event", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}

EVENT_STRIPE_DAYS = 32


def _shift_units(src: str) -> dict[str, int]:
    """One shift unit per key space = max over every column using it + 1
    (so shifted copies are disjoint AND referentially consistent)."""
    units: dict[str, int] = {}
    for table, cols in KEYED.items():
        t = pq.read_table(os.path.join(src, f"{table}.parquet"),
                          columns=list(cols))
        for col, space in cols.items():
            hi = pc.max(t[col]).as_py() or 0
            units[space] = max(units.get(space, 0), hi + 1)
    return units


def _transform(table: str, t: pa.Table, i: int,
               units: dict[str, int]) -> pa.Table:
    for col, space in KEYED[table].items():
        idx = t.schema.get_field_index(col)
        shifted = pc.add(t[col], pa.scalar(i * units[space],
                                           type=t.schema.field(col).type))
        t = t.set_column(idx, t.schema.field(col), shifted)
    if table == "events" and i > 0:
        idx = t.schema.get_field_index("ts")
        ts_type = t.schema.field("ts").type
        # stripe magnitude must be expressed in the column's OWN unit —
        # events.ts has shipped as both MICROS and NANOS parquet
        per_day = {"s": 86_400, "ms": 86_400_000,
                   "us": 86_400_000_000, "ns": 86_400_000_000_000}
        stripe = pa.scalar(i * EVENT_STRIPE_DAYS * per_day[ts_type.unit],
                           type=pa.duration(ts_type.unit))
        t = t.set_column(idx, t.schema.field("ts"), pc.add(t["ts"], stripe))
    if table == "embeddings" and i > 0:
        import numpy as np
        idx = t.schema.get_field_index("embedding")
        col = t["embedding"].combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False)
        n = len(col)
        if n and len(flat) % n == 0:
            dim = len(flat) // n
            # injective per-copy transform at ANY copy count (ADVICE
            # r13: a bare roll cycles with period dim, so copies ≥ dim
            # reintroduced exact cross-copy duplicates): roll by
            # i mod dim, then flip signs by the bits of q = i // dim.
            # (k1, q1) == (k2, q2) ⇒ i1 == i2, so no two copies share a
            # transform; sign flips preserve norms, so distance-scale
            # stats stay comparable across copies. Residual caveat: a
            # row equal to another row's transform would still collide,
            # but the source embeddings are dense random floats.
            k = i % dim
            q = i // dim
            rolled = np.roll(flat.reshape(n, dim), k, axis=1)
            if q:
                signs = np.where(
                    (q >> (np.arange(dim) % 32)) & 1, -1.0, 1.0
                ).astype(rolled.dtype)
                rolled = rolled * signs
            rolled = rolled.reshape(-1)
            offsets = pa.array(np.arange(0, (n + 1) * dim, dim,
                                         dtype=np.int32))
            values = pa.array(rolled, type=col.type.value_type)
            rotated = pa.ListArray.from_arrays(offsets, values)
            t = t.set_column(idx, t.schema.field("embedding"),
                             rotated.cast(t.schema.field("embedding").type))
    if table == "documents" and i > 0:
        idx = t.schema.get_field_index("text")
        text = pc.replace_substring_regex(
            t["text"], pattern=r"(\w+)", replacement=rf"\1q{i}")
        t = t.set_column(idx, t.schema.field("text"), text)
        nidx = t.schema.get_field_index("n_chars")
        n_chars = pc.cast(pc.utf8_length(t["text"]),
                          t.schema.field("n_chars").type)
        t = t.set_column(nidx, t.schema.field("n_chars"), n_chars)
    return t


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    args = sys.argv[1:]
    # positional-only CLI: a flag-like arg means the caller expected
    # option parsing — fail with usage instead of an obscure
    # FileNotFoundError("--mult/customer.parquet") deep in pyarrow.
    # Purely numeric negatives (e.g. copies=-3) are NOT flags — let them
    # reach the dedicated copies validation below (ADVICE r7).
    if any(a.startswith("-") and not a.lstrip("-").isdigit() for a in args):
        sys.exit(f"usage: {sys.argv[0]} [src_sf_dir] [out_dir] [copies]\n"
                 f"(positional args only; got {args!r})")
    src = args[0] if len(args) > 0 else "/root/testdata/sf0.1"
    if not os.path.isdir(src):
        sys.exit(f"src dir not found: {src!r} — pass an existing "
                 f"testdata scale dir (e.g. /root/testdata/sf0.1)")
    out = (args[1] if len(args) > 1
           else os.path.join(repo, ".benchdata",
                             os.path.basename(src.rstrip("/")) + "x10"))
    copies = int(args[2]) if len(args) > 2 else 10
    if copies < 1:
        sys.exit(f"copies must be >= 1, got {copies}")
    os.makedirs(out, exist_ok=True)

    units = _shift_units(src)
    print("shift units:", units)
    for table in VERBATIM:
        t = pq.read_table(os.path.join(src, f"{table}.parquet"))
        pq.write_table(t, os.path.join(out, f"{table}.parquet"))
        print(f"{table}: {t.num_rows} rows (shared dim, 1 copy)")
    for table in KEYED:
        t = pq.read_table(os.path.join(src, f"{table}.parquet"))
        parts = [_transform(table, t, i, units) for i in range(copies)]
        merged = pa.concat_tables(parts)
        pq.write_table(merged, os.path.join(out, f"{table}.parquet"))
        print(f"{table}: {t.num_rows} -> {merged.num_rows} rows")
    print("fixture at", out)


if __name__ == "__main__":
    main()
