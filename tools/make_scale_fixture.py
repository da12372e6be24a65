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

Flags (r15):
- --plant=N appends N PRODUCTION-BAND companion vectors to the
  embeddings table before copying: companion j is an exact-angle
  rotation of base vector j%n toward a deterministic orthogonal
  direction, with target cosines spread linspace(0.86, 0.98) — the
  similarity envelope a real near-dup corpus carries, which the
  original fixture lacks (its planted pairs sit at cos 0.45-0.60, so
  production-band recall was only ever ANALYTIC — VERDICT r14 item 2).
  The per-copy signed-permutation transform preserves within-copy
  cosines, so every copy carries the same planted production pairs.
  Intended composition: build an augmented 1-copy source first
  (copies=1 --plant=N), then scale THAT dir without --plant — planting
  twice would double-append.
- --tables=a,b,c restricts output to a table subset (e.g. embeddings-
  only recall fixtures — 100x of just embeddings is ~100 MB vs 1.5 GB
  for the full warehouse).

Flags (r16):
- --iid=N writes an embeddings-only fixture of N i.i.d.-DIRECTION unit
  vectors (dim 64, schema-identical to the testdata table) instead of
  copying a source — the de-correlated corpus VERDICT r15 item 2 needs
  to split the measured above-clamp bucket overdispersion into fixture
  artifact vs real angular-spread dispersion (the copy fixtures
  concentrate 3,496 signed-permutation images of one 2,400-vector
  source into correlated buckets). Deterministic and seedless per repo
  rules: component (i, d) comes from splitmix64 of the flat counter —
  two 64-bit hashes -> Box-Muller -> exact i.i.d. Gaussian components
  -> row-normalized, so directions are exactly uniform on S^63.
  Vectorized uint64 numpy; ~8.4M rows stream in row-group chunks.
- --force overrides the refuse-to-overwrite guard on an existing
  embeddings.parquet output (ADVICE r15 item 4: the engine's footer
  row-count cache keys on the file's stat stamp — which a same-named
  part-file rewrite inside a DIRECTORY output can evade, so fixture
  dirs stay immutable-by-default instead).

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

PLANT_COS_LO, PLANT_COS_HI = 0.86, 0.98

IID_DIM = 64          # matches every shipped embeddings corpus
IID_CHUNK = 1 << 18   # rows per generated parquet row group


def _splitmix64(x):
    """Vectorized splitmix64 over a uint64 ndarray — full-avalanche
    counter hash, the standard seedless way to turn a flat index into
    64 i.i.d.-looking bits (numpy uint64 arithmetic wraps mod 2^64,
    which is exactly the splitmix recurrence)."""
    import numpy as np
    x = x + np.uint64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _iid_chunk(lo: int, hi: int):
    """Rows [lo, hi) of the i.i.d.-direction corpus: two counter hashes
    per component -> Box-Muller -> exact i.i.d. N(0,1) components ->
    row-normalize. Directions are then exactly uniform on the sphere
    (the property the de-correlation probe needs); no RNG state, the
    fixture is a pure function of the row index."""
    import numpy as np
    idx = (np.arange(lo, hi, dtype=np.uint64)[:, None] * np.uint64(2 * IID_DIM)
           + np.uint64(2) * np.arange(IID_DIM, dtype=np.uint64)[None, :])
    # u1 in (0,1] (log-safe), u2 in [0,1): top 53 bits of each hash
    u1 = ((_splitmix64(idx) >> np.uint64(11)).astype(np.float64) + 1.0) * 2.0 ** -53
    u2 = (_splitmix64(idx + np.uint64(1)) >> np.uint64(11)).astype(np.float64) * 2.0 ** -53
    z = np.sqrt(-2.0 * np.log(u1)) * np.cos(2.0 * np.pi * u2)
    z /= np.linalg.norm(z, axis=1, keepdims=True)
    return z.astype(np.float32)


def _write_iid_fixture(out: str, n: int) -> None:
    import numpy as np
    schema = pa.schema([
        pa.field("vec_id", pa.int64()),
        pa.field("embedding", pa.list_(pa.field("element", pa.float32()))),
        pa.field("label", pa.int32()),
    ])
    path = os.path.join(out, "embeddings.parquet")
    with pq.ParquetWriter(path, schema) as writer:
        for lo in range(0, n, IID_CHUNK):
            hi = min(lo + IID_CHUNK, n)
            z = _iid_chunk(lo, hi)
            offsets = pa.array(
                np.arange(0, (hi - lo + 1) * IID_DIM, IID_DIM, dtype=np.int32))
            emb = pa.ListArray.from_arrays(
                offsets, pa.array(z.reshape(-1), type=pa.float32())) \
                .cast(schema.field("embedding").type)
            ids = np.arange(lo, hi, dtype=np.int64)
            writer.write_table(pa.table({
                "vec_id": pa.array(ids, type=pa.int64()),
                "embedding": emb,
                "label": pa.array((ids % 16).astype(np.int32), type=pa.int32()),
            }, schema=schema))
    print(f"embeddings: {n} i.i.d.-direction unit vectors (dim {IID_DIM}) "
          f"at {path}")


def _plant_production_pairs(t: pa.Table, n_plant: int) -> pa.Table:
    """Append n_plant companion vectors with EXACT target cosines to
    their base vectors, spread linspace(0.86, 0.98) — the production
    near-dup band. Companion j pairs with base row j % n: rotate the
    base vector by angle arccos(c_j) toward a deterministic orthogonal
    direction (roll-by-1, Gram-Schmidt against the base), keeping the
    norm. cos(base, companion) == c_j by construction (to float32
    storage precision, ~1e-7 — three decimals finer than any band
    boundary the recall probes use). No RNG anywhere: the fixture is a
    pure function of the source. Non-embedding columns are copied from
    the base row; vec_ids continue after the source max (and the shift
    units are computed AFTER planting, so copies stay disjoint)."""
    import numpy as np
    ids = t["vec_id"].to_numpy()
    col = t["embedding"].combine_chunks()
    X = np.stack(col.to_pylist()).astype(np.float64)
    n, dim = X.shape
    cos_targets = np.linspace(PLANT_COS_LO, PLANT_COS_HI, n_plant)
    base_idx = np.arange(n_plant) % n
    V = X[base_idx]
    norms = np.linalg.norm(V, axis=1, keepdims=True)
    vh = V / norms
    U = np.roll(V, 1, axis=1)
    U = U - (U * vh).sum(axis=1, keepdims=True) * vh
    u_norms = np.linalg.norm(U, axis=1, keepdims=True)
    # fail LOUDLY rather than writing NaN companions: a zero or
    # constant-component base vector makes roll(V,1) parallel to V and
    # the Gram-Schmidt direction collapses (r15 review finding) — the
    # shipped corpora are dense random floats, so this is a guard, not
    # a code path
    if not (u_norms > 1e-12).all():
        bad = int(base_idx[np.nonzero(u_norms.ravel() <= 1e-12)[0][0]])
        raise SystemExit(
            f"--plant: base vector row {bad} is degenerate (zero or "
            f"constant components) — cannot build an orthogonal "
            f"companion direction deterministically")
    U = U / u_norms
    c = cos_targets[:, None]
    planted = norms * (c * vh + np.sqrt(1.0 - c * c) * U)
    base_rows = t.take(pa.array(base_idx, type=pa.int32()))
    next_id = int(ids.max()) + 1
    new_ids = pa.array(np.arange(next_id, next_id + n_plant),
                       type=t.schema.field("vec_id").type)
    flat = planted.reshape(-1)
    offsets = pa.array(np.arange(0, (n_plant + 1) * dim, dim,
                                 dtype=np.int32))
    values = pa.array(flat.astype(np.float64),
                      type=col.type.value_type)
    emb = pa.ListArray.from_arrays(offsets, values) \
        .cast(t.schema.field("embedding").type)
    appended = base_rows \
        .set_column(t.schema.get_field_index("vec_id"),
                    t.schema.field("vec_id"), new_ids) \
        .set_column(t.schema.get_field_index("embedding"),
                    t.schema.field("embedding"), emb)
    return pa.concat_tables([t, appended])


def _shift_units(src: str, tables: list[str],
                 planted_emb: pa.Table | None = None) -> dict[str, int]:
    """One shift unit per key space = max over every column using it + 1
    (so shifted copies are disjoint AND referentially consistent).
    When embeddings were planted, the unit must come from the AUGMENTED
    table or copy 1's ids would collide with copy 0's planted rows."""
    units: dict[str, int] = {}
    for table in tables:
        cols = KEYED[table]
        if table == "embeddings" and planted_emb is not None:
            t = planted_emb
        else:
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
    plant = 0
    iid = 0
    force = False
    subset: list[str] | None = None
    positional = []
    for a in args:
        if a.startswith("--plant="):
            plant = int(a.split("=", 1)[1])
        elif a.startswith("--iid="):
            iid = int(a.split("=", 1)[1])
        elif a == "--force":
            force = True
        elif a.startswith("--tables="):
            subset = [s for s in a.split("=", 1)[1].split(",") if s]
        elif a.startswith("-") and not a.lstrip("-").isdigit():
            # unknown flag: fail with usage instead of an obscure
            # FileNotFoundError("--mult/customer.parquet") deep in
            # pyarrow. Purely numeric negatives (e.g. copies=-3) are
            # NOT flags — the copies validation below owns those
            # (ADVICE r7).
            sys.exit(f"usage: {sys.argv[0]} [src_sf_dir] [out_dir] "
                     f"[copies] [--plant=N] [--tables=a,b,c] [--iid=N] "
                     f"[--force]\n(got {a!r})")
        else:
            positional.append(a)
    args = positional
    if iid:
        # i.i.d. mode is embeddings-only and sourceless: the single
        # positional is the OUTPUT dir
        if len(args) != 1 or plant or subset is not None:
            sys.exit("--iid=N takes exactly one positional (out_dir) "
                     "and composes with no other mode flag")
        out = args[0]
        emb_out = os.path.join(out, "embeddings.parquet")
        if os.path.exists(emb_out) and not force:
            sys.exit(f"refusing to overwrite {emb_out} (fixture dirs "
                     f"are immutable-by-default — pass --force)")
        os.makedirs(out, exist_ok=True)
        _write_iid_fixture(out, iid)
        return
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
    if plant < 0:
        sys.exit(f"--plant must be >= 0, got {plant}")
    keyed_tables = list(KEYED)
    verbatim_tables = list(VERBATIM)
    if subset is not None:
        unknown = set(subset) - set(KEYED) - set(VERBATIM)
        if unknown:
            sys.exit(f"--tables: unknown {sorted(unknown)!r}")
        keyed_tables = [t for t in keyed_tables if t in subset]
        verbatim_tables = [t for t in verbatim_tables if t in subset]
    if plant and "embeddings" not in keyed_tables:
        sys.exit("--plant requires embeddings in the table set")
    emb_out = os.path.join(out, "embeddings.parquet")
    if ("embeddings" in keyed_tables and os.path.exists(emb_out)
            and not force):
        # ADVICE r15 item 4: the engine's footer-count cache stamps the
        # embeddings file's stat, which a same-named part-file rewrite
        # inside a DIRECTORY output can evade — fixture dirs therefore
        # stay immutable-by-default
        sys.exit(f"refusing to overwrite {emb_out} (fixture dirs are "
                 f"immutable-by-default — pass --force)")
    os.makedirs(out, exist_ok=True)

    planted_emb = None
    if plant:
        planted_emb = _plant_production_pairs(
            pq.read_table(os.path.join(src, "embeddings.parquet")), plant)
        print(f"embeddings: planted {plant} production-band companions "
              f"(cos {PLANT_COS_LO}-{PLANT_COS_HI})")
    units = _shift_units(src, keyed_tables, planted_emb)
    print("shift units:", units)
    for table in verbatim_tables:
        t = pq.read_table(os.path.join(src, f"{table}.parquet"))
        pq.write_table(t, os.path.join(out, f"{table}.parquet"))
        print(f"{table}: {t.num_rows} rows (shared dim, 1 copy)")
    for table in keyed_tables:
        if table == "embeddings" and planted_emb is not None:
            t = planted_emb
        else:
            t = pq.read_table(os.path.join(src, f"{table}.parquet"))
        parts = [_transform(table, t, i, units) for i in range(copies)]
        merged = pa.concat_tables(parts)
        pq.write_table(merged, os.path.join(out, f"{table}.parquet"))
        print(f"{table}: {t.num_rows} -> {merged.num_rows} rows")
    print("fixture at", out)


if __name__ == "__main__":
    main()
