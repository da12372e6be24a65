#!/usr/bin/env python
"""Measured evidence for the ABOVE-CLAMP LSH regime (r15; VERDICT r14
item 3 stretch): build/point at a fixture with n > 2^16·128 ≈ 8.39M
vectors so the served parameter derivation actually leaves the clamp
(w frozen at 16, L grown by the +8/doubling schedule), then measure
BOTH axes on the served construction:

1. OCCUPANCY — the full-corpus banded relation's bucket stats and the
   exact candidate-pair upper bound Σ nb·(nb-1)/2 (same arithmetic as
   tools/lsh_occupancy_probe.py), confirming E[bucket] and per-vector
   candidate volume match the analytic table one doubling past the
   clamp (bucket ≈ 2·B = 256 at n ≈ 2·clamp, cand/vec ≈ L·E[bucket]).

2. RECALL — planted-pair band-collision recall per cosine band at the
   derived (w, L). A pair collides iff its two signatures share ≥ 1
   w-char band; that depends only on the pair's own vectors (the rest
   of the corpus only sets (w, L) — the whole point of the clamp), so
   recall is measured exactly on the base copy's planted pairs using
   the SERVED signature UDF, band slicing, md5 planes and FLOOR(x·1e6)
   sign quantization at the >clamp plane budget (16·24 = 384 planes).

Usage:
    python tools/lsh_above_clamp_probe.py [fixture_dir] [--base=<dir>]
    python tools/lsh_above_clamp_probe.py --skip-occupancy ...

Default fixture .benchdata/sf0.1pxclamp (build with
  make_scale_fixture .benchdata/sf0.1p .benchdata/sf0.1pxclamp 3496
  --tables=embeddings  → n = 8,390,400 > clamp), default base
.benchdata/sf0.1p (the --plant=400 augmented source).
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# one definition of the truth extraction and the band edges for BOTH
# recall probes — diverging copies would let the two tools report
# inconsistent recall for the same fixture (r15 review finding)
from tools.lsh_recall_at_scale import COS_BANDS, base_truth  # noqa: E402


def main() -> int:
    base = os.path.join(REPO, ".benchdata", "sf0.1p")
    skip_occ = False
    dirs = []
    for a in sys.argv[1:]:
        if a.startswith("--base="):
            base = a.split("=", 1)[1]
        elif a == "--skip-occupancy":
            skip_occ = True
        else:
            dirs.append(a)
    fixture = dirs[0] if dirs else os.path.join(
        REPO, ".benchdata", "sf0.1pxclamp")

    from pyspark.sql import functions as F

    from mapreduce_4sl08_spark.plans.vectors import (
        _BUCKET_TARGET, _MAX_BAND_W, corpus_vec_count, lsh_band_keys,
        lsh_corpus_bands, lsh_params, lsh_signature, plane_matrix)
    from mapreduce_4sl08_spark.session import get_session

    n = corpus_vec_count(fixture)
    w, L = lsh_params(n)
    clamp_n = _BUCKET_TARGET * 2 ** _MAX_BAND_W
    print(f"fixture {fixture}: n={n:,} (clamp at {clamp_n:,}) -> "
          f"w={w} L={L} (sig {w * L} planes)", flush=True)
    if n <= clamp_n:
        sys.exit("fixture does not leave the clamp — build one with "
                 ">= 8,388,609 vectors (see module docstring)")

    # ---- recall on the base copy's planted pairs at the derived (w,L)
    X, pairs, cosines = base_truth(base)
    q = 1.0 - np.arccos(np.clip(cosines, -1, 1)) / np.pi
    print(f"base truth ({base}): {len(pairs)} pairs at cos >= 0.45 "
          f"over {len(X)} vectors", flush=True)

    spark = get_session()
    base_df = spark.createDataFrame(
        [(int(i), [float(v) for v in X[i]]) for i in range(len(X))],
        "vec_id bigint, embedding array<double>")
    planes = plane_matrix(n_planes=w * L)
    bands_small = base_df.select(
        "vec_id",
        F.explode(lsh_band_keys(
            lsh_signature(F.col("embedding"), planes),
            n_tables=L, band_w=w)).alias("band_key"))
    key_sets: dict[int, set] = {}
    for r in bands_small.collect():
        key_sets.setdefault(r.vec_id, set()).add(r.band_key)
    hit = np.array([bool(key_sets[a] & key_sets[b]) for a, b in pairs])
    exp = 1.0 - (1.0 - q ** w) ** L
    print(f"planted-pair band-collision recall at (w={w}, L={L}): "
          f"{int(hit.sum())}/{len(pairs)} = {hit.mean():.3f}  "
          f"S-curve {float(exp.mean()):.3f}", flush=True)
    for lo, hi in COS_BANDS:
        idx = np.nonzero((cosines >= lo) & (cosines < hi))[0]
        if not len(idx):
            continue
        print(f"    cos [{lo:.2f},{hi:.2f}): recall "
              f"{int(hit[idx].sum())}/{len(idx)} = {hit[idx].mean():.3f}"
              f"  S-curve {float(exp[idx].mean()):.3f}", flush=True)

    # ---- full-corpus occupancy at the >clamp operating point
    if not skip_occ:
        t0 = time.time()
        bands = lsh_corpus_bands(spark, fixture)
        occ = (bands.groupBy("band_key")
               .agg(F.count(F.lit(1)).alias("nb"))
               .agg(F.count(F.lit(1)).alias("n_buckets"),
                    F.max("nb").alias("max_bucket"),
                    F.sum(F.expr("nb * (nb - 1) div 2")).alias("pair_ub"))
               .collect()[0])
        per_vec = occ.pair_ub * 2 / n
        # rho = the i.i.d.-direction angular-dispersion factor (r16;
        # exact quadrature — see lsh_occupancy_probe.band_dispersion):
        # uniform-bucket L*E[bucket] under-counts real background
        # candidate volume by exactly this geometry, measured 0.97-1.0x
        # of rho-corrected on both the copy and the i.i.d. fixtures
        # (logs/lsh_iid_overdispersion_r16.txt)
        from tools.lsh_occupancy_probe import band_dispersion
        rho = band_dispersion(w)
        print(f"occupancy: buckets={occ.n_buckets:,} "
              f"max_bucket={occ.max_bucket:,} "
              f"pair_upper_bound={occ.pair_ub:,} "
              f"(~{per_vec:,.0f} candidates/vector; analytic "
              f"rho*L*E[bucket] = {rho * L * n / 2 ** w:,.0f}, "
              f"uniform {L * n / 2 ** w:,.0f}, rho={rho:.3f})  "
              f"({time.time() - t0:.0f}s)", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
