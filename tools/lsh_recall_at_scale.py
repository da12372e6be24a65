#!/usr/bin/env python
"""Measured recall of the corpus-size-adaptive embedding near-dup at
the scale fixtures (r14 follow-through on VERDICT r13 item 3): the
occupancy probe proves candidate volume stays O(n) as w grows; this
tool measures what that costs in recall ON THE PLANTED TRUTH, next to
the analytic S-curve prediction, so the trade is a recorded number
and not a docstring claim.

Ground truth is exact and cheap by construction: the scale fixture's
per-copy embedding transform is a signed permutation (roll + sign
flips — tools/make_scale_fixture.py), which preserves within-copy
inner products, so the true within-copy pair set at cos >= 0.45 is the
1x brute-force pair set replicated into every copy at vec_id offset
i * n_base. Recall here = fraction of those planted pairs the banded
near-dup reports. (Cross-copy pairs above threshold also exist at
large copy counts and are genuine near-dup output, but they are not
cheaply enumerable — they are excluded from the denominator and do not
count as hits.)

Analytic reference: a pair with cosine c has per-plane agreement
q = 1 - arccos(c)/pi and collides in >= 1 of L w-bit tables with
P = 1 - (1 - q^w)^L; the expected recall is the mean of P over the
planted pairs' cosines.

r15: recall is reported PER COSINE BAND, and --base=<dir> points the
ground truth at an augmented source (make_scale_fixture --plant plants
companions at exact cosines 0.86-0.98). The production band
(cos >= 0.86) is the envelope the constant-L design defends — before
r15 the fixture's planted pairs all sat at cos 0.45-0.60, so the
production-band claim was analytic-only (VERDICT r14 item 2).

    python tools/lsh_recall_at_scale.py [--base=<dir>] [fixture_dir ...]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE = "/root/testdata/sf0.1"
THRESHOLD = 0.45

#: cosine bands for per-band recall: the fixture's legacy near-threshold
#: pairs land in the first three; --plant companions fill the last (the
#: production envelope). Upper edge 1.01 so exact-1.0 pairs count.
COS_BANDS = [(0.45, 0.55), (0.55, 0.70), (0.70, 0.86), (0.86, 1.01)]


def base_truth(base: str) -> tuple[np.ndarray, list[tuple[int, int]],
                                   np.ndarray]:
    tbl = pq.read_table(os.path.join(base, "embeddings.parquet"),
                        columns=["vec_id", "embedding"])
    ids = tbl["vec_id"].to_numpy()
    X = np.stack(tbl["embedding"].to_pylist()).astype(np.float64)
    order = np.argsort(ids)
    X = X[order]
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    C = Xn @ Xn.T
    iu = np.triu_indices(len(X), k=1)
    mask = C[iu] >= THRESHOLD
    pairs = list(zip(iu[0][mask].tolist(), iu[1][mask].tolist()))
    cosines = C[iu][mask]
    return X, pairs, cosines


def main() -> int:
    args = sys.argv[1:]
    base = BASE
    dirs = []
    for a in args:
        if a.startswith("--base="):
            base = a.split("=", 1)[1]
        else:
            dirs.append(a)
    dirs = dirs or [base,
                    REPO + "/.benchdata/sf0.1x10",
                    REPO + "/.benchdata/sf0.1x30",
                    REPO + "/.benchdata/sf0.1x100"]
    from mapreduce_4sl08_spark.plans import QUERIES, all_session_memos
    from mapreduce_4sl08_spark.plans.vectors import (
        corpus_vec_count, lsh_params)
    from mapreduce_4sl08_spark.session import get_session

    X, pairs, cosines = base_truth(base)
    n_base = len(X)
    q = 1.0 - np.arccos(np.clip(cosines, -1, 1)) / np.pi
    print(f"base truth ({base}): {len(pairs)} within-copy pairs at "
          f"cos >= {THRESHOLD} over {n_base} vectors "
          f"(cos range {cosines.min():.3f}-{cosines.max():.3f})",
          flush=True)
    band_idx = [np.nonzero((cosines >= lo) & (cosines < hi))[0]
                for lo, hi in COS_BANDS]
    for (lo, hi), idx in zip(COS_BANDS, band_idx):
        print(f"  band [{lo:.2f},{hi:.2f}): {len(idx)} base pairs")

    spark = get_session()
    for sf in dirs:
        tag = sf.rstrip("/").rsplit("/", 1)[-1]
        for m in all_session_memos().values():
            m.clear()
        spark.catalog.clearCache()
        n = corpus_vec_count(sf)
        copies = n // n_base
        w, L = lsh_params(n)
        t0 = time.time()
        found = {(r.id_a, r.id_b) for r in
                 QUERIES["embedding_near_dup"].fn(spark, sf).collect()}
        wall = time.time() - t0
        hit_mask = np.array(
            [[(a + c * n_base, b + c * n_base) in found for a, b in pairs]
             for c in range(copies)])
        hits = int(hit_mask.sum())
        planted = copies * len(pairs)
        expected = float(np.mean(1.0 - (1.0 - q ** w) ** L))
        print(f"{tag}: n={n} w={w} L={L} (sig {w * L} planes)  "
              f"recall {hits}/{planted} = {hits / planted:.3f}  "
              f"S-curve predicts {expected:.3f}  "
              f"output pairs {len(found)}  ({wall:.1f}s)", flush=True)
        for (lo, hi), idx in zip(COS_BANDS, band_idx):
            if not len(idx):
                continue
            bh = int(hit_mask[:, idx].sum())
            bp = copies * len(idx)
            exp_b = float(np.mean(1.0 - (1.0 - q[idx] ** w) ** L))
            print(f"    cos [{lo:.2f},{hi:.2f}): recall {bh}/{bp} = "
                  f"{bh / bp:.3f}  S-curve {exp_b:.3f}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
