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

    python tools/lsh_recall_at_scale.py [fixture_dir ...]
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


def base_truth() -> tuple[np.ndarray, list[tuple[int, int]], np.ndarray]:
    tbl = pq.read_table(os.path.join(BASE, "embeddings.parquet"),
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
    dirs = sys.argv[1:] or [BASE,
                            REPO + "/.benchdata/sf0.1x10",
                            REPO + "/.benchdata/sf0.1x30",
                            REPO + "/.benchdata/sf0.1x100"]
    from mapreduce_4sl08_spark.plans import QUERIES, all_session_memos
    from mapreduce_4sl08_spark.plans.vectors import (
        corpus_vec_count, lsh_params)
    from mapreduce_4sl08_spark.session import get_session

    X, pairs, cosines = base_truth()
    n_base = len(X)
    q = 1.0 - np.arccos(np.clip(cosines, -1, 1)) / np.pi
    print(f"base truth: {len(pairs)} within-copy pairs at cos >= "
          f"{THRESHOLD} over {n_base} vectors "
          f"(cos range {cosines.min():.3f}-{cosines.max():.3f})",
          flush=True)

    spark = get_session()
    for sf in dirs:
        tag = sf.rstrip("/").rsplit("/", 1)[-1]
        for m in all_session_memos().values():
            m.clear()
        spark.catalog.clearCache()
        n = corpus_vec_count(sf)
        copies = n // n_base
        w, L = lsh_params(n)
        expected = float(np.mean(1.0 - (1.0 - q ** w) ** L))
        t0 = time.time()
        found = {(r.id_a, r.id_b) for r in
                 QUERIES["embedding_near_dup"].fn(spark, sf).collect()}
        wall = time.time() - t0
        hits = sum((a + c * n_base, b + c * n_base) in found
                   for c in range(copies) for a, b in pairs)
        planted = copies * len(pairs)
        print(f"{tag}: n={n} w={w} L={L} (sig {w * L} planes)  "
              f"recall {hits}/{planted} = {hits / planted:.3f}  "
              f"S-curve predicts {expected:.3f}  "
              f"output pairs {len(found)}  ({wall:.1f}s)", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
