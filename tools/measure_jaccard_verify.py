#!/usr/bin/env python
"""Quantify the near-dup candidate→verified funnels (VERDICT r5 item
5): how many pairs survive the AllPairs/PPJoin prefix cascade and the
MinHash-LSH banding, how many clear exact-Jaccard verification, and
where the time goes (candidate generation vs verification).

    python tools/measure_jaccard_verify.py [sf_dir ...]

Prints one JSON line per (pipeline, sf_dir). The candidate stage is
timed first (forces the shingle index + prefix/band join); the verify
stage then runs incrementally against the persisted candidate set, so
its timing is the marginal cost of verification alone.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from mapreduce_4sl08_spark.plans import text
    from mapreduce_4sl08_spark.session import get_session

    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.1"]
    spark = get_session("jaccard-funnel")
    pipelines = {
        "jaccard": (text._jaccard_candidates, 0.5),
        "minhash": (text._minhash_candidates, text._JACCARD_THRESHOLD),
    }
    for sf_dir in sf_dirs:
        for name, (cand_fn, threshold) in pipelines.items():
            for memo in (text._SHINGLE_MEMO, text._NGRAM_PAIRS_MEMO):
                memo.clear()
            spark.catalog.clearCache()

            t0 = time.perf_counter()
            cand, sets = cand_fn(spark, sf_dir)
            cand = cand.persist()
            n_cand = cand.count()
            t_cand = time.perf_counter() - t0

            t0 = time.perf_counter()
            n_verified = text._verify_pairs(cand, sets, threshold).count()
            t_verify = time.perf_counter() - t0

            n_docs = text.t(spark, sf_dir, "documents").count()
            print(json.dumps({
                "pipeline": name,
                "sf_dir": sf_dir,
                "n_docs": n_docs,
                "threshold": threshold,
                "candidates": n_cand,
                "verified": n_verified,
                "survival_rate": round(n_verified / max(n_cand, 1), 4),
                "cand_sec": round(t_cand, 2),
                "verify_sec": round(t_verify, 2),
            }), flush=True)
            cand.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
