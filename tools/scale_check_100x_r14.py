#!/usr/bin/env python
"""r14 100x scale check (VERDICT r13 item 8): pin the designated scale
paths a full decade past the 30x evidence. Runs the dedup stack
(minhash, simhash, jaccard funnel, CC) and the r14 band-width-adaptive
embedding near-dup at 30x and 100x with memos reset per scale
(first-invocation semantics), printing wall times and the load-bearing
FUNNEL COUNTS. Done-condition: 100x funnel counts within ~3.3x of the
30x counts (linear continuation).

    python tools/scale_check_100x_r14.py [fixture_dir ...]
"""
import os
import sys
import time

# abspath, not __file__.rsplit: a relative invocation like
# `python tools/scale_check_100x_r14.py` would otherwise yield 'tools'
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F                         # noqa: E402

from mapreduce_4sl08_spark.plans import QUERIES, all_session_memos  # noqa: E402
from mapreduce_4sl08_spark.session import get_session          # noqa: E402

QUERY_NAMES = ["dedup_minhash_lsh", "simhash_dedup", "dedup_ngram_jaccard",
               "dedup_connected_components", "embedding_near_dup"]


def main() -> int:
    dirs = sys.argv[1:] or [REPO + "/.benchdata/sf0.1x30",
                            REPO + "/.benchdata/sf0.1x100"]
    spark = get_session()
    for sf in dirs:
        tag = sf.rstrip("/").rsplit("/", 1)[-1]
        for m in all_session_memos().values():
            m.clear()
        spark.catalog.clearCache()

        # funnel counts first (they build the memoized relations the
        # timed queries then reuse — same session semantics as bench
        # pass interiors; the timings below are therefore the
        # post-index query costs, the steady-state serving shape)
        from mapreduce_4sl08_spark.plans.text import (
            _jaccard_candidates, _minhash_candidates)
        from mapreduce_4sl08_spark.plans.vectors import (
            corpus_vec_count, lsh_corpus_bands, lsh_params)
        t0 = time.time()
        jc, _ = _jaccard_candidates(spark, sf)
        n_jc = jc.count()
        print(f"{tag}: jaccard candidates = {n_jc} "
              f"({time.time() - t0:.1f}s)", flush=True)
        t0 = time.time()
        mc, _ = _minhash_candidates(spark, sf)
        n_mc = mc.count()
        print(f"{tag}: minhash banded candidates = {n_mc} "
              f"({time.time() - t0:.1f}s)", flush=True)
        n_vec = corpus_vec_count(sf)
        w, n_tables = lsh_params(n_vec)
        t0 = time.time()
        bands = lsh_corpus_bands(spark, sf)
        a, b = bands.alias("a"), bands.alias("b")
        n_emb = (a.join(b, (F.col("a.band_key") == F.col("b.band_key"))
                        & (F.col("a.vec_id") < F.col("b.vec_id")))
                 .select("a.vec_id", "b.vec_id").distinct().count())
        print(f"{tag}: embedding band candidates = {n_emb} "
              f"(n={n_vec} w={w} L={n_tables}, per-vec {n_emb / n_vec:.0f},"
              f" {time.time() - t0:.1f}s)", flush=True)

        for name in QUERY_NAMES:
            t0 = time.time()
            n = QUERIES[name].fn(spark, sf).count()
            print(f"{tag}: {name}: {time.time() - t0:.1f}s ({n} rows)",
                  flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
