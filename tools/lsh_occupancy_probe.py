#!/usr/bin/env python
"""Analytic LSH bucket-occupancy probe (r13): per scale, the number of
band buckets, the largest bucket, and the exact candidate-pair upper
bound Σ nb·(nb-1)/2 over buckets — computed from bucket SIZES, never by
materializing the pair join. This is the cheap way to see whether the
banded self-join is about to go quadratic. r13 measured the fixed-w=4
band space at 2.1e6 / 2.1e8 / 1.9e9 pairs at 1×/10×/30× (quadratic);
the r14 corpus-size-adaptive width (vectors.adaptive_band_width) holds
the same probe at 2.1e6 / 7.4e6 / 3.2e7 (w = 4/8/9 — O(n)). Re-run
after any banding change; bucket sizes ARE the quadratic early warning.

    python tools/lsh_occupancy_probe.py [sf_dir ...]
"""
import sys
import time

REPO = __file__.rsplit("/", 2)[0]
sys.path.insert(0, REPO)

from mapreduce_4sl08_spark.session import get_session            # noqa: E402
from mapreduce_4sl08_spark.plans.vectors import lsh_corpus_bands  # noqa: E402
from pyspark.sql import functions as F                            # noqa: E402


def main() -> int:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1",
                            REPO + "/.benchdata/sf0.1x10",
                            REPO + "/.benchdata/sf0.1x30"]
    spark = get_session()
    for sf in dirs:
        n_vec = spark.read.parquet(f"{sf}/embeddings.parquet").count()
        t0 = time.time()
        bands = lsh_corpus_bands(spark, sf)
        occ = (bands.groupBy("band_key").agg(F.count(F.lit(1)).alias("nb"))
               .agg(F.count(F.lit(1)).alias("n_buckets"),
                    F.max("nb").alias("max_bucket"),
                    F.sum(F.expr("nb * (nb - 1) div 2")).alias("pair_ub"))
               .collect()[0])
        print(f"{sf.split('/')[-1]:10s} n={n_vec} buckets={occ.n_buckets} "
              f"max_bucket={occ.max_bucket} pair_upper_bound={occ.pair_ub} "
              f"({time.time() - t0:.1f}s)", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
