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
    python tools/lsh_occupancy_probe.py --analytic   # formula-only table

--analytic prints the closed-form schedule across the full n range
INCLUDING the above-clamp regime (r15): (w, L), expected bucket size
n/2^w, per-vector candidate bound, total candidate bound, and the
cos-0.9 design point's S-curve recall 1-(1-q^w)^L. No Spark session,
no fixture — this is the table that shows WHERE the capped key space
makes verify cost grow linearly and how the +8-tables-per-doubling
schedule buys recall back (0.754 → 0.878 → 0.939 → 0.970 → 0.985 ...).

The candidate columns carry the ANGULAR-DISPERSION factor ρ(w, dim)
(r16; VERDICT r15 item 1): two i.i.d. directions on S^(dim-1) are NOT
uniformly hashed over the 2^w band keys — their per-plane agreement is
1-θ/π with θ spread around π/2 by the cos θ ~ f(c) ∝ (1-c²)^((dim-3)/2)
law, and Jensen makes E[(1-θ/π)^w] > 2^-w. ρ is that ratio, computed by
exact quadrature (no sampling): ρ(16, 64) = 2.029. The r15 above-clamp
probes measured cand/vec at 2.01×/2.00× the then-uniform analytic —
within 1.5 % of ρ — so the "overdispersion" was real geometry, not the
copy-concentrated fixture (confirmed on the i.i.d. fixture,
logs/lsh_iid_overdispersion_r16.txt). Capacity plans sized off this
table now include it.
"""
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def band_dispersion(w: int, dim: int = 64, steps: int = 2_000_001) -> float:
    """ρ(w, dim) = 2^w · P[two i.i.d. S^(dim-1) directions share one
    w-plane band] — exact quadrature over the cos θ density
    f(c) ∝ (1-c²)^((dim-3)/2), no sampling. ρ(16, 64) = 2.029: the
    factor by which real background candidate volume exceeds the
    uniform-bucket n/2^w estimate (measured 2.00-2.01× in the r15/r16
    probes)."""
    import numpy as np
    c = np.linspace(-1.0, 1.0, steps)[1:-1]
    f = (1.0 - c * c) ** ((dim - 3) / 2.0)
    p = (np.trapz((1.0 - np.arccos(c) / np.pi) ** w * f, c)
         / np.trapz(f, c))
    return p * 2.0 ** w


#: verify-stage unit costs (VERDICT r16 item 5): each surviving
#: candidate pair is one exact cosine — 2·dim FLOPs of dot product
#: (norms are precomputed once per vector, amortized to nothing) — and
#: one shuffled join row carrying both float32 embeddings plus ids
#: (2 · (4·dim + 8) bytes; Tungsten row overhead adds ~10 %, ignored
#: here as the estimate is already conservative via the pair UPPER
#: bound rho·L·n·E[bucket]/2 before dedup).
_VERIFY_FLOPS_PER_PAIR = 2 * 64
_VERIFY_BYTES_PER_PAIR = 2 * (4 * 64 + 8)


def analytic_table() -> int:
    from mapreduce_4sl08_spark.plans.vectors import (
        _BUCKET_TARGET, _MAX_BAND_W, lsh_params)
    q = 1 - math.acos(0.9) / math.pi  # design point: cos 0.9 neighbor
    clamp_n = _BUCKET_TARGET * 2 ** _MAX_BAND_W
    print(f"design point cos=0.9 (q={q:.4f}); clamp at n={clamp_n:,}; "
          f"candidate columns include the i.i.d.-direction dispersion "
          f"rho(w, dim=64); verify columns price the exact-cosine stage "
          f"(2*dim FLOPs and {_VERIFY_BYTES_PER_PAIR} B of join shuffle "
          f"per candidate pair)")
    print(f"{'n':>15} {'w':>3} {'L':>3} {'rho':>6} {'E[bucket]':>10} "
          f"{'cand/vec':>10} {'cand total':>12} {'recall@.9':>9} "
          f"{'verifyTFLOP':>11} {'shuffleTiB':>10} {'x/dbl':>6}")
    ns = ([2_000, 20_000, 200_000, 2_000_000, clamp_n]
          + [clamp_n * 2 ** k + 1 for k in range(0, 5)])
    rho_cache: dict[int, float] = {}
    prev_pairs = None
    for n in ns:
        w, L = lsh_params(n)
        rho = rho_cache.setdefault(w, band_dispersion(w))
        eb = n / 2 ** w
        recall = 1 - (1 - q ** w) ** L
        pairs = rho * L * n * eb / 2
        growth = f"{pairs / prev_pairs:>6.2f}" if prev_pairs else f"{'':>6}"
        prev_pairs = pairs if n > clamp_n else None  # ratio only per
        # above-clamp doubling (the +1 rows step n by exactly 2x)
        print(f"{n:>15,} {w:>3} {L:>3} {rho:>6.3f} {eb:>10.1f} "
              f"{rho * L * eb:>10.0f} {pairs:>12.3g} {recall:>9.3f} "
              f"{pairs * _VERIFY_FLOPS_PER_PAIR / 1e12:>11.3g} "
              f"{pairs * _VERIFY_BYTES_PER_PAIR / 2 ** 40:>10.3g} "
              f"{growth}")
    print(
        "\nabove the clamp, verify grows ~(2*L'/L)x per corpus doubling\n"
        "(n doubles AND L gains 8 tables): x5.3 at the first doubling,\n"
        "settling toward x4 — super-quadratic by design, because the\n"
        "+8-tables schedule spends part of the forced occupancy growth\n"
        "on recall. The alternative once VERIFY dominates: grow the\n"
        "band-key space past 2^16 (w=17..20) and recover the lost\n"
        "per-table recall (q^w shrinks ~0.86x per bit) with multi-probe\n"
        "— probing the T lowest-margin neighbor keys costs T extra\n"
        "band-join LOOKUPS per vector (no dot products), while every\n"
        "extra w bit HALVES E[bucket] and so cand/vec. At k doublings\n"
        "past the clamp the schedules price as (16+8k)*2^k (tables) vs\n"
        "~constant cand/vec (w growth + multi-probe): the crossover is\n"
        "immediate in FLOPs, but this repo keeps the table schedule\n"
        "through k<=3 (n<=67M, <=3.4e12 pairs) because every band key\n"
        "stays a pure deterministic function both engines derive from\n"
        "COUNT(*) — the multi-probe neighbor-key set (per-vector margin\n"
        "sort) has no tractable DuckDB mirror, so past k=3 the honest\n"
        "path is w=20 + multi-probe on the Spark side with a sampled\n"
        "(not exhaustive) oracle, priced here so the switch is a\n"
        "decision, not a surprise.")
    return 0


from mapreduce_4sl08_spark.session import get_session            # noqa: E402
from mapreduce_4sl08_spark.plans.vectors import lsh_corpus_bands  # noqa: E402
from pyspark.sql import functions as F                            # noqa: E402


def main() -> int:
    if "--analytic" in sys.argv[1:]:
        return analytic_table()
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
