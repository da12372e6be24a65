#!/usr/bin/env python
"""Interleaved A/B of the r22 _verify_pairs rewrite (VERDICT r21 item 3):

  arm OLD — the r21 shape: join both docs' FULL shingle-set arrays onto
            every candidate row, n_common = size(array_intersect(...))
  arm NEW — the shipped r22 shape: count shared shingles by joining the
            pair list against the per-doc shingle relation twice and
            aggregating (guide §2.3: shuffle keys, not payloads)

Both arms read the SAME persisted candidate set and shingle index, so
the delta is the verify stage alone. Arms alternate (OLD,NEW,NEW,OLD,…)
each rep to cancel box drift; result-set equality between arms is
asserted on the first rep. One JSON line per sf_dir.

usage: ab_jaccard_verify_r22.py [sf_dir ...] [--reps N]
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mapreduce_4sl08_spark.plans import text  # noqa: E402
from mapreduce_4sl08_spark.session import get_session  # noqa: E402

THRESHOLD = 0.5


def verify_old(cand, sets, threshold):
    """The r21 production verify, reproduced verbatim for the A arm."""
    p, q = text._threshold_floor_rational(threshold)
    sa = sets.select(F.col("doc_id").alias("doc_a"),
                     F.col("sh_set").alias("set_a"), F.col("n_sh").alias("n_sh_a"))
    sb = sets.select(F.col("doc_id").alias("doc_b"),
                     F.col("sh_set").alias("set_b"), F.col("n_sh").alias("n_sh_b"))
    return (
        cand.join(sa, "doc_a").join(sb, "doc_b")
        .filter(F.expr(f"{q} * least(n_sh_a, n_sh_b)"
                       f" >= {p} * greatest(n_sh_a, n_sh_b)"))
        .withColumn("n_common", F.expr(
            "CAST(size(array_intersect(set_a, set_b)) AS BIGINT)"))
        .withColumn("jaccard", F.expr(
            "round(n_common / (n_sh_a + n_sh_b - n_common), 4)"))
        .filter(F.col("jaccard") >= threshold)
    )


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 5
    for a in sys.argv[1:]:
        if a.startswith("--reps"):
            reps = int(a.split("=", 1)[1] if "=" in a else sys.argv[sys.argv.index(a) + 1])
    sf_dirs = args or ["/root/testdata/sf0.1"]
    spark = get_session("ab-jaccard-verify-r22")
    sink = lambda df: df.write.mode("overwrite").format("noop").save()  # noqa: E731

    for sf_dir in sf_dirs:
        for memo in (text._SHINGLE_MEMO, text._NGRAM_PAIRS_MEMO):
            memo.clear()
        spark.catalog.clearCache()
        cand, sets = text._jaccard_candidates(spark, sf_dir, THRESHOLD)
        cand = cand.persist()
        n_cand = cand.count()
        arms = {
            "old_arrays": lambda: verify_old(cand, sets, THRESHOLD),
            "new_count": lambda: text._verify_pairs(cand, sets, THRESHOLD),
        }
        # result equality between arms (doc_a, doc_b, n_common, jaccard)
        cols = ["doc_a", "doc_b", "n_common", "jaccard"]
        rows = {k: sorted(map(tuple, fn().select(cols).collect()))
                for k, fn in arms.items()}
        assert rows["old_arrays"] == rows["new_count"], "ARMS DISAGREE"
        n_verified = len(rows["new_count"])

        times: dict[str, list[float]] = {k: [] for k in arms}
        order = ["old_arrays", "new_count"]
        for rep in range(reps):
            for k in (order if rep % 2 == 0 else order[::-1]):
                spark.sparkContext.setJobDescription(f"verify:{k}:rep{rep}")
                t0 = time.perf_counter()
                sink(arms[k]())
                times[k].append(time.perf_counter() - t0)
        cand.unpersist()
        print(json.dumps({
            "sf_dir": sf_dir, "candidates": n_cand, "verified": n_verified,
            "reps": reps,
            **{f"{k}_median": round(statistics.median(v), 3) for k, v in times.items()},
            **{f"{k}_all": [round(x, 3) for x in v] for k, v in times.items()},
        }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
