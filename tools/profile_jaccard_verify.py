"""A/B a suffix-style pre-intersect bound in the jaccard verify stage
(VERDICT r7 item 4: "profile the PPJoin suffix filter on a long-doc
corpus before deciding the verify stage"). Companion to
measure_jaccard_verify.py (which records the candidate→verified funnel
COUNTS); this tool answers one question: does a per-pair suffix-probe
bound ahead of array_intersect pay for itself on ~500-token documents
(generate those with make_longdoc_fixture.py)?

Stages (fresh session, each isolated behind persisted inputs):
  1. index    — shingle-set build (sets + inverted index, persisted)
  2. candidate — prefix-filtered self-join, result PERSISTED so both
                 verify variants below read identical input
  3. verify A — production _verify_pairs (length filter + array_intersect)
  4. verify B — same plus a sound pre-intersect overlap-region bound:
                |A∩B| <= min(|A∩[lo,hi]|, |B∩[lo,hi]|) with
                lo = max(min A, min B), hi = min(max A, max B) over the
                lexicographically sorted shingle arrays — the closest
                Spark-expressible analogue of PPJoin's suffix probe.
                (The REAL Xiao et al. suffix filter needs a sublinear
                per-pair binary search plus the prefix-match positions;
                Spark's array builtins are all O(n) per row and the
                candidate stage drops positions before distinct, so any
                in-engine variant is a linear pre-scan like this one.)

A and B run interleaved `reps` times each off the SAME persisted
candidates; per-variant medians + result counts print as one JSON line.

usage: profile_jaccard_verify.py [sf_dir] [reps]
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mapreduce_4sl08_spark.plans.text import (  # noqa: E402
    _jaccard_candidates, _shingle_sets, _verify_pairs)
from mapreduce_4sl08_spark.session import get_session  # noqa: E402

THRESHOLD = 0.5


def verify_with_suffix_bound(cand, sets, threshold):
    """_verify_pairs plus the overlap-region bound BEFORE the full
    intersect. lo/hi/alpha are staged projections so the higher-order
    filter lambdas reference attributes, not re-evaluated subtrees
    (the r7 _bind_once lesson)."""
    sa = sets.select(F.col("doc_id").alias("doc_a"),
                     F.col("sh_set").alias("set_a"), F.col("n_sh").alias("n_sh_a"))
    sb = sets.select(F.col("doc_id").alias("doc_b"),
                     F.col("sh_set").alias("set_b"), F.col("n_sh").alias("n_sh_b"))
    in_range = lambda col: F.size(F.filter(  # noqa: E731
        col, lambda x: (x >= F.col("lo")) & (x <= F.col("hi"))))
    return (
        cand.join(sa, "doc_a").join(sb, "doc_b")
        .filter(F.least("n_sh_a", "n_sh_b")
                >= F.lit(threshold) * F.greatest("n_sh_a", "n_sh_b"))
        .withColumn("lo", F.greatest(F.element_at("set_a", 1),
                                     F.element_at("set_b", 1)))
        .withColumn("hi", F.least(F.element_at("set_a", -1),
                                  F.element_at("set_b", -1)))
        .withColumn("alpha", F.ceil(F.lit(threshold / (1 + threshold))
                                    * (F.col("n_sh_a") + F.col("n_sh_b"))))
        .filter(F.least(in_range("set_a"), in_range("set_b"))
                >= F.col("alpha"))
        .withColumn("n_common",
                    F.size(F.array_intersect("set_a", "set_b")).cast("long"))
        .withColumn("jaccard", F.round(
            F.col("n_common")
            / (F.col("n_sh_a") + F.col("n_sh_b") - F.col("n_common")), 4))
        .filter(F.col("jaccard") >= threshold)
    )


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    reps = int(args[1]) if len(args) > 1 else 3
    spark = get_session()

    t0 = time.perf_counter()
    sh, sets = _shingle_sets(spark, sf_dir, 3)
    n_docs = sets.count()
    n_index = sh.count()
    t_index = time.perf_counter() - t0

    t0 = time.perf_counter()
    cand, _ = _jaccard_candidates(spark, sf_dir, THRESHOLD)
    cand = cand.persist()
    n_cand = cand.count()
    t_cand = time.perf_counter() - t0

    times = {"base": [], "suffix": []}
    counts = {}
    for _ in range(reps):
        for label, builder in (
                ("base", lambda: _verify_pairs(cand, sets, THRESHOLD)),
                ("suffix", lambda: verify_with_suffix_bound(
                    cand, sets, THRESHOLD))):
            t0 = time.perf_counter()
            counts[label] = builder().count()
            times[label].append(time.perf_counter() - t0)

    assert counts["base"] == counts["suffix"], (
        f"suffix bound changed the result: {counts}")  # soundness check
    print(json.dumps({
        "sf_dir": sf_dir, "reps": reps, "n_docs": n_docs,
        "index_rows": n_index, "candidates": n_cand,
        "verified_pairs": counts["base"],
        "sec_index": round(t_index, 2), "sec_candidates": round(t_cand, 2),
        "sec_verify_base": round(statistics.median(times["base"]), 2),
        "sec_verify_suffix": round(statistics.median(times["suffix"]), 2),
        "verify_base_runs": [round(x, 2) for x in times["base"]],
        "verify_suffix_runs": [round(x, 2) for x in times["suffix"]],
    }))


if __name__ == "__main__":
    main()
