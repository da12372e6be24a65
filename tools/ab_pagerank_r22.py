#!/usr/bin/env python
"""Interleaved A/B of pagerank's mid-loop checkpoint strategy
(VERDICT r21 items 4+5: the r21 lazy-chain claim was never timed, and
superseded checkpoints were never freed).

  arm lazy  — r21 shape: truncate_lineage(eager=False) mid-loop, every
              checkpoint materializes inside the caller's first action
              and ALL of them stay resident (pinned by RDD lineage).
  arm eager — r22 shape: truncate_lineage(eager=True) mid-loop + free
              the superseded checkpoint once the new one materializes
              (resident rank tables stay O(1) in iteration count).

Both arms run the full graph_pagerank_purchases plan end to end
(purchase-graph build + 10 iterations + top-50) via the noop sink, on
memo-cleared sessions, alternating order each rep. Also reports the
number of persistent RDDs left behind by one run of each arm — the
residency claim, checked not asserted.

usage: ab_pagerank_r22.py [sf_dir] [--reps N]
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mapreduce_4sl08_spark.operators import graph  # noqa: E402
from mapreduce_4sl08_spark.plans.registry import all_session_memos  # noqa: E402
from mapreduce_4sl08_spark.session import (  # noqa: E402
    free_checkpoint, get_session, truncate_lineage)


def pagerank_lazy(edges, iterations=10, damping=0.85):
    """The r21 loop, verbatim (lazy chain, no free)."""
    nodes = truncate_lineage(
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct())
    n_nodes = nodes.count()
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    links = truncate_lineage(edges.join(outdeg, "src"), eager=False)
    ranks = nodes.withColumn("rank", F.lit(1.0 / n_nodes))
    for i in range(iterations):
        contribs = (
            links.join(ranks, links.src == ranks.node)
            .select("dst", (F.col("rank") / F.col("outdeg")).alias("contrib"))
            .groupBy("dst").agg(F.sum("contrib").alias("in_mass")))
        ranks = (
            nodes.join(contribs, nodes.node == contribs.dst, "left")
            .select("node", (F.lit((1.0 - damping) / n_nodes)
                             + F.lit(damping)
                             * F.coalesce("in_mass", F.lit(0.0))).alias("rank")))
        if (i + 1) % graph._CKPT_EVERY == 0 and i < iterations - 1:
            ranks = truncate_lineage(ranks, eager=False)
    return ranks


def main() -> None:
    argv = sys.argv[1:]
    reps = 5
    if "--reps" in argv:
        i = argv.index("--reps")
        reps = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.1"
    spark = get_session("ab-pagerank-r22")
    sc = spark.sparkContext

    def n_persistent() -> int:
        jmap = sc._jsc.sc().getPersistentRDDs()
        it, n = jmap.iterator(), 0
        while it.hasNext():
            it.next()
            n += 1
        return n

    from mapreduce_4sl08_spark.plans.base import t
    from mapreduce_4sl08_spark.operators.graph import pagerank, purchase_graph

    def run(variant) -> tuple[float, int]:
        for memo in all_session_memos().values():
            memo.clear()
        spark.catalog.clearCache()
        base_rdds = n_persistent()
        t0 = time.perf_counter()
        edges = purchase_graph(
            t(spark, sf_dir, "lineitem"), t(spark, sf_dir, "orders"))
        ranks = variant(edges, iterations=10)
        (ranks.select("node", F.round("rank", 8).alias("rank"))
         .orderBy(F.col("rank").desc(), F.col("node").asc()).limit(50)
         .write.mode("overwrite").format("noop").save())
        dt = time.perf_counter() - t0
        return dt, n_persistent() - base_rdds

    arms = {"eager_free": graph.pagerank, "lazy": pagerank_lazy}
    # value identity between arms, once
    vals = {}
    for k, v in arms.items():
        for memo in all_session_memos().values():
            memo.clear()
        spark.catalog.clearCache()
        edges = purchase_graph(
            t(spark, sf_dir, "lineitem"), t(spark, sf_dir, "orders"))
        vals[k] = sorted(map(tuple, v(edges, iterations=10)
                             .select("node", F.round("rank", 8)).collect()))
    assert vals["eager_free"] == vals["lazy"], "ARMS DISAGREE"

    times = {k: [] for k in arms}
    resid = {k: [] for k in arms}
    order = list(arms)
    for rep in range(reps):
        for k in (order if rep % 2 == 0 else order[::-1]):
            sc.setJobDescription(f"pagerank:{k}:rep{rep}")
            dt, nr = run(arms[k])
            times[k].append(dt)
            resid[k].append(nr)
    print(json.dumps({
        "sf_dir": sf_dir, "reps": reps,
        **{f"{k}_median": round(statistics.median(v), 3) for k, v in times.items()},
        **{f"{k}_all": [round(x, 3) for x in v] for k, v in times.items()},
        **{f"{k}_resident_rdds": resid[k] for k in arms},
    }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
