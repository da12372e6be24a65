#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is fully executed via a noop sink (sorts/limits included, no
driver materialization beyond what the plan requires)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mapreduce_4sl08_spark.plans import QUERIES  # noqa: E402
from mapreduce_4sl08_spark.session import get_session  # noqa: E402

# Headline set: one per operator family, the shapes that matter at scale.
HEADLINE = [
    "wordcount_documents",        # the reference engine itself
    "q1_pricing_summary",         # scan-bound multi-measure agg
    "q3_shipping_priority",       # selective 3-way join + top-k
    "q5_local_supplier_volume",   # 6-table star join
    "q6_forecast_revenue",        # pushdown scan
    "join_left_order_counts",     # outer join + agg
    "window_topk_orders_per_customer",  # per-group top-k window
    "sort_customers_multi",       # global range sort (TeraSort pattern)
    "events_tumbling_hourly",     # streaming-twin window agg
    "events_sessionize",          # stateful sessionization twin
    "dedup_exact_documents",      # content-hash dedup
    "dedup_ngram_jaccard",        # AllPairs/PPJoin exact-Jaccard near-dup
    "dedup_minhash_lsh",          # MinHash-LSH near-dup (scale path)
    "simhash_dedup",              # banded SimHash near-dup
    "knn_bruteforce_cosine",      # vector similarity
    "multimodal_decode_stub",     # Arrow mapInPandas plumbing
    "events_user_features",       # applyInPandas grouped map
    "pandas_udf_norms",           # Arrow pandas-UDF scalar path
    "q13_order_count_histogram",  # double aggregation
    "dedup_connected_components", # iterative label propagation
]


def run_query(spark, name: str, sf_dir: str) -> float:
    fn = QUERIES[name].fn
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_session("bench")
    # JVM/codegen warm-up so timings measure the plans, not classloading:
    # q6 warms the relational scan/agg path, text_token_stats warms the
    # documents scan + regex codegen, pandas_udf warm-up is covered by
    # the first Arrow query paying its own worker startup (kept visible —
    # that cost is real per-session at any scale)
    run_query(spark, "q6_forecast_revenue", sf_dir)
    run_query(spark, "text_token_stats", sf_dir)

    timings: dict[str, float] = {}
    for name in HEADLINE:
        timings[name] = round(run_query(spark, name, sf_dir), 3)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
