#!/usr/bin/env python
"""Regenerate PLANS.md: formatted physical plans of the headline queries
at sf0.01 — the .explain('formatted') evidence for pushdown, pruning,
broadcast selection, partial aggregation, and top-k pushdown."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_4sl08_spark.plans import QUERIES  # noqa: E402
from mapreduce_4sl08_spark.session import get_session  # noqa: E402

SHOWN = [
    "wordcount_documents",
    "q1_pricing_summary",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "topk_expensive_orders",
    "window_topk_orders_per_customer",
    "dedup_ngram_jaccard",
    "knn_bruteforce_cosine",
    "lateral_topk_orders",
    "sequence_packing_bins",
    "span_dedup_report",
    "embedding_quantization",
]

BLURBS = {
    "wordcount_documents": "The whole reference engine: note `partial_count` "
        "(the map-side combine the reference lacked), one hash exchange for the "
        "agg, one range exchange for the total-order sort, and a scan reading "
        "ONLY the text column.",
    "q1_pricing_summary": "Scan-bound agg: shipdate predicate pushed to parquet, "
        "4-column ReadSchema, two-phase aggregation.",
    "q5_local_supplier_volume": "6-table star join: dims broadcast, fact side "
        "never re-shuffled for them.",
    "q6_forecast_revenue": "All four predicates in PushedFilters; single "
        "partial/final agg pair.",
    "topk_expensive_orders": "Global top-k = TakeOrderedAndProject: per-partition "
        "heaps + driver merge, NO range-sort shuffle.",
    "window_topk_orders_per_customer": "Per-group top-k: WindowGroupLimit "
        "partial (before shuffle) + final — only ≤k rows per group ever shuffle.",
    "dedup_ngram_jaccard": "Prefix-filtered set-similarity join: the inverted "
        "index is built on each doc's rarest shingles only; verification is an "
        "array_intersect over candidate pairs.",
    "knn_bruteforce_cosine": "Probe side broadcast (BroadcastNestedLoopJoin); "
        "cosine arithmetic entirely in JVM expressions.",
    "lateral_topk_orders": "LATERAL correlated LIMIT decorrelated by Catalyst: "
        "WindowGroupLimit (partial before the shuffle) + equi-join — never a "
        "per-outer-row subquery execution.",
    "sequence_packing_bins": "Distributed two-pass prefix sum: within-shard "
        "running sums per (lang, shard) window in parallel, shard offsets from "
        "the tiny totals table, joined back — no single-task-per-language window.",
    "span_dedup_report": "C4-style span dedup: explode full 10-token spans, one "
        "hash-shuffle aggregation with map-side partials on the span hash.",
    "embedding_quantization": "SQ8: per-dimension min/max stats collapse to one "
        "row, broadcast to the encode pass (BroadcastNestedLoopJoin against 1 "
        "row is the intended scalar-broadcast shape); codes verified via "
        "exact-integer checksums.",
}


def main() -> None:
    spark = get_session("plans", extra_conf={"spark.ui.enabled": "false"})
    sf_dir = "/root/testdata/sf0.01"
    out = ["# Physical plans (auto-generated — tools/gen_plans_md.py, sf0.01)", ""]
    for name in SHOWN:
        df = QUERIES[name].fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        out += [f"## {name}", "", BLURBS.get(name, ""), "", "```", plan.strip(), "```", ""]
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "PLANS.md")
    with open(path, "w") as f:
        f.write("\n".join(out))
    print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
