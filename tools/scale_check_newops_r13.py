#!/usr/bin/env python
"""r13 new-ops scale check: Spark-side wall time at 1x/10x/30x with
memos reset per scale (first-invocation semantics)."""
import sys
import time

REPO = __file__.rsplit("/", 2)[0]
sys.path.insert(0, REPO)

from mapreduce_4sl08_spark.session import get_session          # noqa: E402
from mapreduce_4sl08_spark.plans import QUERIES, all_session_memos  # noqa: E402

NEW = ["zipf_rank_frequency", "oov_rate_by_lang", "token_pmi_top_pairs",
       "weighted_median_price_by_nation", "orders_backlog_aging",
       "events_power_users_pareto", "source_dup_quality_audit",
       "lsh_pair_distance_histogram", "ivf_recall_eval",
       "dedup_cross_source_matrix", "event_type_share_drift"]

spark = get_session()
for sf in ("/root/testdata/sf0.1", REPO + "/.benchdata/sf0.1x10",
           REPO + "/.benchdata/sf0.1x30"):
    for m in all_session_memos().values():
        m.clear()
    spark.catalog.clearCache()
    for name in NEW:
        t0 = time.time()
        n = QUERIES[name].fn(spark, sf).count()
        print(f"{sf.split('/')[-1]:10s} {name}: {time.time()-t0:.2f}s"
              f" ({n} rows)", flush=True)
