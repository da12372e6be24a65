#!/usr/bin/env python
"""Capture .explain("formatted") for headline (or named) queries into
plans/<tag>/<query>_<suffix>.txt — the optimization-round evidence
artifact (judge checks plan claims against these files).

Usage: python tools/capture_plans.py <tag> <suffix> [query ...]
e.g.   python tools/capture_plans.py r21 before
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from mapreduce_4sl08_spark.plans import QUERIES, all_session_memos  # noqa: E402
from mapreduce_4sl08_spark.session import get_session  # noqa: E402


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_session("capture_plans")
    for name in names:
        # fresh memos per query: a memo hit would capture the cached-read
        # plan (InMemoryTableScan stub) instead of the real pipeline
        for memo in all_session_memos().values():
            memo.clear()
        spark.catalog.clearCache()
        df = QUERIES[name].fn(spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt.splitlines())} lines)")
    spark.stop()


if __name__ == "__main__":
    main()
