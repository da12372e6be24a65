#!/usr/bin/env python
"""Regenerate OPERATORS.md from the live query registry — the
judge-facing inventory mapping every registry query to its module,
oracle status, and description. Run after adding queries."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_4sl08_spark.plans import QUERIES  # noqa: E402
from mapreduce_4sl08_spark.plans.registry import _load_history  # noqa: E402
from mapreduce_4sl08_spark.plans.registry import _HISTORY_PATH  # noqa: E402


def _last_proven() -> dict:
    """query name -> latest driver round with a triple-green CORRECTNESS
    row (from checked_history.json), so driver-proof staleness is
    visible in-repo (VERDICT r12 item 8)."""
    latest: dict = {}
    for rnd, names in _load_history(_HISTORY_PATH).items():
        for n in names:
            latest[n] = max(latest.get(n, 0), int(rnd))
    return latest


def main() -> None:
    proven = _last_proven()
    lines = [
        "# Operator / query inventory (auto-generated — tools/gen_operators_md.py)",
        "",
        "Every entry is exposed via `__spark_entry__.queries()`; 'oracle' means",
        "the driver hash-compares it against the DuckDB SQL in",
        "`__spark_entry__.oracle_sql()` at sf0.01. 'proven' is the latest",
        "driver round whose CORRECTNESS_r{N}.json recorded the query",
        "triple-green (from plans/checked_history.json; 'never' = not yet",
        "sampled by the driver's ~50-row budget).",
        "",
        f"Total: {len(QUERIES)} queries, "
        f"{sum(1 for s in QUERIES.values() if s.oracle)} oracle-checked, "
        f"{sum(1 for n in QUERIES if n in proven)} driver-proven.",
        "",
        "| query | module | oracle | proven | description |",
        "|---|---|---|---|---|",
    ]
    for name, spec in QUERIES.items():
        module = spec.fn.__module__.rsplit(".", 1)[-1]
        oracle = "yes" if spec.oracle else "rows-only"
        rnd = f"r{proven[name]}" if name in proven else "never"
        lines.append(
            f"| {name} | plans/{module} | {oracle} | {rnd} | {spec.doc} |")
    lines += [
        "",
        "Beyond the registry (library surface, tested in tests/):",
        "",
        "- `streaming/`: watermarked tumbling/sliding/session windows,",
        "  dropDuplicatesWithinWatermark, applyInPandasWithState running stats,",
        "  stream-stream attribution join, foreachBatch idempotent sink",
        "- `operators/skew.py`: salted aggregate / salted join",
        "- `operators/grouped.py`: applyInPandas + partition-grouped mapInPandas",
        "- `operators/chunking.py`: Python UDTF text chunking",
        "- `operators/multimodal.py`: binary payload decode / frame sampling",
        "- `operators/sampling.py`: stratified sampling, unique/consecutive row ids",
        "- `sources/bucketing.py`: bucketed writes + shuffle-free joins",
        "- `sources/compaction.py`: small-file compaction to target file size",
        "- `sources/io.py`: parquet/csv/json/text/orc read-write, partitioned sinks",
    ]
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "OPERATORS.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}: {len(QUERIES)} queries")


if __name__ == "__main__":
    main()
