"""End-of-round ritual, automated: merge a driver CORRECTNESS_r{N}.json
into plans/checked_history.json (the registry's LRU-rotation record).

Only TRIPLE-GREEN rows (rows_match + schema_match + hash_match, no err)
are recorded — a red or errored row must stay stale so the next round's
budget re-proves it. Idempotent: re-running on an already-merged round
is a no-op, and an existing round key is extended, never truncated.

    python tools/update_checked_history.py CORRECTNESS_r08.json 8
    python tools/update_checked_history.py CORRECTNESS_r07.json 7 --dry-run
"""
from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HISTORY = os.path.join(
    REPO, "mapreduce_4sl08_spark", "plans", "checked_history.json")


def split_green(rows: dict) -> tuple[list[str], list[str]]:
    """(triple-green names, everything else) from a CORRECTNESS dict."""
    green = sorted(
        name for name, r in rows.items()
        if r.get("rows_match") and r.get("schema_match")
        and r.get("hash_match") and not r.get("err"))
    return green, sorted(set(rows) - set(green))


def merge_round(hist: dict, round_no: int, green: list[str]) -> dict:
    """Pure merge: extend (never truncate) the round's name list, keep
    round keys numerically sorted. Returns a new dict."""
    key = str(round_no)
    out = dict(hist)
    out[key] = sorted(set(out.get(key, [])) | set(green))
    return dict(sorted(out.items(), key=lambda kv: int(kv[0])))


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--dry-run"]
    dry = "--dry-run" in sys.argv[1:]
    if len(args) != 2 or not args[1].lstrip("-").isdigit():
        sys.exit(f"usage: {sys.argv[0]} CORRECTNESS_rN.json N [--dry-run]")
    correctness_path, round_no = args[0], int(args[1])
    if round_no < 1:
        sys.exit(f"round must be >= 1, got {round_no}")

    with open(correctness_path) as f:
        green, red = split_green(json.load(f))
    if red:
        print(f"NOT recording {len(red)} non-green rows: {red}")

    with open(HISTORY) as f:
        prior = json.load(f)
    hist = merge_round(prior, round_no, green)
    merged = hist[str(round_no)]
    before = set(prior.get(str(round_no), []))

    sys.path.insert(0, REPO)
    from mapreduce_4sl08_spark.plans import registry
    unknown = set(merged) - set(registry.QUERIES)
    if unknown:
        sys.exit(f"refusing to record unknown query names: {sorted(unknown)}")

    added = len(set(merged) - before)
    print(f"round {round_no}: {len(before)} -> {len(merged)} names "
          f"(+{added} new, {len(green)} green in {correctness_path})")
    if dry:
        print("dry run — history not written")
        return
    with open(HISTORY, "w") as f:
        json.dump(hist, f, indent=1)
        f.write("\n")
    print(f"wrote {HISTORY}")


if __name__ == "__main__":
    main()
