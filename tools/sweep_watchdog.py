"""Per-query wall-clock watchdog shared by the sweep harnesses (r20).

The first full-registry sweep at the 10x fixture STALLED: DuckDB
re-executed an inlined CTE per unrolled pagerank iteration — >9 min for
one oracle with no output — and the stall was only diagnosed by hand
(ps + per-side reproduction). Each engine side now runs under a budget
($SWEEP_QUERY_TIMEOUT seconds, default 600): an overrun fires the
side's cancel hook (duckdb ``connection.interrupt`` / Spark
``cancelJobGroup``) so the in-flight work raises promptly, and the
query FAILS by name with the side that overran — one red line instead
of a lost round.
"""
from __future__ import annotations

import os
import threading
from collections.abc import Callable


def budget_seconds() -> float:
    return float(os.environ.get("SWEEP_QUERY_TIMEOUT", "600"))


def timeboxed(label: str, fn: Callable, cancel: Callable[[], object],
              budget: float | None = None):
    """Run fn() under the wall-clock budget; on overrun fire cancel()
    and re-raise as TimeoutError naming the side that overran. A
    completion that races the timer within the same instant is
    reported as a timeout — acceptable at a 600 s budget (the signal
    is "this side is at the watchdog boundary" either way)."""
    if budget is None:
        budget = budget_seconds()
    timer = threading.Timer(budget, cancel)
    timer.start()
    try:
        out = fn()
    except Exception as e:
        if not timer.is_alive():
            raise TimeoutError(
                f"{label} exceeded {budget:.0f}s watchdog") from e
        raise
    finally:
        timer.cancel()
    if not timer.is_alive():
        raise TimeoutError(f"{label} exceeded {budget:.0f}s watchdog")
    return out
