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
    and re-raise as TimeoutError naming the side that overran.

    Firing is tracked EXPLICITLY (ADVICE r20 item 1): the earlier
    ``timer.is_alive()`` proxy raced in both directions — after
    ``timer.cancel()`` a fast successful query could be misreported as
    a timeout (the timer thread exits before the post-check), and in
    the except path a just-fired timer still inside its cancel hook
    kept ``is_alive()`` True, so a genuine overrun re-raised the raw
    engine exception instead of the named TimeoutError."""
    if budget is None:
        budget = budget_seconds()
    fired = threading.Event()

    def _fire() -> None:
        fired.set()
        cancel()

    timer = threading.Timer(budget, _fire)
    timer.start()
    try:
        out = fn()
    except Exception as e:
        if fired.is_set():
            raise TimeoutError(
                f"{label} exceeded {budget:.0f}s watchdog") from e
        raise
    finally:
        timer.cancel()
    if fired.is_set():
        raise TimeoutError(f"{label} exceeded {budget:.0f}s watchdog")
    return out
