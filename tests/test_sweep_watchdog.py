"""Unit pins for the sweep watchdog (tools/sweep_watchdog, r20): the
harness guard that turns a super-linear plan/oracle into a named FAIL
line instead of a stalled round. No Spark/DuckDB here — the engine
cancel hooks were probed live (duckdb InterruptException + connection
reuse; Spark cancelJobGroup) when the watchdog shipped; these pins keep
the control flow honest."""
import threading
import time

import pytest

from tools.sweep_watchdog import budget_seconds, timeboxed


def test_fast_fn_passes_through_result():
    assert timeboxed("x", lambda: 42, lambda: None, budget=5.0) == 42


def test_overrun_fires_cancel_and_raises_named_timeout():
    cancelled = threading.Event()

    def slow():
        # simulates an engine call that only returns once cancelled
        cancelled.wait(timeout=10)
        raise RuntimeError("engine interrupted")  # what a cancel causes

    with pytest.raises(TimeoutError, match=r"myq \(oracle\) exceeded 0s"):
        timeboxed("myq (oracle)", slow, cancelled.set, budget=0.2)
    assert cancelled.is_set()


def test_overrun_timeout_raised_even_if_fn_returns():
    # an engine whose cancel hook doesn't make the call raise (it just
    # finishes late) must STILL be reported as a watchdog overrun
    with pytest.raises(TimeoutError, match="exceeded"):
        timeboxed("late", lambda: time.sleep(0.4) or 1,
                  lambda: None, budget=0.1)


def test_non_timeout_error_propagates_unwrapped():
    with pytest.raises(ValueError, match="real bug"):
        timeboxed("x", lambda: (_ for _ in ()).throw(ValueError("real bug")),
                  lambda: None, budget=5.0)


def test_budget_env_default(monkeypatch):
    monkeypatch.delenv("SWEEP_QUERY_TIMEOUT", raising=False)
    assert budget_seconds() == 600.0
    monkeypatch.setenv("SWEEP_QUERY_TIMEOUT", "42.5")
    assert budget_seconds() == 42.5
