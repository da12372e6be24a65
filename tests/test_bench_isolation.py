"""bench.py per-query fault isolation (VERDICT r8 item 3): the round-8
driver bench crashed wholesale because one query raised at plan time and
the suite loop was all-or-nothing — no perf number was recorded for the
round at all. run_suite must instead record the failing query under
``errors`` and still time every other query."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402


def test_broken_query_isolated(spark):
    names = ["a", "b", "broken", "c"]

    def runner(spark_, name, sf_dir):
        if name == "broken":
            raise RuntimeError("deliberately broken\nsecond line hidden")
        return 0.5

    samples, errors = bench.run_suite(
        spark, names, "/unused", n_runs=3, runner=runner)

    assert set(errors) == {"broken"}
    assert errors["broken"].startswith("RuntimeError: deliberately broken")
    assert "second line" not in errors["broken"]  # first line only
    assert samples["broken"] == []
    for name in ("a", "b", "c"):
        assert samples[name] == [0.5, 0.5, 0.5]


def test_late_error_still_reported_as_error_only(spark):
    """A query that succeeds on pass 1 and errors on pass 2 must land
    under errors, keep its pass-1 sample out of the medians (main()
    skips names in errors), and not be retried on pass 3."""
    calls = {"flaky": 0}

    def runner(spark_, name, sf_dir):
        if name == "flaky":
            calls["flaky"] += 1
            if calls["flaky"] == 2:
                raise ValueError("broke on pass 2")
        return 1.0

    samples, errors = bench.run_suite(
        spark, ["ok", "flaky"], "/unused", n_runs=3, runner=runner)
    assert set(errors) == {"flaky"}
    assert calls["flaky"] == 2          # skipped on pass 3
    assert samples["flaky"] == [1.0]    # pass-1 sample retained in raw
    assert samples["ok"] == [1.0, 1.0, 1.0]


def test_all_green_suite_has_no_errors(spark):
    samples, errors = bench.run_suite(
        spark, ["x"], "/unused", n_runs=2,
        runner=lambda *_: 1.0)
    assert errors == {}
    assert samples == {"x": [1.0, 1.0]}
