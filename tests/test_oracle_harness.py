"""Self-tests for the oracle comparison harness: it must be exactly as
strict as the driver's schema/hash check. Round-2 post-mortem: the
harness tz-normalized timestamps, so a DuckDB TIMESTAMPTZ oracle passed
locally while the driver failed it (events_sliding_windows). These
fixtures pin the driver-strict behavior.
"""

import pandas as pd
import pytest

from .oracle import _dtype_key, compare_frames


def _naive_frame():
    return pd.DataFrame({
        "ts": pd.to_datetime(["2024-01-01 00:00:00", "2024-01-01 01:00:00"]),
        "n": pd.array([1, 2], dtype="int64"),
    })


def _aware_frame():
    return pd.DataFrame({
        "ts": pd.to_datetime(
            ["2024-01-01 00:00:00", "2024-01-01 01:00:00"]).tz_localize("UTC"),
        "n": pd.array([1, 2], dtype="int64"),
    })


def test_tz_aware_vs_naive_fails():
    """A tz-aware oracle column vs a naive Spark column must FAIL, even
    when the instants are identical — this is what the driver checks."""
    with pytest.raises(AssertionError, match="dtype mismatch"):
        compare_frames(_naive_frame(), _aware_frame(), "tz_fixture")


def test_same_tzness_passes():
    compare_frames(_naive_frame(), _naive_frame(), "naive_fixture")
    compare_frames(_aware_frame(), _aware_frame(), "aware_fixture")


def test_dtype_key_distinguishes_tz():
    naive = _naive_frame()["ts"].dtype
    aware = _aware_frame()["ts"].dtype
    assert _dtype_key(naive) == "timestamp"
    assert _dtype_key(aware) != _dtype_key(naive)


def test_int_width_still_caught():
    a = pd.DataFrame({"n": pd.array([1], dtype="int32")})
    b = pd.DataFrame({"n": pd.array([1], dtype="int64")})
    with pytest.raises(AssertionError, match="dtype mismatch"):
        compare_frames(a, b, "width_fixture")
