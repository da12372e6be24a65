"""Golden outputs (SURVEY §5.2.3): canonical result hashes at sf0.001,
frozen after oracle verification. Catches any silent semantic drift the
per-query oracle tests might share (e.g. a harness change)."""

import hashlib
import json
import os

import pytest

from mapreduce_4sl08_spark.plans import QUERIES

from .oracle import canonicalize

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden_hashes.json")
with open(GOLDEN_PATH) as f:
    GOLDEN = json.load(f)


@pytest.mark.parametrize("name", sorted(GOLDEN), ids=str)
def test_golden_hash(spark, sf_smoke_dir, name):
    pdf = QUERIES[name].fn(spark, sf_smoke_dir).toPandas()
    assert len(pdf) == GOLDEN[name]["rows"], f"{name}: row count drifted"
    h = hashlib.sha256(repr(canonicalize(pdf)).encode()).hexdigest()
    assert h == GOLDEN[name]["sha256"], f"{name}: result hash drifted"
