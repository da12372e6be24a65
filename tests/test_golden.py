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


# ------------------------------------------------------- unicode goldens
# VERDICT r16 item 7: the unicode sweep proves cross-engine EQUALITY,
# but equality can drift in lockstep (both engines changed the same
# way). These goldens freeze the ABSOLUTE tokenizer-contract outputs —
# ASCII-\s+ split, ASCII-space trim/strip, NBSP/ZWSP/CJK/emoji kept
# inside tokens — on a corpus with exactly the codepoint classes the
# r16/r17 contract work pinned down. FROZEN list, deliberately
# independent of tests/test_unicode_text.STRESS (which may grow):
# regenerating these hashes is an intentional semantics change.

UNI_GOLDEN_DOCS = (
    "Café naïve résumé über niño",
    "日本語 テスト 中文 文本",
    "emoji \U0001F600 mixed tóken\U0001F600tail",
    "zero​width and\xa0nbsp spaced",
    "\xa0leading nbsp boundary token\n",
    "\xa0 nbsp-space mixed lead",
)

UNI_GOLDEN_PATH = os.path.join(os.path.dirname(__file__),
                               "golden_hashes_unicode.json")
with open(UNI_GOLDEN_PATH) as f:
    UNI_GOLDEN = json.load(f)


@pytest.fixture(scope="module")
def sfuni_golden_dir(tmp_path_factory, sf_smoke_dir):
    import pyarrow as pa
    import pyarrow.parquet as pq
    out = tmp_path_factory.mktemp("sfuni_golden")
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        tab = pq.read_table(os.path.join(sf_smoke_dir, f"{t}.parquet"))
        if t == "documents":
            d = tab.to_pydict()
            for i, s in enumerate(UNI_GOLDEN_DOCS):
                d["text"][i] = s
                if "n_chars" in d:
                    d["n_chars"][i] = len(s)
            tab = pa.table(d, schema=tab.schema)
        pq.write_table(tab, os.path.join(str(out), f"{t}.parquet"))
    return str(out)


@pytest.mark.parametrize("name", sorted(UNI_GOLDEN), ids=str)
def test_unicode_golden_hash(spark, sfuni_golden_dir, name):
    pdf = QUERIES[name].fn(spark, sfuni_golden_dir).toPandas()
    assert len(pdf) == UNI_GOLDEN[name]["rows"], f"{name}: row count drifted"
    h = hashlib.sha256(repr(canonicalize(pdf)).encode()).hexdigest()
    assert h == UNI_GOLDEN[name]["sha256"], f"{name}: result hash drifted"
