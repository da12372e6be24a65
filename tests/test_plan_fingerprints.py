"""Plan-drift gate for the correctness treadmill (r8).

Every registry query's analyzed-plan fingerprint is snapshotted in
plan_fingerprints.json. A query whose live fingerprint drifts from the
snapshot MUST be in ``registry._ROUND_PRIORITY`` — the driver's next
correctness budget then re-proves it first. This mechanizes the policy
that was violated by hand twice (r6 ADVICE: dedup_minhash_lsh missed
after a shared-helper refactor; r8: minhash + near_dup_containment
missed again after the _verify_pairs rewrite until a manual call-site
audit caught it). Regenerate the snapshot with
``python tools/gen_plan_fingerprints.py`` (it refuses to paper over a
drifted query that is not in the priority tuple).
"""

import importlib.util
import json
import os

import pytest

from mapreduce_4sl08_spark.plans import QUERIES, registry

_HERE = os.path.dirname(os.path.abspath(__file__))
_SNAPSHOT_PATH = os.path.join(_HERE, "plan_fingerprints.json")

_spec = importlib.util.spec_from_file_location(
    "gen_plan_fingerprints",
    os.path.join(os.path.dirname(_HERE), "tools", "gen_plan_fingerprints.py"))
_tool = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_tool)

# loaded once — the snapshot file cannot change mid-run
with open(_SNAPSHOT_PATH) as _f:
    _SNAPSHOT = json.load(_f)


def test_normalize_plan_renumbers_ids_but_not_string_literals():
    """The canonicalizer must renumber expression ids by first
    occurrence while leaving id-LOOKING STRING LITERALS untouched —
    the r15 ritual found the bare #\\d+ regex renumbering the MinHash
    chained-digest literal '#2' (printed unquoted after a comma), so
    whether it collided with a real low id depended on the session's
    global counter, i.e. fingerprints depended on build order."""
    norm = _tool.normalize_plan
    a = "Project [md5(concat(shingle#277, #2)) AS dg2#276]"
    b = "Project [md5(concat(shingle#35, #2)) AS dg2#36]"
    # same tree, different session counters -> identical canonical form
    assert norm(a) == norm(b)
    # the literal survives verbatim; attached ids are renumbered
    assert ", #2)" in norm(a) and "shingle#0" in norm(a)
    # distinct ids keep distinct canonical numbers (no blanking):
    # swapping join sides must NOT normalize to the same form
    assert (norm("Join (a.doc_id#10 < b.doc_id#20)")
            != norm("Join (b.doc_id#10 < a.doc_id#20)"))
    # unaliased-expression ids (after ')') and backtick-quoted names
    # are still renumbered
    assert "#0" in norm("Aggregate [count(1)#5L]")
    assert "#0" in norm("Project [`my col`#7]")
    # ADVICE r15 item 2: extraction-shaped names printed unquoted can
    # end in ']' or '.' — their ids must renumber too, or the
    # fingerprint would carry a raw session-counter number
    assert norm("Project [x[0]#9]") == norm("Project [x[0]#41]")
    assert norm("Project [col.#9]") == norm("Project [col.#41]")
    # while an id-looking literal after '(' stays verbatim
    assert "(#2," in norm("Project [concat(#2, a#7)]")
    # the fan-out's conf-derived partition count is canonicalized (r22:
    # 8-partition test sessions vs default generator sessions made the
    # r21 fan-out queries' fingerprints conf-dependent) — the KEY is
    # still hashed, so a re-keyed fan-out drifts while a resized one
    # does not
    assert (norm("RepartitionByExpression [doc_id#3L], 8")
            == norm("RepartitionByExpression [doc_id#9L], 32"))
    assert (norm("RepartitionByExpression [doc_id#3L], 8")
            != norm("RepartitionByExpression [user_id#3L], 8"))


def test_fingerprint_snapshot_covers_exactly_the_registry():
    assert set(_SNAPSHOT) == set(QUERIES), (
        "plan_fingerprints.json out of sync with the registry — run "
        "python tools/gen_plan_fingerprints.py")


@pytest.fixture(scope="module")
def _swept(spark):
    from tests.parallel_sweep import sweep

    def check(name):
        assert name in _SNAPSHOT, (
            f"{name} has no fingerprint — run "
            f"python tools/gen_plan_fingerprints.py")
        # same sf_dir as the generator BY CONSTRUCTION: paths are
        # embedded in the plan's scan, so a divergence would drift all
        # fingerprints at once
        live = _tool.fingerprint(QUERIES[name].fn(spark, _tool.SF_DIR))
        if live == _SNAPSHOT[name]:
            return
        assert name in registry._ROUND_PRIORITY, (
            f"{name}'s plan changed but it is not in _ROUND_PRIORITY — "
            f"the driver would never re-prove it. Add it to the priority "
            f"tuple in plans/registry.py, then regenerate the snapshot "
            f"with python tools/gen_plan_fingerprints.py")

    return sweep(sorted(QUERIES), check)


@pytest.mark.parametrize("name", sorted(QUERIES), ids=str)
def test_plan_drift_requires_priority_reproof(_swept, name):
    from tests.parallel_sweep import reraise
    reraise(_swept, name)
