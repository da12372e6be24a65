"""Focused gates for the r21 optimization-round internals:

1. the post-scan fan-out (sources/tables.py): fires only where enabled
   AND where the size gate says a single-split scan would starve the
   cores; off-switch honored; results identical either way;
2. the simhash packed-counter aggregation (plans/extended.py): the
   32-accumulator form must equal the definitional 64-sum form bit for
   bit, including the 2·cnt == n tie (old form SUM(±1) == 0 → bit SET);
3. lazy lineage truncation (session.truncate_lineage(eager=False)):
   plan lineage is cut at wrap time, values unchanged.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mapreduce_4sl08_spark.sources.tables import (
    _FANOUT_KEYS, _scan_fanout_n, load_table,
)


def test_fanout_defaults_off_and_opt_in_fires(spark, sf_dir):
    """Default load is untouched; fanout=True adds the keyed exchange
    only when the size gate passes (documents at the test fixture is
    above the 32 KB floor)."""
    plain = load_table(spark, sf_dir, "documents")
    assert "REPARTITION_BY_NUM" not in plain._jdf.queryExecution() \
        .executedPlan().toString()
    fanned = load_table(spark, sf_dir, "documents", fanout=True)
    path = os.path.join(sf_dir, "documents.parquet")
    expect = _scan_fanout_n(spark, path)
    plan = fanned._jdf.queryExecution().executedPlan().toString()
    if expect:
        assert "REPARTITION_BY_NUM" in plan
        assert fanned.rdd.getNumPartitions() == expect
    else:  # tiny fixture below the floor: fanout must be a no-op
        assert "REPARTITION_BY_NUM" not in plan
    # values identical either way (hash exchange only moves rows)
    a = sorted(map(tuple, plain.select("doc_id").collect()))
    b = sorted(map(tuple, fanned.select("doc_id").collect()))
    assert a == b


def test_fanout_env_off_switch(spark, sf_dir, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SCAN_FANOUT", "off")
    df = load_table(spark, sf_dir, "documents", fanout=True)
    assert "REPARTITION_BY_NUM" not in df._jdf.queryExecution() \
        .executedPlan().toString()


def test_fanout_keys_exist_in_schemas(spark, sf_dir):
    """Every fan-out key must be a live column of its table (a renamed
    column would silently disable the fan-out via the df.columns
    guard — make that loud here instead)."""
    for name, key in _FANOUT_KEYS.items():
        assert key in load_table(spark, sf_dir, name).columns, (name, key)


def test_simhash_packed_counters_equal_definitional_sums(spark):
    """Bit-for-bit equivalence of the r21 packed-counter fingerprint
    against the definitional SUM(±1) form, on a corpus engineered to
    hit the tie: with an EVEN number of tokens where exactly half have
    bit b set, SUM(±1) == 0 (bit set, >= 0) and 2·cnt == n (bit set) —
    both forms must agree there and everywhere else."""
    import mapreduce_4sl08_spark.plans.extended as X

    rows = [
        (1, "alpha beta gamma delta"),          # even count
        (2, "alpha alpha alpha"),                # dup tokens (distinct=1)
        (3, "x"),                                # single token
        (4, "the quick brown fox jumps over"),   # 6 tokens
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    toks = docs.select(
        "doc_id",
        F.explode(F.array_distinct(
            F.split(F.trim(F.lower("text")), r"\s+"))).alias("token"),
    ).filter(F.col("token") != "")
    hashed_toks = (
        toks.withColumn("m", F.md5(F.col("token")))
        .select(
            "doc_id",
            F.conv(F.substring("m", 1, 8), 16, 10).cast("long").alias("h_hi"),
            F.conv(F.substring("m", 9, 8), 16, 10).cast("long").alias("h_lo"),
        ))

    bits = X._SIMHASH_HALF_BITS
    # definitional form (the pre-r21 shape, kept verbatim here as the
    # reference): 64 SUM(±1) buffers then per-bit CASE reconstruction
    ref = hashed_toks.groupBy("doc_id").agg(
        *[F.expr(f"sum(((h_{h} >> {b}) & 1) * 2 - 1)").alias(f"s_{h}_{b}")
          for h in ("hi", "lo") for b in range(bits)])
    ref = ref.select("doc_id", *[
        F.expr("CAST(" + " + ".join(
            f"(CASE WHEN s_{h}_{b} >= 0 THEN {1 << b} ELSE 0 END)"
            for b in range(bits)) + " AS BIGINT)").alias(f"sim_{h}")
        for h in ("hi", "lo")])

    # packed form, exactly as simhash_dedup builds it
    sim = hashed_toks.groupBy("doc_id").agg(
        *[F.expr(f"sum(((h_hi >> {b}) & 1) + (((h_lo >> {b}) & 1) << 32))")
          .alias(f"acc_{b}") for b in range(bits)],
        F.count(F.lit(1)).alias("n_toks"))
    cnt = {"hi": lambda b: f"(acc_{b} & 4294967295)",
           "lo": lambda b: f"(acc_{b} >> 32)"}
    packed = sim.select("doc_id", *[
        F.expr("CAST(" + " + ".join(
            f"(CASE WHEN 2 * {cnt[h](b)} >= n_toks THEN {1 << b} ELSE 0 END)"
            for b in range(bits)) + " AS BIGINT)").alias(f"sim_{h}")
        for h in ("hi", "lo")])

    want = sorted(map(tuple, ref.collect()))
    got = sorted(map(tuple, packed.collect()))
    assert got == want
    # and at least one tie actually occurred, or the test proves less
    # than it claims: doc 1 has 4 distinct tokens — with md5 bits
    # ~uniform, P(no 2-2 split across 64 bits) ≈ (5/8)^64 ≈ 1e-13
    ties = hashed_toks.groupBy("doc_id").agg(
        *[F.expr(f"sum(((h_hi >> {b}) & 1) * 2 - 1)").alias(f"t{b}")
          for b in range(bits)])
    tie_rows = ties.filter(
        " OR ".join(f"t{b} = 0" for b in range(bits))).count()
    assert tie_rows > 0, "corpus produced no SUM(±1)==0 tie to exercise"


def test_lazy_truncate_lineage_cuts_plan_and_keeps_values(spark):
    from mapreduce_4sl08_spark.session import truncate_lineage

    df = spark.range(100).withColumn("v", F.col("id") * 2)
    cut = truncate_lineage(df, eager=False)
    # lineage cut at wrap time: the logical plan is an RDD scan, not
    # the original Range->Project tree
    assert "LogicalRDD" in cut._jdf.queryExecution().logical().toString()
    # the convergence-check pattern: the first action both materializes
    # the checkpoint and computes the aggregate
    assert cut.agg(F.sum("v")).collect()[0][0] == 9900
    assert sorted(map(tuple, cut.collect())) == \
        sorted(map(tuple, df.collect()))
