"""Compaction, sampling, row ids, foreachBatch sink."""

import glob

from pyspark.sql import functions as F

from mapreduce_4sl08_spark.operators.sampling import (
    stratified_sample, with_consecutive_ids, with_row_ids)
from mapreduce_4sl08_spark.sources import load_table
from mapreduce_4sl08_spark.sources.compaction import compact


def test_compact_reduces_files(spark, sf_smoke_dir, tmp_path):
    src = str(tmp_path / "fragmented")
    load_table(spark, sf_smoke_dir, "lineitem").repartition(64).write.parquet(src)
    assert len(glob.glob(f"{src}/part-*")) == 64
    dst = str(tmp_path / "compacted")
    n = compact(spark, src, dst, target_file_bytes=8 * 1024 * 1024)
    files = glob.glob(f"{dst}/part-*")
    assert len(files) == n <= 4
    assert spark.read.parquet(dst).count() == spark.read.parquet(src).count()


def test_stratified_sample_fractions(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    fractions = {"click": 0.5, "view": 0.1, "purchase": 1.0, "signup": 0.0, "error": 0.0}
    s = stratified_sample(e, "event_type", fractions)
    got = {r.event_type: r.n for r in
           s.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()}
    base = {r.event_type: r.n for r in
            e.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got.get("signup", 0) == 0 and got.get("error", 0) == 0
    assert got["purchase"] == base["purchase"]          # fraction 1.0 = all
    assert abs(got["click"] / base["click"] - 0.5) < 0.1
    assert abs(got["view"] / base["view"] - 0.1) < 0.05
    # seed determinism
    s2 = stratified_sample(e, "event_type", fractions)
    assert s.count() == s2.count()


def test_row_ids_unique_and_consecutive(spark, sf_smoke_dir):
    c = load_table(spark, sf_smoke_dir, "customer")
    ids = with_row_ids(c).select("row_id").collect()
    assert len({r.row_id for r in ids}) == len(ids)
    cons = with_consecutive_ids(c, ["c_custkey"]).select("row_id", "c_custkey").collect()
    assert sorted(r.row_id for r in cons) == list(range(len(cons)))
    # order follows the requested key
    by_key = sorted(cons, key=lambda r: r.c_custkey)
    assert [r.row_id for r in by_key] == list(range(len(cons)))


def test_foreach_batch_sink(spark, sf_smoke_dir, tmp_path):
    from mapreduce_4sl08_spark.streaming import events_stream
    from mapreduce_4sl08_spark.streaming.sinks import partitioned_batch_sink

    src = str(tmp_path / "src")
    load_table(spark, sf_smoke_dir, "events").repartition(3).write.parquet(src)
    out = str(tmp_path / "sink")
    q = partitioned_batch_sink(
        events_stream(spark, src, max_files_per_trigger=1), out)
    q.awaitTermination()
    back = spark.read.parquet(out)
    assert back.count() == 1000  # sf0.001 events
    assert back.select("event_id").distinct().count() == 1000
    # one directory per micro-batch
    assert len(glob.glob(f"{out}/batch_id=*")) >= 3


def test_merge_upsert(spark):
    """CDC apply: updates replace, inserts add, deletes remove, stale
    changes (older version) lose to base."""
    from pyspark.sql import Row
    from mapreduce_4sl08_spark.operators.merge import merge_upsert

    base = spark.createDataFrame([
        Row(id=1, v=1, payload="a"),
        Row(id=2, v=5, payload="b"),
        Row(id=3, v=1, payload="c"),
    ])
    changes = spark.createDataFrame([
        Row(id=2, v=6, payload="b2", op="U"),   # newer update wins
        Row(id=3, v=2, payload="tomb", op="D"), # delete
        Row(id=4, v=1, payload="d", op="U"),    # insert
        Row(id=1, v=0, payload="stale", op="U"),  # older than base -> loses
    ])
    out = {r.id: (r.v, r.payload)
           for r in merge_upsert(base, changes, "id", "v").collect()}
    assert out == {1: (1, "a"), 2: (6, "b2"), 4: (1, "d")}
