"""Source/sink coverage (reference S1/S2 + K1/K2 generalized): format
round-trips, partitioned writes, single-file gather mode."""

from pyspark.sql import functions as F

from mapreduce_4sl08_spark.sources import load_table, read_any, write_any


def _nation(spark, sf_smoke_dir):
    return load_table(spark, sf_smoke_dir, "nation")


def test_parquet_roundtrip(spark, sf_smoke_dir, tmp_path):
    df = _nation(spark, sf_smoke_dir)
    write_any(df, "parquet", str(tmp_path / "p"))
    back = read_any(spark, "parquet", str(tmp_path / "p"))
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_csv_roundtrip_with_schema(spark, sf_smoke_dir, tmp_path):
    df = _nation(spark, sf_smoke_dir)
    write_any(df, "csv", str(tmp_path / "c"))
    back = read_any(spark, "csv", str(tmp_path / "c"), schema=df.schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_json_roundtrip(spark, sf_smoke_dir, tmp_path):
    df = _nation(spark, sf_smoke_dir)
    write_any(df, "json", str(tmp_path / "j"))
    back = read_any(spark, "json", str(tmp_path / "j"), schema=df.schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_partitioned_write_prunes(spark, sf_smoke_dir, tmp_path):
    """Partitioned parquet sink + partition-pruned scan — the 100 TB sink
    shape. The pruned plan must read only the selected partition."""
    orders = load_table(spark, sf_smoke_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate"))
    write_any(orders, "parquet", str(tmp_path / "part"), partition_by=["o_year"])
    back = read_any(spark, "parquet", str(tmp_path / "part"))
    one_year = back.filter(F.col("o_year") == 1997)
    want = orders.filter(F.col("o_year") == 1997).count()
    assert one_year.count() == want
    # partition pruning visible in the physical plan
    plan = one_year._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(o_year" in plan, plan[:500]


def test_single_file_mode(spark, sf_smoke_dir, tmp_path):
    """K2 EXPLICIT-mode equivalent: one output file via coalesce(1)."""
    df = _nation(spark, sf_smoke_dir)
    write_any(df, "csv", str(tmp_path / "single"), single_file=True)
    import glob
    files = glob.glob(str(tmp_path / "single" / "part-*"))
    assert len(files) == 1


def test_text_source(spark, tmp_path):
    p = tmp_path / "t.txt"
    p.write_text("alpha beta\ngamma\n", encoding="utf-8")
    df = read_any(spark, "text", str(p))
    assert [r.value for r in df.collect()] == ["alpha beta", "gamma"]


def test_orc_roundtrip(spark, sf_smoke_dir, tmp_path):
    df = _nation(spark, sf_smoke_dir)
    write_any(df, "orc", str(tmp_path / "o"))
    back = read_any(spark, "orc", str(tmp_path / "o"))
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_schema_evolution_mergeschema(spark, tmp_path):
    """Schema evolution across parquet files: mergeSchema unions the
    columns (new columns null for old files) — the long-lived-dataset
    reality at 100 TB."""
    from pyspark.sql import Row
    spark.createDataFrame([Row(id=1, a="x")]).write.parquet(str(tmp_path / "ev"), mode="append")
    spark.createDataFrame([Row(id=2, a="y", b=7)]).write.parquet(str(tmp_path / "ev"), mode="append")
    merged = spark.read.option("mergeSchema", "true").parquet(str(tmp_path / "ev"))
    assert set(merged.columns) == {"id", "a", "b"}
    rows = {r.id: (r.a, r.b) for r in merged.collect()}
    assert rows[1] == ("x", None) and rows[2] == ("y", 7)


def test_corrupt_json_permissive(spark, tmp_path):
    """PERMISSIVE JSON read: malformed rows land in _corrupt_record
    instead of failing the job."""
    p = tmp_path / "bad.json"
    p.write_text('{"id": 1, "v": "ok"}\n{not json at all}\n{"id": 3, "v": "ok2"}\n')
    from pyspark.sql.types import StructType, StructField, LongType, StringType
    schema = StructType([
        StructField("id", LongType()), StructField("v", StringType()),
        StructField("_corrupt_record", StringType()),
    ])
    df = spark.read.schema(schema).option("mode", "PERMISSIVE") \
        .option("columnNameOfCorruptRecord", "_corrupt_record").json(str(p))
    rows = df.collect()
    assert sum(1 for r in rows if r._corrupt_record is not None) == 1
    assert sum(1 for r in rows if r.id is not None) == 2


def test_python_datasource_synthetic_corpus(spark):
    """Spark 4 Python DataSource API: the custom partitioned connector
    generates deterministic docs executor-side (nothing on the driver)."""
    from mapreduce_4sl08_spark.sources.synthetic import SyntheticCorpusDataSource
    spark.dataSource.register(SyntheticCorpusDataSource)
    df = (spark.read.format("synthetic_corpus")
          .option("n_docs", 500).option("n_partitions", 8)
          .option("seed", 7).load())
    assert df.count() == 500
    assert df.rdd.getNumPartitions() == 8
    rows = {r.doc_id: (r.text, r.n_tokens) for r in df.collect()}
    assert len(rows) == 500
    # deterministic: same seed → same docs; different seed → different
    df2 = (spark.read.format("synthetic_corpus")
           .option("n_docs", 500).option("n_partitions", 4)  # partitioning-invariant
           .option("seed", 7).load())
    rows2 = {r.doc_id: (r.text, r.n_tokens) for r in df2.collect()}
    assert rows == rows2
    df3 = (spark.read.format("synthetic_corpus")
           .option("n_docs", 500).option("n_partitions", 8)
           .option("seed", 8).load())
    rows3 = {r.doc_id: (r.text, r.n_tokens) for r in df3.collect()}
    assert rows != rows3
    # composes with the engine: word count over the custom source
    from mapreduce_4sl08_spark.operators.wordcount import word_count
    from pyspark.sql import functions as F
    wc = word_count(df.select(F.col("text").alias("value")))
    assert wc.count() == 25  # full vocab appears


def test_python_datasource_jsonl_sink(spark, sf_smoke_dir, tmp_path):
    """Custom writer: sharded JSONL + manifest via two-phase commit."""
    import json, glob
    from mapreduce_4sl08_spark.sources.jsonl_sink import JsonlManifestDataSource
    spark.dataSource.register(JsonlManifestDataSource)
    out = str(tmp_path / "jsonl_out")
    nation = _nation(spark, sf_smoke_dir).repartition(3)
    nation.write.format("jsonl_manifest").option("path", out).mode("append").save()

    manifest = json.load(open(f"{out}/_MANIFEST.json"))
    assert manifest["total_rows"] == 25
    shard_files = glob.glob(f"{out}/shard-*.jsonl")
    assert {s["file"] for s in manifest["shards"]} == \
        {f.split("/")[-1] for f in shard_files}
    rows = []
    for f in shard_files:
        rows += [json.loads(line) for line in open(f)]
    assert len(rows) == 25
    assert {r["n_name"] for r in rows} == \
        {r.n_name for r in nation.collect()}
    # round-trip through a normal spark json read
    back = spark.read.json(f"{out}/shard-*.jsonl")
    assert back.count() == 25

    # APPEND merges the prior manifest (earlier shards stay visible)
    nation.write.format("jsonl_manifest").option("path", out).mode("append").save()
    manifest2 = json.load(open(f"{out}/_MANIFEST.json"))
    assert manifest2["total_rows"] == 50
    assert len(manifest2["shards"]) == len(manifest["shards"]) * 2
    assert {s["file"] for s in manifest["shards"]} <= \
        {s["file"] for s in manifest2["shards"]}

    # OVERWRITE clears stale shards and resets the manifest
    nation.write.format("jsonl_manifest").option("path", out).mode("overwrite").save()
    manifest3 = json.load(open(f"{out}/_MANIFEST.json"))
    assert manifest3["total_rows"] == 25
    on_disk = {f.split("/")[-1] for f in glob.glob(f"{out}/shard-*.jsonl")}
    assert on_disk == {s["file"] for s in manifest3["shards"]}
    assert not glob.glob(f"{out}/_tmp-*")  # no orphan attempt files


def test_python_datasource_jsonl_reader(spark, sf_smoke_dir, tmp_path):
    """Custom reader: manifest-gated shard read, one partition per shard;
    orphan shard files NOT in the manifest are invisible."""
    import json, glob
    from mapreduce_4sl08_spark.sources.jsonl_sink import JsonlManifestDataSource
    spark.dataSource.register(JsonlManifestDataSource)
    out = str(tmp_path / "jsonl_rt")
    nation = _nation(spark, sf_smoke_dir).repartition(3)
    nation.write.format("jsonl_manifest").option("path", out).mode("append").save()

    ddl = "n_nationkey long, n_name string, n_regionkey long, n_comment string"
    back = (spark.read.format("jsonl_manifest").schema(ddl)
            .option("path", out).load())
    assert back.rdd.getNumPartitions() == \
        len(json.load(open(f"{out}/_MANIFEST.json"))["shards"])
    got = {(r.n_nationkey, r.n_name, r.n_regionkey) for r in back.collect()}
    want = {(r.n_nationkey, r.n_name, r.n_regionkey) for r in nation.collect()}
    assert got == want

    # an orphan shard (simulating a torn/uncommitted write) is ignored
    with open(f"{out}/shard-orphan.jsonl", "w") as f:
        f.write(json.dumps({"n_nationkey": 999, "n_name": "GHOST",
                            "n_regionkey": 0, "n_comment": ""}) + "\n")
    back2 = (spark.read.format("jsonl_manifest").schema(ddl)
             .option("path", out).load())
    assert back2.count() == 25
    assert back2.filter("n_name = 'GHOST'").count() == 0


def test_jsonl_manifest_typed_roundtrip(spark, tmp_path):
    """Non-JSON-native columns (timestamp/date/binary/decimal + arrays)
    round-trip through per-field codecs; unsupported nested types fail
    fast on the driver with the offending field path (ADVICE r3)."""
    import datetime
    import decimal

    import pytest

    from mapreduce_4sl08_spark.sources.jsonl_sink import JsonlManifestDataSource
    spark.dataSource.register(JsonlManifestDataSource)
    out = str(tmp_path / "jsonl_typed")

    ddl = ("id long, ts timestamp_ntz, d date, blob binary, "
           "amt decimal(12,4), tags array<string>, samples array<timestamp_ntz>")
    src = spark.createDataFrame(
        [
            (1, datetime.datetime(2024, 3, 1, 12, 30, 45, 123456),
             datetime.date(2024, 3, 1), bytearray(b"\x00\xffabc"),
             decimal.Decimal("1234.5678"), ["a", "b"],
             [datetime.datetime(2024, 1, 1), None]),
            (2, None, None, None, None, None, None),
        ],
        ddl,
    )
    src.write.format("jsonl_manifest").option("path", out).mode("append").save()
    back = (spark.read.format("jsonl_manifest").schema(ddl)
            .option("path", out).load())
    got = {r.id: r for r in back.collect()}
    want = {r.id: r for r in src.collect()}
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] == want[k], (got[k], want[k])

    # the on-disk form is still plain JSON (portable, spark.read.json-able)
    import glob
    import json
    rec = json.loads(open(glob.glob(f"{out}/shard-*.jsonl")[0]).readline())
    assert isinstance(rec["ts"], (str, type(None)))
    assert isinstance(rec["blob"], (str, type(None)))

    # struct columns cannot be represented — clear driver-side error
    bad = spark.range(1).selectExpr("named_struct('a', 1) AS s")
    with pytest.raises(Exception, match="unsupported type for jsonl_manifest"):
        bad.write.format("jsonl_manifest") \
            .option("path", str(tmp_path / "bad")).mode("append").save()


def test_load_table_events_ntz_session_zone_invariant(spark, tmp_path):
    """ADVICE r4: load_table's timestamp_ntz -> timestamp conversion must
    not depend on spark.sql.session.timeZone. The NTZ wall-clock IS the
    UTC instant for events data; a raw session with a local zone must see
    the same epoch micros as a UTC session."""
    import datetime

    import os

    sf = str(tmp_path / "sf_ntz")
    os.makedirs(sf)
    src = spark.createDataFrame(
        [(1, datetime.datetime(2024, 3, 1, 12, 30, 45, 123456)),
         (2, datetime.datetime(2024, 7, 4, 0, 0, 0))],
        "user_id long, ts timestamp_ntz",
    )
    src.write.mode("overwrite").parquet(f"{sf}/events.parquet")

    from mapreduce_4sl08_spark.sources.tables import load_table

    def epochs():
        df = load_table(spark, sf, "events")
        assert dict(df.dtypes)["ts"] == "timestamp"
        return sorted(
            r[0] for r in
            df.select(F.unix_micros("ts")).collect())

    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        utc = epochs()
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        shifted = epochs()
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)

    # expected: the naive wall-clock interpreted as a UTC instant
    want = sorted([
        int(datetime.datetime(2024, 3, 1, 12, 30, 45, 123456,
                              tzinfo=datetime.timezone.utc).timestamp() * 1e6),
        int(datetime.datetime(2024, 7, 4, 0, 0, 0,
                              tzinfo=datetime.timezone.utc).timestamp() * 1e6),
    ])
    assert utc == want
    assert shifted == want


def test_jsonl_codec_roundtrip_property():
    """Property: every supported type's (encode, decode) pair round-trips
    arbitrary values exactly, through an actual JSON serialization —
    driver-side, no Spark needed (the codecs run identically in tasks)."""
    import datetime
    import decimal
    import json

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pyspark.sql import types as T

    from mapreduce_4sl08_spark.sources.jsonl_sink import _codec

    timestamps = st.datetimes(
        min_value=datetime.datetime(1, 1, 1),
        max_value=datetime.datetime(9999, 12, 31, 23, 59, 59))
    dates = st.dates()
    binaries = st.binary(max_size=64)
    decimals = st.decimals(allow_nan=False, allow_infinity=False,
                           places=4, min_value=-10**12, max_value=10**12)

    cases = [
        (T.TimestampNTZType(), timestamps),
        (T.DateType(), dates),
        (T.BinaryType(), binaries),
        (T.DecimalType(16, 4), decimals),
        (T.ArrayType(T.TimestampNTZType()),
         st.lists(st.one_of(st.none(), timestamps), max_size=4)),
        (T.ArrayType(T.DecimalType(16, 4)),
         st.lists(st.one_of(st.none(), decimals), max_size=4)),
    ]

    @settings(max_examples=200, deadline=None)
    @given(data=st.data())
    def check(data):
        for dtype, strat in cases:
            v = data.draw(strat)
            enc, dec = _codec(dtype, "f")
            wire = json.loads(json.dumps(enc(v)))
            got = dec(wire)
            if isinstance(got, (bytes, bytearray)):
                assert bytes(got) == bytes(v)
            else:
                assert got == v, (dtype.simpleString(), v, got)

    check()


def test_jsonl_manifest_abort_keeps_prior_commit(spark, tmp_path):
    """A failed write job must not disturb the committed manifest: the
    abort path sweeps temp shards and the manifest-gated reader still
    sees exactly the prior commit."""
    import os

    import pytest

    from mapreduce_4sl08_spark.sources.jsonl_sink import JsonlManifestDataSource

    spark.dataSource.register(JsonlManifestDataSource)
    out = str(tmp_path / "jsonl_abort")

    ok = spark.range(5).selectExpr("id", "CAST(id AS STRING) AS s")
    ok.write.format("jsonl_manifest").option("path", out).mode("append").save()

    # second write fails mid-task (executor-side error after some rows)
    bad = spark.range(100).selectExpr(
        "id", "CAST(assert_true(id < 50, 'boom') AS STRING) AS s")
    with pytest.raises(Exception):
        bad.write.format("jsonl_manifest").option("path", out) \
            .mode("append").save()

    back = (spark.read.format("jsonl_manifest")
            .schema("id long, s string").option("path", out).load())
    assert sorted(r.id for r in back.collect()) == [0, 1, 2, 3, 4]

    # a task of a CRASHED writer (driver died — abort never ran) may
    # leave a temp shard behind. Liveness-based reclaim (ADVICE r6):
    # the crashed job's `_live-` flock is free, so the next commit
    # reclaims its temps IMMEDIATELY (no mtime guessing); a temp with
    # no liveness record at all (legacy writer) is only swept once
    # older than the generous fallback grace; a LIVE concurrent
    # writer's in-flight shard survives no matter how old — its own
    # commit would otherwise fail on the rename.
    import time

    from mapreduce_4sl08_spark.sources.jsonl_sink import (
        _LIVE_PREFIX, JsonlManifestWriter)
    from pyspark.sql import types as T

    dead = os.path.join(out, "_tmp-deadjob-straggler.jsonl")
    legacy_fresh = os.path.join(out, "_tmp-legacyjob-inflight.jsonl")
    for p in (dead, legacy_fresh):
        with open(p, "w") as f:
            f.write("{}\n")
    # deadjob crashed: liveness file exists, flock NOT held
    open(os.path.join(out, f"{_LIVE_PREFIX}deadjob"), "w").close()
    # a live concurrent job: driver-held flock, ancient temp — the
    # mtime must be irrelevant while the owner is alive
    schema = T.StructType([T.StructField("id", T.LongType()),
                           T.StructField("s", T.StringType())])
    live_writer = JsonlManifestWriter({"path": out}, schema, False)
    live_tmp = os.path.join(
        out, f"_tmp-{live_writer.job_uuid}-inflight.jsonl")
    with open(live_tmp, "w") as f:
        f.write("{}\n")
    os.utime(live_tmp, (time.time() - 86400, time.time() - 86400))

    spark.range(100, 102).selectExpr("id", "CAST(id AS STRING) AS s") \
        .write.format("jsonl_manifest").option("path", out) \
        .mode("append").save()
    back2 = (spark.read.format("jsonl_manifest")
             .schema("id long, s string").option("path", out).load())
    assert sorted(r.id for r in back2.collect()) == [0, 1, 2, 3, 4, 100, 101]
    leftovers = {f for f in os.listdir(out) if f.startswith("_tmp-")}
    assert "_tmp-deadjob-straggler.jsonl" not in leftovers  # dead: GC'd now
    assert f"{_LIVE_PREFIX}deadjob" not in os.listdir(out)  # sidecar too
    assert "_tmp-legacyjob-inflight.jsonl" in leftovers     # inside grace
    assert os.path.basename(live_tmp) in leftovers  # alive: mtime ignored
    live_writer.abort([])  # releases the liveness flock + sweeps own temp
    assert not os.path.exists(live_tmp)


def test_jsonl_sink_liveness_lifecycle(tmp_path):
    """Liveness registration (ADVICE r6) — pure-Python semantics, no
    Spark: the writer holds a flock on `_live-<job>` for its lifetime,
    the fd never pickles to executors, release unlinks the sidecar, and
    `_job_alive` distinguishes alive / crashed / no-record."""
    import os
    import pickle

    from pyspark.sql import types as T

    from mapreduce_4sl08_spark.sources.jsonl_sink import (
        _LIVE_PREFIX, JsonlManifestWriter, _job_alive)

    schema = T.StructType([T.StructField("x", T.LongType())])
    d = str(tmp_path)
    w = JsonlManifestWriter({"path": d}, schema, overwrite=False)
    live = os.path.join(d, f"{_LIVE_PREFIX}{w.job_uuid}")
    assert os.path.exists(live)
    assert _job_alive(d, w.job_uuid) is True          # flock held

    w2 = pickle.loads(pickle.dumps(w))                # executor copy
    assert w2._live_fh is None and w2.job_uuid == w.job_uuid

    w._release_liveness()
    assert not os.path.exists(live)
    assert _job_alive(d, w.job_uuid) is None          # no record

    open(os.path.join(d, f"{_LIVE_PREFIX}crashed"), "w").close()
    assert _job_alive(d, "crashed") is False          # free lock = dead

    # commit() releases liveness even for an empty (zero-task) job
    w3 = JsonlManifestWriter({"path": d}, schema, overwrite=False)
    w3.commit([])
    assert w3._live_fh is None
    assert not os.path.exists(
        os.path.join(d, f"{_LIVE_PREFIX}{w3.job_uuid}"))


def test_jsonl_sink_concurrent_append_crash_rehearsal(tmp_path):
    """End-to-end composition of the r7 flock-liveness design (VERDICT
    r7 item 5): two simultaneous writer jobs against ONE sink dir, one
    killed mid-commit (temps written, manifest never published — its
    liveness flock drops with the process), then its re-run recovers.
    Asserts the full contract the unit tests cover only piecewise:

    - while the victim process is ALIVE, a concurrent commit must leave
      its in-flight temps untouched (no mtime-based data-loss window);
    - after SIGKILL, the next committer reclaims the victim's temps and
      liveness sidecar (lock provably dropped), and the dead job's rows
      never become visible;
    - the survivor's and the re-run's rows each appear EXACTLY once in
      the manifest-gated read (no lost shards, no double-append).
    """
    import os
    import signal
    import subprocess
    import sys
    import time

    from pyspark.sql import Row
    from pyspark.sql import types as T

    from mapreduce_4sl08_spark.sources.jsonl_sink import (
        _LIVE_PREFIX, _TMP_PREFIX, JsonlManifestReader, JsonlManifestWriter,
        read_manifest)

    d = str(tmp_path / "sink")
    schema = T.StructType([T.StructField("x", T.LongType()),
                           T.StructField("who", T.StringType())])

    victim_src = f"""
import sys, time
sys.path.insert(0, {repr(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))})
from pyspark.sql import Row, types as T
from mapreduce_4sl08_spark.sources.jsonl_sink import JsonlManifestWriter
schema = T.StructType([T.StructField("x", T.LongType()),
                       T.StructField("who", T.StringType())])
w = JsonlManifestWriter({{"path": {d!r}}}, schema, overwrite=False)
w.write(iter([Row(x=i, who="victim") for i in range(4)]))
w.write(iter([Row(x=i, who="victim") for i in range(4, 7)]))
print("READY", flush=True)
time.sleep(600)  # straggler: commit never arrives; parent SIGKILLs us
"""
    victim = subprocess.Popen([sys.executable, "-c", victim_src],
                              stdout=subprocess.PIPE, text=True)
    try:
        assert victim.stdout.readline().strip() == "READY"

        def names(prefix):
            return {fn for fn in os.listdir(d) if fn.startswith(prefix)}

        victim_temps = names(_TMP_PREFIX)
        assert len(victim_temps) == 2
        assert len(names(_LIVE_PREFIX)) == 1

        # concurrent survivor commits while the victim is alive: the
        # victim's in-flight temps must survive no matter their age
        surv = JsonlManifestWriter({"path": d}, schema, overwrite=False)
        msg = surv.write(iter([Row(x=i, who="survivor") for i in range(5)]))
        surv.commit([msg])
        assert names(_TMP_PREFIX) == victim_temps, \
            "live concurrent job's temps were swept"
        assert read_manifest(d)["total_rows"] == 5

        victim.kill()
        victim.wait()
        time.sleep(0.2)  # let the OS fully release the flock

        # the victim's re-run: appends the same data as a NEW job
        rerun = JsonlManifestWriter({"path": d}, schema, overwrite=False)
        msgs = [rerun.write(iter([Row(x=i, who="victim") for i in range(4)])),
                rerun.write(iter([Row(x=i, who="victim") for i in range(4, 7)]))]
        rerun.commit(msgs)

        assert names(_TMP_PREFIX) == set(), "crashed job's temps not reclaimed"
        assert names(_LIVE_PREFIX) == set(), "dead liveness sidecar not retired"
        m = read_manifest(d)
        assert m["total_rows"] == 12 and len(m["shards"]) == 3

        reader = JsonlManifestReader({"path": d}, schema)
        rows = sorted(row for p in reader.partitions()
                      for row in reader.read(p))
        assert rows == sorted(
            [(i, "survivor") for i in range(5)]
            + [(i, "victim") for i in range(7)]), \
            "lost or double-appended rows after crash recovery"
    finally:
        if victim.poll() is None:
            victim.send_signal(signal.SIGKILL)
            victim.wait()
