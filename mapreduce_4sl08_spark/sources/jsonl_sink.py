"""Custom Python DataSource (Spark 4 API): sharded JSONL with a commit
manifest — the reference's master-side sink (K1,
/root/reference/src/MasterNode.java:200-209) generalized into a proper
two-phase-commit connector, with a manifest-gated READ side (one input
partition per committed shard; uncommitted/orphan files are invisible):

- every task writes its shard under a TEMPORARY name and reports it in a
  commit message; failed or speculative attempts leave only temp files,
  which never become visible;
- the driver's commit() renames exactly the committed attempts to their
  final names, merges (append) or replaces (overwrite) the shard set,
  then publishes the manifest atomically (temp file + rename) — readers
  keyed on the manifest never observe a partial write (the manifest is
  the transaction marker);
- overwrite mode retires prior shards only AFTER the new manifest is
  live, so a reader holding either manifest always finds its shards;
  append mode merges the prior manifest so earlier batches stay visible.

    spark.dataSource.register(JsonlManifestDataSource)
    df.write.format("jsonl_manifest").option("path", out).mode("append").save()

Concurrency contract: concurrent APPEND jobs to one path are safe on
POSIX filesystems — commits serialize on an advisory flock sidecar
(``_LOCK``), temp shards are job-prefixed so one job's cleanup never
removes another's in-flight files (foreign orphans are only reclaimed
after a staleness grace). On filesystems without flock semantics
(object stores, some NFS mounts) run a SINGLE concurrent writer per
path. Concurrent overwrite+append is inherently racy (overwrite
replaces the shard set by design) — don't mix modes concurrently.
"""

from __future__ import annotations

import base64
import contextlib
import datetime
import decimal
import json
import os
import time
import uuid

try:
    import fcntl
except ImportError:  # non-POSIX — commit lock degrades to single-writer
    fcntl = None

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource, DataSourceReader, DataSourceWriter, InputPartition,
    WriterCommitMessage,
)

_MANIFEST = "_MANIFEST.json"
_TMP_PREFIX = "_tmp-"
# Foreign temp shards (another writer's prefix) are garbage-collected at
# commit only once this stale — a CONCURRENT writer's in-flight shards
# must never be swept out from under it (its commit would then fail on
# the rename), while a crashed writer's orphans still get reclaimed.
_ORPHAN_GRACE_SEC = 600.0

# JSON-native atomic types need no coercion on either side.
_JSON_NATIVE = (
    T.StringType, T.BooleanType,
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType,
)


def _codec(dtype: T.DataType, path: str):
    """(encode, decode) pair mapping one Spark type to/from a JSON-native
    value, or ``(None, None)`` for identity. Raises a clear error for
    types the JSONL round-trip cannot represent (struct/map) — validated
    up front in ``writer()``/``reader()`` so a bad schema fails on the
    driver, not as a ``json.dumps`` TypeError mid-task (ADVICE r3)."""
    if isinstance(dtype, _JSON_NATIVE):
        return None, None
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return (lambda v: v.isoformat(),
                lambda s: datetime.datetime.fromisoformat(s))
    if isinstance(dtype, T.DateType):
        return (lambda v: v.isoformat(),
                lambda s: datetime.date.fromisoformat(s))
    if isinstance(dtype, T.BinaryType):
        return (lambda v: base64.b64encode(bytes(v)).decode("ascii"),
                lambda s: base64.b64decode(s))
    if isinstance(dtype, T.DecimalType):
        return (lambda v: str(v), lambda s: decimal.Decimal(s))
    if isinstance(dtype, T.ArrayType):
        enc_e, dec_e = _codec(dtype.elementType, f"{path}[]")
        if enc_e is None:
            return None, None
        return (
            lambda xs: [None if x is None else enc_e(x) for x in xs],
            lambda xs: [None if x is None else dec_e(x) for x in xs],
        )
    raise ValueError(
        f"unsupported type for jsonl_manifest at '{path}': "
        f"{dtype.simpleString()} (supported: string/bool/int/float, "
        f"timestamp, date, binary, decimal, and arrays thereof)")


def _schema_codecs(schema: T.StructType) -> list[tuple[str, object, object]]:
    return [(f.name, *_codec(f.dataType, f.name)) for f in schema.fields]


class _ShardCommit(WriterCommitMessage):
    def __init__(self, tmp_name: str, final_name: str, n_rows: int):
        self.tmp_name = tmp_name
        self.final_name = final_name
        self.n_rows = n_rows


def read_manifest(path: str) -> dict:
    """The committed manifest, or {} if nothing was ever committed.
    Single read path shared by the writer's append-merge and the
    streaming replay guard — the manifest format has ONE parser."""
    mpath = os.path.join(path, _MANIFEST)
    if not os.path.exists(mpath):
        return {}
    with open(mpath) as f:
        return json.load(f)


def committed_streams(path: str) -> dict[str, int]:
    """Per-stream high-water mark {stream_id: last committed batch id}
    from the committed manifest — the replay guard for exactly-once
    foreachBatch streaming: a restart that re-delivers an
    already-committed micro-batch (crash AFTER sink commit, BEFORE the
    streaming checkpoint advanced) is detected and skipped. Micro-batch
    ids are monotonic within one query lineage, so ONE integer per
    stream bounds the manifest — recording every batch key would grow
    the manifest (and every commit's read-modify-write) O(batches) for
    a long-lived stream (ADVICE r5). Marks are scoped by stream id so a
    NEW lineage (fresh checkpoint) appending to an existing path
    restarts its numbering without colliding with a prior stream's
    (see streaming/sinks.py::jsonl_batch_writer)."""
    m = read_manifest(path)
    streams = {k: int(v) for k, v in m.get("streams", {}).items()}
    for key in m.get("batches", []):  # legacy pre-r6 list-of-keys format
        sid, _, bid = key.rpartition("/")
        streams[sid] = max(streams.get(sid, -1), int(bid))
    return streams


def last_committed_batch(path: str, stream_id: str) -> int | None:
    """Highest committed micro-batch id for one stream, or None if the
    stream never committed. A re-delivered batch_id <= this is a replay."""
    return committed_streams(path).get(stream_id)


@contextlib.contextmanager
def _commit_lock(path: str):
    """Serialize manifest read-modify-write across concurrent committers
    (advisory flock on a sidecar file). Two appending writers otherwise
    race last-manifest-wins and one loses the other's shards (ADVICE
    r5). POSIX-only semantics: on filesystems without flock (object
    stores, some NFS), the caller must guarantee a single concurrent
    writer per path — documented in the module docstring."""
    if fcntl is None:
        yield
        return
    with open(os.path.join(path, "_LOCK"), "w") as lock:
        fcntl.flock(lock, fcntl.LOCK_EX)
        try:
            yield
        finally:
            fcntl.flock(lock, fcntl.LOCK_UN)


class JsonlManifestWriter(DataSourceWriter):
    def __init__(self, options, schema, overwrite: bool):
        self.path = options.get("path")
        self.overwrite = overwrite
        # optional streaming replay-guard mark — recorded in the manifest
        # at commit so replayed micro-batches are detectable
        # (exactly-once); stream_id scopes batch numbering to one query
        # lineage (see streaming/sinks.py::jsonl_batch_writer)
        self.stream_id = options.get("stream_id")
        self.batch_id = options.get("batch_id")
        if not self.path:
            raise ValueError("jsonl_manifest requires option 'path'")
        # one id per WRITE JOB, minted on the driver and shared by every
        # task of this job (the writer object is serialized to tasks):
        # temp shards are job-prefixed so a job only ever sweeps its OWN
        # stragglers eagerly — a concurrent writer's in-flight temps are
        # foreign and protected by the staleness grace (ADVICE r5)
        self.job_uuid = uuid.uuid4().hex
        # validate the schema NOW (driver side): unsupported nested types
        # raise here with the field path, not as an executor TypeError
        self.codecs = _schema_codecs(schema)

    def write(self, rows):
        os.makedirs(self.path, exist_ok=True)
        shard_id = uuid.uuid4().hex
        tmp_name = f"{_TMP_PREFIX}{self.job_uuid}-{shard_id}.jsonl"
        final_name = f"shard-{shard_id}.jsonl"
        n = 0
        with open(os.path.join(self.path, tmp_name), "w") as f:
            for row in rows:
                rec = row.asDict()
                for name, enc, _dec in self.codecs:
                    if enc is not None and rec.get(name) is not None:
                        rec[name] = enc(rec[name])
                f.write(json.dumps(rec) + "\n")
                n += 1
        return _ShardCommit(tmp_name, final_name, n)

    def commit(self, messages):
        # The read-merge-publish below is serialized across concurrent
        # committers by an advisory lock — two appenders racing the
        # manifest read-modify-write would otherwise lose shards
        # last-manifest-wins (ADVICE r5).
        os.makedirs(self.path, exist_ok=True)  # zero-task job edge case
        with _commit_lock(self.path):
            self._commit_locked(messages)

    def _commit_locked(self, messages):
        # 1. publish exactly the committed attempts (rename is atomic);
        #    orphan temp files from failed/speculative attempts stay
        #    invisible and are swept below
        new_shards = []
        for m in messages:
            if m is None:
                continue
            if m.n_rows == 0:
                # empty partition — don't publish a zero-row shard (its
                # temp file is swept in step 4). At cluster scale this
                # avoids one file per empty task.
                continue
            os.replace(os.path.join(self.path, m.tmp_name),
                       os.path.join(self.path, m.final_name))
            new_shards.append({"file": m.final_name, "rows": m.n_rows})
        # 2. overwrite replaces the shard set; append merges the prior
        #    manifest. Stale shards are only IDENTIFIED here — deletion
        #    must wait until after the new manifest is published, or a
        #    reader holding the old manifest would hit missing files.
        if self.overwrite:
            keep = {s["file"] for s in new_shards}
            stale = [fn for fn in os.listdir(self.path)
                     if fn.startswith("shard-") and fn not in keep]
            shards = new_shards
            streams: dict[str, int] = {}
        else:
            stale = []
            prior = read_manifest(self.path)
            shards = prior.get("shards", []) + new_shards
            streams = {k: int(v) for k, v in prior.get("streams", {}).items()}
            for key in prior.get("batches", []):  # legacy pre-r6 format
                sid, _, bid = key.rpartition("/")
                streams[sid] = max(streams.get(sid, -1), int(bid))
        if self.batch_id is not None:
            # one integer high-water mark per stream — O(streams), not
            # O(batches), so a long-lived stream's manifest (and every
            # commit's read-modify-write) stays bounded (ADVICE r5)
            sid = self.stream_id or ""
            streams[sid] = max(streams.get(sid, -1), int(self.batch_id))
        # 3. publish the manifest atomically (temp + rename) — THE commit
        #    point. A concurrent reader sees either the old manifest with
        #    its shards still on disk, or the complete new manifest —
        #    never a torn manifest or one pointing at deleted shards.
        manifest = {
            "shards": sorted(shards, key=lambda s: s["file"]),
            "total_rows": sum(s["rows"] for s in shards),
            "streams": dict(sorted(streams.items())),
        }
        tmp_manifest = os.path.join(
            self.path, f"{_TMP_PREFIX}{self.job_uuid}-manifest.json")
        with open(tmp_manifest, "w") as f:
            json.dump(manifest, f, indent=2)
        os.replace(tmp_manifest, os.path.join(self.path, _MANIFEST))
        # 4. only now retire stale shards and garbage-collect temps: this
        #    job's stragglers eagerly; FOREIGN temps only once stale —
        #    a concurrent writer's in-flight shards must survive
        now = time.time()
        own = f"{_TMP_PREFIX}{self.job_uuid}-"
        for fn in stale:
            os.remove(os.path.join(self.path, fn))
        for fn in os.listdir(self.path):
            if not fn.startswith(_TMP_PREFIX):
                continue
            full = os.path.join(self.path, fn)
            try:
                if fn.startswith(own) or (
                        now - os.path.getmtime(full) > _ORPHAN_GRACE_SEC):
                    os.remove(full)
            except OSError:
                pass  # racing remover / vanished straggler — best effort

    def abort(self, messages):
        # only temp files can exist for this batch — remove the reported
        # ones and sweep this job's stragglers from unreported attempts
        # (foreign temps are left for their own writer / the stale GC)
        for m in messages:
            if m is not None:
                try:
                    os.remove(os.path.join(self.path, m.tmp_name))
                except OSError:
                    pass
        own = f"{_TMP_PREFIX}{self.job_uuid}-"
        try:
            for fn in os.listdir(self.path):
                if fn.startswith(own):
                    os.remove(os.path.join(self.path, fn))
        except OSError:
            pass


class _ShardPartition(InputPartition):
    def __init__(self, file: str):
        self.file = file


class JsonlManifestReader(DataSourceReader):
    """Manifest-gated read side: ONLY shards listed in the committed
    manifest are visible (orphan/temp files from failed writes are
    ignored by construction), and each shard is one input partition, so
    read parallelism equals the committed shard count."""

    def __init__(self, options, schema):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_manifest requires option 'path'")
        # validated up front — same contract as the writer, so a schema
        # that round-trips on write is guaranteed readable and vice versa
        self.codecs = _schema_codecs(schema)

    def partitions(self):
        mpath = os.path.join(self.path, _MANIFEST)
        if not os.path.exists(mpath):
            raise FileNotFoundError(
                f"no committed manifest at {mpath} — nothing was ever "
                f"successfully written here")
        with open(mpath) as f:
            shards = json.load(f).get("shards", [])
        return [_ShardPartition(s["file"]) for s in shards]

    def read(self, partition):
        with open(os.path.join(self.path, partition.file)) as f:
            for line in f:
                rec = json.loads(line)
                out = []
                for name, _enc, dec in self.codecs:
                    v = rec.get(name)
                    out.append(dec(v) if dec is not None and v is not None
                               else v)
                yield tuple(out)


class JsonlManifestDataSource(DataSource):
    @classmethod
    def name(cls):
        return "jsonl_manifest"

    def writer(self, schema, overwrite: bool):
        return JsonlManifestWriter(self.options, schema, overwrite)

    def reader(self, schema):
        # schema comes from the caller's .schema(...) (JSONL is
        # schema-on-read; the manifest stores no types)
        return JsonlManifestReader(self.options, schema)
