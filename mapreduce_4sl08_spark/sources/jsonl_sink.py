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
removes another's in-flight files. Each job additionally registers
LIVENESS: its driver holds a flock on ``_live-<job>`` for the job's
whole lifetime, so other committers reclaim a foreign temp only when
that lock is provably dropped (owner crashed — the OS releases flocks
on process death), never on mtime staleness while the owner is merely
slow (ADVICE r6: commit delays beyond any fixed grace are routine
straggler territory at 100 TB). A generous mtime grace remains only as
the fallback for temps with no liveness record. On filesystems without
flock semantics (object stores, some NFS mounts) run a SINGLE
concurrent writer per path. Concurrent overwrite+append is inherently
racy (overwrite replaces the shard set by design) — don't mix modes
concurrently.
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
_LIVE_PREFIX = "_live-"
# Foreign temp shards (another writer's prefix) are garbage-collected at
# commit. Liveness is probed via the owner's ``_live-<job>`` flock (held
# by the writing driver for the job's whole lifetime, released by the OS
# even on a crash) — a CONCURRENT writer's in-flight shards are never
# swept out from under it no matter how long its commit is delayed
# (ADVICE r6: a >grace straggler is routine at the 100 TB design point),
# while a crashed writer's orphans are reclaimed as soon as its lock
# drops. The mtime grace below is only the FALLBACK for temps with no
# liveness record (legacy writers, flock-less filesystems) and is sized
# well above any sane job duration rather than above a commit delay.
_ORPHAN_GRACE_SEC = float(os.environ.get(
    "SPARK_GRAFT_SINK_ORPHAN_GRACE_SEC", 6 * 3600))

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


def _job_alive(path: str, job_uuid: str) -> bool | None:
    """Is the job that owns ``_live-<job_uuid>`` still running?

    - ``True``: the liveness flock is held — the owner's driver process
      is alive (possibly a long straggler whose commit is delayed); its
      temp shards must not be touched.
    - ``False``: the liveness file exists but its flock is free — the
      owner died without cleanup (the OS released the lock); its temps
      are reclaimable immediately.
    - ``None``: no liveness record (legacy writer, flock-less platform,
      or already cleaned) — caller falls back to the mtime grace.
    """
    if fcntl is None:
        return None
    live = os.path.join(path, f"{_LIVE_PREFIX}{job_uuid}")
    try:
        with open(live) as f:
            try:
                fcntl.flock(f, fcntl.LOCK_EX | fcntl.LOCK_NB)
            except OSError:
                return True  # held by a live process
            fcntl.flock(f, fcntl.LOCK_UN)
        return False
    except OSError:
        return None  # no record / unreadable — mtime fallback


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
        # liveness registration (ADVICE r6): hold a flock on a per-job
        # sidecar for the job's entire lifetime, acquired BEFORE any task
        # can write a temp shard. Other committers probe this lock to
        # distinguish "slow but alive" (never sweep) from "crashed"
        # (reclaim now) — mtime staleness can't make that distinction and
        # sweeping a live straggler's temps breaks its commit.
        self._live_fh = None
        self._acquire_liveness()

    def _acquire_liveness(self) -> None:
        if fcntl is None:
            return  # flock-less platform: temps rely on the mtime grace
        os.makedirs(self.path, exist_ok=True)
        live = os.path.join(self.path, f"{_LIVE_PREFIX}{self.job_uuid}")
        while True:
            fh = open(live, "w")
            fcntl.flock(fh, fcntl.LOCK_EX)  # uncontended: our own file
            # a concurrent sweep may have unlinked the path between our
            # create and flock (it probes free locks) — verify the fd
            # still IS the path, else the registration would be invisible
            try:
                if os.stat(live).st_ino == os.fstat(fh.fileno()).st_ino:
                    self._live_fh = fh
                    return
            except OSError:
                pass
            fh.close()

    def _release_liveness(self) -> None:
        if self._live_fh is None:
            return
        try:
            os.remove(os.path.join(
                self.path, f"{_LIVE_PREFIX}{self.job_uuid}"))
        except OSError:
            pass
        try:
            self._live_fh.close()  # closing drops the flock
        except OSError:
            pass
        self._live_fh = None

    def __getstate__(self):
        # the writer is pickled to executors for write(); the liveness fd
        # is driver-only state (executors neither hold nor release it)
        state = dict(self.__dict__)
        state["_live_fh"] = None
        return state

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
        try:
            with _commit_lock(self.path):
                self._commit_locked(messages)
        finally:
            self._release_liveness()

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
        #    job's stragglers eagerly; FOREIGN temps only when their
        #    owner's liveness flock is provably dropped (crashed job) —
        #    a live concurrent writer's in-flight shards must survive
        #    regardless of how long its commit is delayed (ADVICE r6).
        #    Temps with no liveness record fall back to the mtime grace.
        now = time.time()
        own = f"{_TMP_PREFIX}{self.job_uuid}-"
        for fn in stale:
            os.remove(os.path.join(self.path, fn))
        alive_cache: dict[str, bool | None] = {self.job_uuid: True}
        dead_owners: set[str] = set()
        for fn in os.listdir(self.path):
            if not fn.startswith(_TMP_PREFIX):
                continue
            full = os.path.join(self.path, fn)
            try:
                if fn.startswith(own):
                    os.remove(full)
                    continue
                owner = fn[len(_TMP_PREFIX):].split("-", 1)[0]
                if owner not in alive_cache:
                    alive_cache[owner] = _job_alive(self.path, owner)
                alive = alive_cache[owner]
                if alive is True:
                    continue  # live concurrent job — never sweep
                if alive is False:
                    os.remove(full)  # owner crashed; lock is free
                    dead_owners.add(owner)
                elif now - os.path.getmtime(full) > _ORPHAN_GRACE_SEC:
                    os.remove(full)  # no liveness record — stale fallback
            except OSError:
                pass  # racing remover / vanished straggler — best effort
        # retire dead owners' liveness sidecars (their temps are gone);
        # sidecars whose owner left NO temps age out via the same grace
        for fn in os.listdir(self.path):
            if not fn.startswith(_LIVE_PREFIX):
                continue
            owner = fn[len(_LIVE_PREFIX):]
            full = os.path.join(self.path, fn)
            try:
                if owner in dead_owners or (
                        owner != self.job_uuid
                        and _job_alive(self.path, owner) is False
                        and now - os.path.getmtime(full) > _ORPHAN_GRACE_SEC):
                    os.remove(full)
            except OSError:
                pass

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
        self._release_liveness()


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
