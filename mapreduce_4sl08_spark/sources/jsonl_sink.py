"""Custom Python DataSource WRITER (Spark 4 API): sharded JSONL with a
commit manifest — the reference's master-side sink (K1,
/root/reference/src/MasterNode.java:200-209) generalized into a proper
two-phase-commit connector: every task writes its own shard and reports
a commit message; the driver's commit() publishes the manifest LAST, so
readers never observe a partial write (the manifest is the transaction
marker).

    spark.dataSource.register(JsonlManifestDataSource)
    df.write.format("jsonl_manifest").option("path", out).mode("append").save()
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql.datasource import (
    DataSource, DataSourceWriter, WriterCommitMessage,
)


class _ShardCommit(WriterCommitMessage):
    def __init__(self, filename: str, n_rows: int):
        self.filename = filename
        self.n_rows = n_rows


class JsonlManifestWriter(DataSourceWriter):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_manifest requires option 'path'")

    def write(self, rows):
        os.makedirs(self.path, exist_ok=True)
        filename = f"shard-{uuid.uuid4().hex}.jsonl"
        n = 0
        with open(os.path.join(self.path, filename), "w") as f:
            for row in rows:
                f.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return _ShardCommit(filename, n)

    def commit(self, messages):
        shards = [{"file": m.filename, "rows": m.n_rows}
                  for m in messages if m is not None]
        manifest = {
            "shards": sorted(shards, key=lambda s: s["file"]),
            "total_rows": sum(s["rows"] for s in shards),
        }
        with open(os.path.join(self.path, "_MANIFEST.json"), "w") as f:
            json.dump(manifest, f, indent=2)

    def abort(self, messages):
        for m in messages:
            if m is not None:
                try:
                    os.remove(os.path.join(self.path, m.filename))
                except OSError:
                    pass


class JsonlManifestDataSource(DataSource):
    @classmethod
    def name(cls):
        return "jsonl_manifest"

    def writer(self, schema, overwrite: bool):
        return JsonlManifestWriter(self.options)
