"""Warehouse loader as a Spark 4 Python Data Source WRITER.

The reference's load step stages extracted JSON and has the warehouse
ingest it atomically (Snowflake ``PUT`` → ``COPY INTO``; reference
``README.md:285-291``). This sink reproduces that contract as a
first-class ``df.write.format("jsonl_warehouse")`` target with the
classic two-phase commit:

- **phase 1 (tasks, parallel)**: each task spools its partition to a
  uniquely-named file under ``<path>/_staging`` and returns the file
  name in its ``WriterCommitMessage``. A retried/speculative task just
  produces an orphan staging file — never a visible row.
- **phase 2 (driver, once)**: ``commit`` renames exactly the files
  named in the commit messages into the table directory and writes a
  ``_SUCCESS`` manifest (file list + row count). Readers treat the
  manifest as the load boundary, so a crash mid-job leaves the table
  unchanged — the same visible-or-nothing semantics as ``COPY INTO``.

On a real deployment the staging dir is an object-store prefix /
warehouse stage; the protocol is identical. JSONL because that is the
reference's interchange format (its S3 cache layer stores raw JSON
pages).
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)


@dataclass
class FileCommit(WriterCommitMessage):
    staged_name: str
    n_rows: int


class JsonlWarehouseWriter(DataSourceWriter):
    def __init__(self, options: dict, overwrite: bool):
        self.path = options["path"]
        self.overwrite = overwrite

    def write(self, iterator) -> FileCommit:
        staging = os.path.join(self.path, "_staging")
        os.makedirs(staging, exist_ok=True)
        name = f"part-{uuid.uuid4().hex}.jsonl"
        n = 0
        with open(os.path.join(staging, name), "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return FileCommit(staged_name=name, n_rows=n)

    def commit(self, messages) -> None:
        staging = os.path.join(self.path, "_staging")
        if self.overwrite:
            for f in os.listdir(self.path):
                if f.endswith(".jsonl"):
                    os.remove(os.path.join(self.path, f))
        kept, total = [], 0
        for m in messages:
            os.rename(
                os.path.join(staging, m.staged_name),
                os.path.join(self.path, m.staged_name),
            )
            kept.append(m.staged_name)
            total += m.n_rows
        # Orphans from retried tasks die with the staging dir.
        for f in os.listdir(staging):
            os.remove(os.path.join(staging, f))
        os.rmdir(staging)
        with open(os.path.join(self.path, "_SUCCESS"), "w") as f:
            json.dump({"files": sorted(kept), "n_rows": total}, f)

    def abort(self, messages) -> None:
        staging = os.path.join(self.path, "_staging")
        if os.path.isdir(staging):
            for f in os.listdir(staging):
                os.remove(os.path.join(staging, f))
            os.rmdir(staging)


class JsonlWarehouseStreamWriter(DataSourceStreamWriter):
    """Streaming flavor: one atomic load PER MICRO-BATCH, exactly-once
    at the table.

    ``commit(messages, batchId)`` publishes the epoch's staged files
    under a ``batch=<id>`` manifest entry; a batch replayed after a
    crash (same batchId) is detected in the manifest and its staged
    files are discarded instead of double-loaded — idempotent re-commit,
    which is exactly the contract Structured Streaming requires from a
    sink for end-to-end exactly-once.
    """

    def __init__(self, options: dict):
        self.path = options["path"]

    def write(self, iterator) -> FileCommit:
        return JsonlWarehouseWriter({"path": self.path}, overwrite=False).write(
            iterator
        )

    def _manifest(self) -> dict:
        mpath = os.path.join(self.path, "_SUCCESS")
        if os.path.exists(mpath):
            with open(mpath) as f:
                return json.load(f)
        return {"files": [], "n_rows": 0, "batches": []}

    def commit(self, messages, batchId: int) -> None:
        staging = os.path.join(self.path, "_staging")
        man = self._manifest()
        if batchId in man.get("batches", []):  # replayed epoch: drop, don't double-load
            self.abort(messages, batchId)
            return
        for m in messages:
            if m is None:
                continue
            os.rename(
                os.path.join(staging, m.staged_name),
                os.path.join(self.path, m.staged_name),
            )
            man["files"].append(m.staged_name)
            man["n_rows"] += m.n_rows
        man["batches"] = sorted(man.get("batches", []) + [batchId])
        man["files"].sort()
        with open(os.path.join(self.path, "_SUCCESS"), "w") as f:
            json.dump(man, f)

    def abort(self, messages, batchId: int) -> None:
        staging = os.path.join(self.path, "_staging")
        for m in messages:
            if m is None:
                continue
            p = os.path.join(staging, m.staged_name)
            if os.path.exists(p):
                os.remove(p)


class JsonlWarehouseDataSource(DataSource):
    """``df.write.format("jsonl_warehouse").option("path", …)`` (batch)
    and ``df.writeStream.format("jsonl_warehouse")`` (per-epoch loads)."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_warehouse"

    def writer(self, schema, overwrite: bool) -> JsonlWarehouseWriter:
        return JsonlWarehouseWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite: bool) -> JsonlWarehouseStreamWriter:
        return JsonlWarehouseStreamWriter(self.options)
