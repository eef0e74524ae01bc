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


def load_manifest(path: str) -> dict:
    """The table's load-boundary manifest (empty shape if never loaded)."""
    mpath = os.path.join(path, "_SUCCESS")
    if os.path.exists(mpath):
        with open(mpath) as f:
            return json.load(f)
    return {"files": [], "n_rows": 0, "batches": [], "versions": []}


def read_warehouse(spark, path: str, schema, version: int | None = None):
    """Manifest-gated (and optionally time-travelled) read of the table.

    Readers must take the file set from the manifest, not the
    directory: files not yet published (or left by a crashed job)
    are invisible — the COPY INTO visibility contract. ``version``
    (1-based) replays the version log up to that load boundary: an
    overwrite entry resets the visible set, appends/epochs add to it —
    Delta-style time travel, with the log carried in the same
    ``_SUCCESS`` object the loads already commit atomically.
    """
    man = load_manifest(path)
    versions = man.get("versions", [])
    if version is None:
        files = man["files"]
    else:
        if not 1 <= version <= len(versions):
            raise ValueError(
                f"version {version} out of range 1..{len(versions)}"
            )
        visible: list[str] = []
        for entry in versions[:version]:
            if entry.get("overwrite"):
                visible = list(entry["files"])
            else:
                visible = visible + list(entry["files"])
        files = sorted(visible)
    if not files:
        return spark.createDataFrame([], schema)
    missing = [f for f in files if not os.path.exists(os.path.join(path, f))]
    if missing:
        raise FileNotFoundError(
            f"version {version}: {len(missing)} file(s) reclaimed by vacuum"
        )
    return spark.read.schema(schema).json([os.path.join(path, f) for f in files])


def vacuum_warehouse(path: str) -> int:
    """Reclaim files no longer in the CURRENT view; returns the count.

    Truncates the version log to one synthetic overwrite entry (the
    current view): time travel before the vacuum point is gone, which
    is the same retention trade Delta's VACUUM makes. The manifest is
    rewritten first so a crash between manifest write and file
    deletion leaves only unreferenced orphans, never a broken view.
    """
    man = load_manifest(path)
    current = set(man["files"])
    man["versions"] = [
        {"files": sorted(current), "n_rows": man["n_rows"], "overwrite": True}
    ]
    with open(os.path.join(path, "_SUCCESS"), "w") as f:
        json.dump(man, f)
    removed = 0
    for f in os.listdir(path):
        if f.endswith(".jsonl") and f not in current:
            os.remove(os.path.join(path, f))
            removed += 1
    return removed


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
        man = load_manifest(self.path)
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
        # Append-mode loads MERGE into the standing manifest (previous
        # files stay visible); overwrite REPLACES the visible set
        # *logically* — superseded files stay on disk so earlier
        # versions remain readable (``read_warehouse(version=…)``)
        # until ``vacuum_warehouse`` reclaims them. Every commit
        # records a version entry: the load-boundary log IS the
        # time-travel log, carried in the same atomically-written
        # ``_SUCCESS`` object.
        if self.overwrite:
            man["files"] = sorted(kept)
            man["n_rows"] = total
        else:
            man["files"] = sorted(man["files"] + kept)
            man["n_rows"] += total
        man.setdefault("versions", []).append(
            {
                "files": sorted(kept),
                "n_rows": total,
                "overwrite": self.overwrite,
            }
        )
        with open(os.path.join(self.path, "_SUCCESS"), "w") as f:
            json.dump(man, f)

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

    def commit(self, messages, batchId: int) -> None:
        staging = os.path.join(self.path, "_staging")
        man = load_manifest(self.path)
        if batchId in man.get("batches", []):  # replayed epoch: drop, don't double-load
            self.abort(messages, batchId)
            return
        epoch_files, epoch_rows = [], 0
        for m in messages:
            if m is None:
                continue
            os.rename(
                os.path.join(staging, m.staged_name),
                os.path.join(self.path, m.staged_name),
            )
            epoch_files.append(m.staged_name)
            epoch_rows += m.n_rows
        man["files"] = sorted(man["files"] + epoch_files)
        man["n_rows"] += epoch_rows
        man["batches"] = sorted(man.get("batches", []) + [batchId])
        man.setdefault("versions", []).append(
            {
                "files": sorted(epoch_files),
                "n_rows": epoch_rows,
                "overwrite": False,
                "batch_id": batchId,
            }
        )
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


def warehouse_changes(
    spark, path: str, schema, from_version: int, to_version: int
):
    """Change-data feed from the version log: rows ADDED by loads in
    ``(from_version, to_version]`` — the incremental-consumer contract
    ("give me everything since the version I last processed") that
    pairs with ``read_warehouse(version=…)`` snapshots.

    Each version entry owns exactly the files its load published, so
    the feed is a file-list union — no data diffing. An overwrite
    entry inside the window contributes its files like any load (its
    *logical* deletions are visible to consumers as the snapshot
    difference; this feed is additions-only, the JSONL-warehouse
    analog of a Delta CDF restricted to inserts, which is the only
    change kind an append/overwrite loader produces).
    """
    man = load_manifest(path)
    versions = man.get("versions", [])
    if not 0 <= from_version <= len(versions) or not from_version <= to_version <= len(
        versions
    ):
        raise ValueError(
            f"window ({from_version}, {to_version}] out of range 0..{len(versions)}"
        )
    files = sorted(
        f
        for entry in versions[from_version:to_version]
        for f in entry["files"]
    )
    if not files:
        return spark.createDataFrame([], schema)
    missing = [f for f in files if not os.path.exists(os.path.join(path, f))]
    if missing:
        raise FileNotFoundError(
            f"{len(missing)} file(s) in the window reclaimed by vacuum"
        )
    return spark.read.schema(schema).json([os.path.join(path, f) for f in files])
