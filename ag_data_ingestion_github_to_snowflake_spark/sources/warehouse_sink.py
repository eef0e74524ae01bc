"""Warehouse loader as a Spark 4 Python Data Source WRITER.

The reference's load step stages extracted JSON and has the warehouse
ingest it atomically (Snowflake ``PUT`` → ``COPY INTO``; reference
``README.md:285-291``). This sink reproduces that contract as a
first-class ``df.write.format("jsonl_warehouse")`` target with the
classic two-phase commit:

- **phase 1 (tasks, parallel)**: each task spools its partition to a
  uniquely-named file under a job-private ``<path>/_staging-<job>``
  prefix and returns the file name (and its staging dir) in its
  ``WriterCommitMessage``. A retried/speculative task just produces an
  orphan staging file — never a visible row.
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

import fcntl
import json
import os
import uuid
from contextlib import contextmanager
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
    # Absolute staging dir the file was spooled into. Spark
    # re-instantiates the pickled Python data source on executors, so
    # the task-side writer and the driver-side committer are DIFFERENT
    # objects with different job ids — the commit message must carry
    # everything the committer needs to find the staged file.
    staging_dir: str = ""


def _staging_dir(path: str, job_id: str) -> str:
    """Per-JOB staging prefix. A shared staging dir is a concurrency
    bug: job A's commit would sweep job B's staged-but-uncommitted
    files as "orphans". Keying the prefix by a job UUID (minted once on
    the driver, shipped to every task inside the pickled writer) makes
    stage→rename races between parallel loads impossible — each job
    renames only out of its own prefix. Object-store equivalent: a
    per-job stage path / Snowflake named stage."""
    return os.path.join(path, f"_staging-{job_id}")


@contextmanager
def _manifest_lock(path: str):
    """Exclusive commit lock for the table manifest.

    Concurrent committers (two jobs landing in one table — normal in a
    100 TB pipeline with parallel loaders) must not lose each other's
    version entries in a read-modify-write race. An exclusive ``flock``
    on a sidecar lockfile linearizes the commit critical section
    (re-read manifest → rename staged files → publish new manifest).
    On an object store the same contract is a conditional PUT (S3
    If-None-Match / GCS generation preconditions) or a Delta-style
    numbered commit log with create-if-absent claims."""
    lock = os.path.join(path, "_commit.lock")
    with open(lock, "a") as lf:
        fcntl.flock(lf, fcntl.LOCK_EX)
        try:
            yield
        finally:
            fcntl.flock(lf, fcntl.LOCK_UN)


def _write_manifest(path: str, man: dict) -> None:
    """Atomically publish the manifest: temp name + ``os.replace``
    (atomic on POSIX), so a concurrent reader sees the old manifest or
    the new one in full — never a torn ``_SUCCESS``."""
    tmp = os.path.join(path, f"_SUCCESS.tmp-{uuid.uuid4().hex}")
    with open(tmp, "w") as f:
        json.dump(man, f)
    os.replace(tmp, os.path.join(path, "_SUCCESS"))


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
    with _manifest_lock(path):
        man = load_manifest(path)
        current = set(man["files"])
        man["versions"] = [
            {
                "files": sorted(current),
                "n_rows": man["n_rows"],
                "overwrite": True,
            }
        ]
        _write_manifest(path, man)
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
        # Minted once on the driver; the pickled writer carries it to
        # every task, so all of this job's staged files land under one
        # job-private prefix (see _staging_dir).
        self.job_id = uuid.uuid4().hex

    def write(self, iterator) -> FileCommit:
        staging = _staging_dir(self.path, self.job_id)
        os.makedirs(staging, exist_ok=True)
        name = f"part-{uuid.uuid4().hex}.jsonl"
        n = 0
        with open(os.path.join(staging, name), "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return FileCommit(staged_name=name, n_rows=n, staging_dir=staging)

    def commit(self, messages) -> None:
        # Critical section: manifest re-read, renames, and publish are
        # linearized across concurrent jobs so interleaved commits give
        # a linear version log and readers see either-or, never torn.
        with _manifest_lock(self.path):
            man = load_manifest(self.path)
            kept, total = [], 0
            for m in messages:
                src_dir = m.staging_dir or _staging_dir(self.path, self.job_id)
                os.rename(
                    os.path.join(src_dir, m.staged_name),
                    os.path.join(self.path, m.staged_name),
                )
                kept.append(m.staged_name)
                total += m.n_rows
            # Append-mode loads MERGE into the standing manifest
            # (previous files stay visible); overwrite REPLACES the
            # visible set *logically* — superseded files stay on disk
            # so earlier versions remain readable
            # (``read_warehouse(version=…)``) until
            # ``vacuum_warehouse`` reclaims them. Every commit records
            # a version entry: the load-boundary log IS the
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
            _write_manifest(self.path, man)
        # Orphans from retried/speculative tasks die with THIS job's
        # staging dirs (the ones its commit messages reference, plus
        # the driver-side writer's own); other jobs' staging prefixes
        # are untouched.
        own = {m.staging_dir for m in messages if m.staging_dir}
        own.add(_staging_dir(self.path, self.job_id))
        for d in own:
            if os.path.isdir(d):
                for f in os.listdir(d):
                    os.remove(os.path.join(d, f))
                os.rmdir(d)

    def abort(self, messages) -> None:
        staging = _staging_dir(self.path, self.job_id)
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
        # One job id per streaming query run: every epoch's tasks stage
        # under the same query-private prefix (the pickled writer is
        # reused across micro-batches), isolated from other writers.
        self.job_id = uuid.uuid4().hex

    def write(self, iterator) -> FileCommit:
        w = JsonlWarehouseWriter({"path": self.path}, overwrite=False)
        w.job_id = self.job_id
        return w.write(iterator)

    def commit(self, messages, batchId: int) -> None:
        with _manifest_lock(self.path):
            man = load_manifest(self.path)
            # Replay check INSIDE the lock: a replayed epoch racing a
            # live committer must still be detected before any rename.
            if batchId in man.get("batches", []):
                replayed = True
            else:
                replayed = False
                epoch_files, epoch_rows = [], 0
                for m in messages:
                    if m is None:
                        continue
                    src_dir = m.staging_dir or _staging_dir(
                        self.path, self.job_id
                    )
                    os.rename(
                        os.path.join(src_dir, m.staged_name),
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
                _write_manifest(self.path, man)
        if replayed:  # replayed epoch: drop staged output, don't double-load
            self.abort(messages, batchId)

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is None:
                continue
            src_dir = m.staging_dir or _staging_dir(self.path, self.job_id)
            p = os.path.join(src_dir, m.staged_name)
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
