"""Watermark/offset state (A4/A8, /root/reference/src/
extract_github_data.py:164-286).

The reference persists a single integer high-watermark to
file/env/S3/DynamoDB after every row. Spark-first equivalents:

- batch-incremental jobs: a one-row state table (this module) read
  before the run and atomically replaced after the sink commits —
  per-batch, not per-row, so the sink must be idempotent on ``id``
  (MERGE/dropDuplicates), which pipeline.github provides.
- streaming: Structured Streaming's checkpointLocation subsumes this
  entirely (streaming/ module).

Backends: in-memory (tests), local file (the reference's
``last_repo_id.txt``), and any fsspec-style path via the file backend —
an S3 object behaves identically through a mounted/therein path.
"""

from __future__ import annotations

import os
from dataclasses import dataclass


class WatermarkStore:
    """Interface: get() -> int watermark; set(int) persists it."""

    def get(self) -> int:
        raise NotImplementedError

    def set(self, value: int) -> None:
        raise NotImplementedError


@dataclass
class MemoryWatermark(WatermarkStore):
    value: int = 0

    def get(self) -> int:
        return self.value

    def set(self, value: int) -> None:
        self.value = value


@dataclass
class FileWatermark(WatermarkStore):
    """File-backed watermark (the reference's last_repo_id.txt,
    :238-267). Atomic via write-temp-then-rename."""

    path: str
    default: int = 0

    def get(self) -> int:
        try:
            with open(self.path) as f:
                return int(f.read().strip())
        except (OSError, ValueError):
            return self.default

    def set(self, value: int) -> None:
        tmp = f"{self.path}.tmp"
        with open(tmp, "w") as f:
            f.write(str(int(value)))
        os.replace(tmp, self.path)
