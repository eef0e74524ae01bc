"""Shared fixture-staging helpers: collision-free temp dirs + atomic
staleness markers.

Several queries stage derived copies of a fixture table (partitioned
rewrite, streaming source directory, JSON micro-batches) in a temp dir
reused across calls. Two requirements the naive pattern missed:

- The dir key must include the WHOLE dataset path, not just its
  basename — two roots ending in ``sf0.01`` would otherwise collide on
  the same stage and silently serve each other's data.
- The marker that declares "staging finished" must appear atomically
  (write temp + rename), so a concurrent reader never observes the
  marker before the write completes mid-sequence.

Concurrent stagers of the SAME dataset may still both rebuild
(last-rename wins — the content is identical, so either outcome is
correct); the atomic marker only guarantees a reader never trusts a
half-staged dir.
"""

from __future__ import annotations

import hashlib
import os
import tempfile


def stage_dir(prefix: str, sf: str) -> str:
    """Deterministic per-dataset temp dir: ``{tmp}/{prefix}_{base}_{h8}``
    where ``h8`` is 8 hex chars of the absolute normalized path — the
    basename keeps it readable, the hash makes it collision-free."""
    norm = os.path.abspath(os.path.normpath(sf))
    h8 = hashlib.sha256(norm.encode()).hexdigest()[:8]
    return os.path.join(
        tempfile.gettempdir(), f"{prefix}_{os.path.basename(norm)}_{h8}"
    )


def write_marker(marker: str, text: str = "staged\n") -> None:
    """Write the staleness marker atomically: temp file in the same
    directory, then ``os.replace`` (atomic on POSIX)."""
    fd, tmp = tempfile.mkstemp(
        dir=os.path.dirname(marker), prefix="._marker_"
    )
    try:
        with os.fdopen(fd, "w") as fh:
            fh.write(text)
        os.replace(tmp, marker)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise
