"""Archive the current bench line as this round's in-repo record.

The driver's ``BENCH_r{N}.json`` artifact truncates stdout tails (it
cut the bench line mid-JSON in r2 and r3), so the repo keeps its own
full copy per round: ``bench_rounds/BENCH_r{NN}.local.json``, the file
``tools/bench_regress.py`` prefers when both exist. Run this after the
final ``bench.py`` of a round:

    python bench.py && python tools/snapshot_bench.py 4
"""

from __future__ import annotations

import json
import os
import shutil
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    if len(sys.argv) != 2:
        raise SystemExit("usage: python tools/snapshot_bench.py <round_number>")
    rnd = int(sys.argv[1])
    # r9: bench.py's stdout line went compact (headline map only) so
    # the driver's tail-capture parses it; the full per-query map now
    # lives in bench_full_latest.local.json — archive that one.
    src = os.path.join(ROOT, "bench_full_latest.local.json")
    if not os.path.exists(src):
        src = os.path.join(ROOT, "bench_latest.local.json")
    with open(src) as f:
        line = json.load(f)
    if line.get("sf") != 0.1:
        raise SystemExit(
            f"refusing to archive a non-sf0.1 line (sf={line.get('sf')}): "
            "re-run bench.py at the default SPARK_GRAFT_SF_DIR first"
        )
    os.makedirs(os.path.join(ROOT, "bench_rounds"), exist_ok=True)
    dst = os.path.join(ROOT, "bench_rounds", f"BENCH_r{rnd:02d}.local.json")
    shutil.copy(src, dst)
    print(f"archived {line['value']}s ({len(line.get('queries_full', {}))} "
          f"queries) -> {os.path.relpath(dst, ROOT)}")


if __name__ == "__main__":
    main()
