"""Round-over-round bench regression diff.

Usage::

    python tools/bench_regress.py BENCH_r01.json BENCH_r02.json [--max-ratio 2.0]

Accepts either the raw one-line JSON that ``bench.py`` prints or the
driver's ``BENCH_r{N}.json`` wrapper (which embeds that line at the end
of its ``tail`` field). Compares per-query times (``queries_full`` when
present, else ``queries``) and exits non-zero if any query shared by
both files regressed by more than ``--max-ratio`` x, so a CI step (or
the next round's first command) can machine-detect slowdowns.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def resolve(path: str) -> str:
    """Prefer the in-repo per-round line over the driver artifact.

    The driver's ``BENCH_r{N}.json`` keeps only a stdout tail and has
    truncated the bench line mid-JSON two rounds running; the repo
    archives the full line per round under ``bench_rounds/`` (written
    by ``tools/snapshot_bench.py`` at end of round). A bare round ref
    (``r3`` / ``r03``) resolves to that archive directly, so
    ``python tools/bench_regress.py r3 r4`` reproduces any
    round-over-round comparison from persisted lines alone.
    """
    m = re.fullmatch(r"r0?(\d+)", path)
    if m:
        path = os.path.join(ROOT, f"BENCH_r{int(m.group(1)):02d}.json")
    m = re.search(r"BENCH_r(\d+)\.json$", path)
    if m:
        local = os.path.join(
            ROOT, "bench_rounds", f"BENCH_r{int(m.group(1)):02d}.local.json"
        )
        if os.path.exists(local):
            print(f"note: using in-repo line {os.path.relpath(local, ROOT)} "
                  f"for {os.path.basename(path)}")
            return local
    return path


def load_bench(path: str) -> dict:
    """Extract the bench JSON object from a raw line or driver wrapper.

    The driver wrapper keeps only the last N bytes of stdout in its
    ``tail`` field, which can cut the bench line mid-object (BENCH_r02
    did exactly this). When no complete JSON line survives, fall back
    to a regex pair-scan over the tail: every ``"name": float`` pair
    is a per-query timing, so a truncated artifact still yields a
    usable (partial) per-query dict instead of an error.
    """
    with open(path) as f:
        obj = json.load(f)
    if "queries" in obj or "queries_full" in obj:
        return obj
    # Driver wrapper: the bench line is the last JSON object in `tail`.
    tail = obj.get("tail", "")
    for line in reversed(tail.splitlines()):
        line = line.strip().lstrip("\r")
        if line.startswith("{") and '"metric"' in line:
            return json.loads(line)
    pairs = re.findall(r'"([A-Za-z0-9_]+)":\s*([0-9]+\.[0-9]+)', tail)
    timings = {
        name: float(val)
        for name, val in pairs
        if name not in ("value", "full_total", "sf")
    }
    if timings:
        return {
            "metric": "recovered_from_truncated_tail",
            "value": None,
            "queries_full": timings,
            "truncated": True,
        }
    raise ValueError(f"{path}: no bench JSON line found")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("baseline")
    ap.add_argument("current")
    ap.add_argument("--max-ratio", type=float, default=2.0)
    ap.add_argument(
        "--min-sec",
        type=float,
        default=0.2,
        help="ignore queries faster than this in BOTH files (timer noise)",
    )
    args = ap.parse_args()

    args.baseline = resolve(args.baseline)
    args.current = resolve(args.current)
    base = load_bench(args.baseline)
    cur = load_bench(args.current)
    bq = base.get("queries_full") or base.get("queries") or {}
    cq = cur.get("queries_full") or cur.get("queries") or {}

    shared = sorted(set(bq) & set(cq))
    regressed: list[tuple[str, float, float, float]] = []
    for name in shared:
        b, c = bq[name], cq[name]
        if max(b, c) < args.min_sec:
            continue
        ratio = c / b if b > 0 else float("inf")
        if ratio > args.max_ratio:
            regressed.append((name, b, c, ratio))

    print(f"baseline: {args.baseline}  total={base.get('value')}s ({len(bq)} queries)")
    print(f"current:  {args.current}  total={cur.get('value')}s ({len(cq)} queries)")
    print(f"shared queries: {len(shared)}; new: {len(set(cq) - set(bq))}; "
          f"dropped: {len(set(bq) - set(cq))}")
    # Calibration-lane attribution (VERDICT r10 item 3): when every
    # query moved together, the lane that moved WITH them names the
    # drift axis — cpu (frequency/thermal), io (fixture page cache),
    # arrow (Python-worker/Arrow lane), shuffle (disk/spill/co-tenant).
    lanes = [
        ("cpu", "calibration_sec"),
        ("io", "calibration_io_sec"),
        ("arrow", "calibration_arrow_sec"),
        ("shuffle", "calibration_shuffle_sec"),
    ]
    lane_bits = []
    for tag, key in lanes:
        b, c = base.get(key), cur.get(key)
        if b and c:
            lane_bits.append(f"{tag} {b:.3f}->{c:.3f} ({c / b:.2f}x)")
        elif c:
            lane_bits.append(f"{tag} n/a->{c:.3f}")
    if lane_bits:
        print("calibration lanes: " + "; ".join(lane_bits))
    if regressed:
        print(f"\nREGRESSIONS (> {args.max_ratio}x):")
        for name, b, c, ratio in sorted(regressed, key=lambda r: -r[3]):
            print(f"  {name}: {b:.3f}s -> {c:.3f}s ({ratio:.2f}x)")
        return 1
    print(f"\nno query regressed beyond {args.max_ratio}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
