#!/usr/bin/env python
"""Compare two registry-sweep artifacts per key.

Motivation (round 10): the local[*] and local-cluster[2,8,…] sweeps
both pass 221/221, but a key whose wall time balloons ONLY on real
executor JVMs is hiding a distributed bottleneck (driver round-trips,
missing broadcast, per-task Python-worker startup) that a local
master's shared-JVM shortcuts mask.  This tool reads the ``timings``
field of two sweep JSON lines and prints the keys whose ratio exceeds
a threshold, plus the aggregate drift.

Usage::

    python tools/sweep_compare.py LOCAL.json CLUSTER.json [--ratio 3.0]
                                  [--min-sec 1.0]

Keys faster than ``--min-sec`` in BOTH runs are ignored — sub-second
keys are planning-dominated and their ratios are noise.
"""

from __future__ import annotations

import argparse
import json
import sys


def _load_line(path: str) -> dict:
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                return json.loads(line)
    raise ValueError(f"{path}: no JSON line found")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("baseline")
    ap.add_argument("candidate")
    ap.add_argument("--ratio", type=float, default=3.0)
    ap.add_argument("--min-sec", type=float, default=1.0)
    args = ap.parse_args()

    base = _load_line(args.baseline)
    cand = _load_line(args.candidate)
    bt, ct = base.get("timings"), cand.get("timings")
    if not bt or not ct:
        print("both artifacts need the 'timings' field (sweeps from r10+)", file=sys.stderr)
        return 2

    shared = sorted(set(bt) & set(ct))
    flagged = []
    for k in shared:
        if max(bt[k], ct[k]) < args.min_sec:
            continue
        ratio = ct[k] / bt[k] if bt[k] > 0 else float("inf")
        if ratio >= args.ratio or ratio <= 1.0 / args.ratio:
            flagged.append({"key": k, "base_sec": bt[k], "cand_sec": ct[k],
                            "ratio": round(ratio, 2)})
    flagged.sort(key=lambda r: -max(r["ratio"], 1.0 / r["ratio"]))

    payload = {
        "base": {"master": base.get("master", "local[*]"), "total_sec": base["total_sec"]},
        "cand": {"master": cand.get("master", "local[*]"), "total_sec": cand["total_sec"]},
        "n_shared": len(shared),
        "ratio_threshold": args.ratio,
        "min_sec": args.min_sec,
        "n_flagged": len(flagged),
        "flagged": flagged,
    }
    print(json.dumps(payload, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
