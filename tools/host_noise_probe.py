#!/usr/bin/env python
"""Host-noise probe: measure CPU steal UNDER LOAD, not at idle.

Round-11 finding (BASELINE.md): this VM's steal is load-correlated —
~0% idle, 5-13% under a full 32-way spin in bad windows — so an idle
steal reading says nothing about whether a bench run will be robbed.
This probe spins every core for ``--seconds`` and reports the steal
percentage over exactly that window.  Protocol: run it before a bench
whose numbers you intend to commit; ≳2% means wait for a quieter
window (or mark the artifact's ``noise`` object accordingly — bench.py
embeds the same evidence per-run).

Usage::

    python tools/host_noise_probe.py [--seconds 15] [--procs N]

Prints one JSON line: {"steal_pct": float, "seconds": int, "procs": N}.
Exit code 0 if steal < 2%, 1 otherwise — scriptable as a gate.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import sys
import time


def _spin(stop_t: float) -> None:
    x = 0
    while time.time() < stop_t:
        x += 1


def _jiffies() -> tuple[int, int]:
    vals = [int(x) for x in open("/proc/stat").readline().split()[1:]]
    steal = vals[7] if len(vals) > 7 else 0
    # fields 8+ (guest, guest_nice) are already folded into user/nice
    # by the kernel — summing them double-counts guest time and
    # deflates steal_pct on guest-reporting hosts (ADVICE r11)
    return steal, sum(vals[:8])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=int, default=15)
    ap.add_argument("--procs", type=int, default=os.cpu_count() or 8)
    ap.add_argument(
        "--threshold", type=float, default=2.0,
        help="steal_pct above this exits 1 (noisy window)",
    )
    args = ap.parse_args()

    stop = time.time() + args.seconds
    procs = [mp.Process(target=_spin, args=(stop,)) for _ in range(args.procs)]
    s0, t0 = _jiffies()
    for p in procs:
        p.start()
    for p in procs:
        p.join()
    s1, t1 = _jiffies()
    steal_pct = round(100.0 * (s1 - s0) / max(1, t1 - t0), 2)
    print(json.dumps({"steal_pct": steal_pct, "seconds": args.seconds, "procs": args.procs}))
    return 0 if steal_pct < args.threshold else 1


if __name__ == "__main__":
    sys.exit(main())
