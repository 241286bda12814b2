#!/usr/bin/env python
"""In-window ordering A/B for ``join_skew_stress`` (VERDICT r13 #2).

The committed r13 gated-bench median for join_skew_stress drifted to
2.11 s (vs 1.73 s in r12 and a 1.3-1.7 s standalone warm floor), the
only HEAVY_SF1 shape to regress round-over-round.  Inside the gated
window the sf1 loop runs shapes in HEAVY_SF1 order, so join_skew_stress
executes IMMEDIATELY after llm_dedup_ngram_banded — the heaviest shape
in the window (~7 s, a banded self-join that churns shuffle blocks and
executor heap).  This tool isolates that ordering effect in one warm
session at the same scale dir with the same noop-sink timing protocol:

- ``standalone``  — join_skew_stress back-to-back (the warm floor)
- ``after_light`` — preceded by evt_session (a light shape) each rep
- ``after_banded`` — preceded by llm_dedup_ngram_banded each rep
  (exactly the bench window's adjacency)

Each arm reports per-rep wall times, median, and the steal-jiffy delta
across the arm, so a noisy host window is self-evident in the artifact.
If after_banded ≫ standalone while after_light ≈ standalone, the r13
drift is window interference from the preceding shape, not a plan
regression — the documented outcome lands in BASELINE.md either way.

Usage::

    python tools/skew_order_ab.py [--sf .scale/sf1.0] [--reps 5]
                                  [--out SKEWAB_r14.json]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time


def _steal_total() -> tuple[int, int] | None:
    try:
        with open("/proc/stat") as f:
            vals = [int(x) for x in f.readline().split()[1:]]
        return vals[7] if len(vals) > 7 else 0, sum(vals[:8])
    except (OSError, ValueError, IndexError):
        return None


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=".scale/sf1.0")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--out", default="SKEWAB_r14.json")
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from data_ingest_utils_spark.plans import QUERIES
    from data_ingest_utils_spark.session import get_session

    spark = get_session("dius-skew-ab")

    def run(key: str) -> float:
        t0 = time.perf_counter()
        QUERIES[key](spark, args.sf).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # Warmup: every shape involved, un-timed (scan listing + codegen +
    # the banded key's fingerprint caches).
    for key in ("evt_session", "llm_dedup_ngram_banded", "join_skew_stress"):
        t = run(key)
        print(f"warmup {key}: {t:.2f}s", file=sys.stderr)

    arms = {
        "standalone": [],
        "after_light": [],
        "after_banded": [],
    }
    evidence = {}
    for arm, pre in (
        ("standalone", None),
        ("after_light", "evt_session"),
        ("after_banded", "llm_dedup_ngram_banded"),
    ):
        j0 = _steal_total()
        for rep in range(args.reps):
            pre_t = run(pre) if pre else None
            t = run("join_skew_stress")
            arms[arm].append(round(t, 4))
            msg = f"{arm} rep {rep + 1}: skew {t:.3f}s"
            if pre_t is not None:
                msg += f" (pre {pre}: {pre_t:.2f}s)"
            print(msg, file=sys.stderr)
        j1 = _steal_total()
        evidence[arm] = {
            "reps": arms[arm],
            "median": round(statistics.median(arms[arm]), 4),
            "best": round(min(arms[arm]), 4),
            "steal_pct": (
                round(100.0 * (j1[0] - j0[0]) / max(1, j1[1] - j0[1]), 3)
                if j0 and j1
                else None
            ),
        }

    out = {
        "tool": "skew_order_ab",
        "sf_dir": args.sf,
        "master": spark.conf.get("spark.master"),
        "arms": evidence,
        "verdict": None,
    }
    med = {a: evidence[a]["median"] for a in evidence}
    banded_ratio = med["after_banded"] / max(1e-9, med["standalone"])
    light_ratio = med["after_light"] / max(1e-9, med["standalone"])
    out["after_banded_vs_standalone"] = round(banded_ratio, 3)
    out["after_light_vs_standalone"] = round(light_ratio, 3)
    # Three outcomes (code-review r14): banded-specific interference,
    # ANY-predecessor interference (both orderings elevated — a host
    # or session effect, not the banded shape's doing), or none.
    if banded_ratio >= 1.15 and light_ratio < 1.15:
        out["verdict"] = "ordering-interference"
    elif banded_ratio >= 1.15 and light_ratio >= 1.15:
        out["verdict"] = "generic-predecessor-interference"
    else:
        out["verdict"] = "no-ordering-effect"
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
