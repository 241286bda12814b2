#!/usr/bin/env python
"""sf10 scaling probe (round 17, VERDICT r16 task #1 — the single
highest-leverage item: every 100×-scale claim above sf1 was inference
from plan shape; this measures it).

Runs the three candidate-volume-driven shapes —
``llm_dedup_ngram_banded`` (banded SimHash candidates → exact verify;
its candidate volume DOUBLED with the round-16 8×16-band landing),
``llm_segment_dedup`` and ``evt_stream_stream_join`` (watermarked
interval join whose cost is state size) — at sf0.1 / sf1 / sf10
(5 k → 50 k → 500 k docs; 100 k → 1 M → 10 M events; key-strided
replicas from the same generator as sf1, so per-replica structure is
scale-invariant and candidate/pair volume should scale ×10 per step).

Records rows-in / rows-out / wall-time per (shape, scale) plus the
least-squares scaling exponent of time vs input size over the three
points.  Done-criterion from the VERDICT: exponent ≤ ~1.2 per shape,
or a named super-linear stage.

Timing protocol: one un-timed warmup per (shape, scale) (JVM/codegen/
file listing), then best-of-``reps`` timed runs — the bench's warm
convention, so numbers are comparable to BASELINE.md's columns.  Host
steal is sampled around the run (bench's noise probe) and recorded.

Usage::

    python tools/scale10_probe.py [--reps 2] [--out SCALE10_r17.json]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

SHAPES = {
    "llm_dedup_ngram_banded": "documents",
    "llm_segment_dedup": "documents",
    "evt_stream_stream_join": "events",
    # extended families (round 17, beyond the VERDICT's three): the
    # block-quadratic vector shape, the salted skew join over the
    # 60 M-row fact, and the broadcast star join
    "llm_embed_near_dup": "embeddings",
    "join_skew_stress": "lineitem",
    "join_multiway_star": "lineitem",
    "llm_sim_binary_hamming_batch": "embeddings",
    "evt_funnel_steps": "events",
    # batch 3: the native session-window agg and the certified-recall
    # banded-MinHash dedup pipeline (the e2e key: signatures → bands →
    # candidates → exact verify → connected components → keep-min)
    "evt_session": "events",
    "llm_dedup_minhash_e2e": "documents",
}

SCALES = [
    ("sf0.1", "/root/testdata/sf0.1", 1.0),
    ("sf1.0", ".scale/sf1.0", 10.0),
    ("sf10", ".scale/sf10", 100.0),
]


def _slope(xs: list[float], ys: list[float]) -> float:
    """Least-squares slope of log(y) on log(x)."""
    lx = [math.log(x) for x in xs]
    ly = [math.log(y) for y in ys]
    mx = sum(lx) / len(lx)
    my = sum(ly) / len(ly)
    num = sum((a - mx) * (b - my) for a, b in zip(lx, ly))
    den = sum((a - mx) ** 2 for a in lx)
    return num / den


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--out", default="SCALE10_r17.json")
    ap.add_argument("--shapes", default=",".join(SHAPES))
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    import bench
    from data_ingest_utils_spark.plans import QUERIES
    from data_ingest_utils_spark.session import get_session
    from data_ingest_utils_spark.sources.readers import load_table

    spark = get_session("dius-scale10-probe")
    shapes = [s for s in args.shapes.split(",") if s]

    steal_before = bench._loaded_steal_pct(5.0)
    out: dict = {
        "tool": "scale10_probe",
        "master": spark.conf.get("spark.master"),
        "reps": args.reps,
        "scales": {},
        "shapes": {},
    }

    rows_in: dict[str, dict[str, int]] = {}
    for label, sf, _ in SCALES:
        sf_dir = sf if os.path.isabs(sf) else os.path.join(repo, sf)
        counts = {
            t: load_table(spark, sf_dir, t).count()
            for t in sorted(set(SHAPES.values()))
        }
        rows_in[label] = counts
        out["scales"][label] = {"dir": sf, "rows": counts}

    for shape in shapes:
        table = SHAPES[shape]
        per_scale = {}
        for label, sf, _ in SCALES:
            sf_dir = sf if os.path.isabs(sf) else os.path.join(repo, sf)
            n_out = QUERIES[shape](spark, sf_dir).count()  # warm, un-timed
            times = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                QUERIES[shape](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                times.append(round(time.perf_counter() - t0, 3))
            per_scale[label] = {
                "rows_in": rows_in[label][table],
                "rows_out": n_out,
                "times_sec": times,
                "best_sec": min(times),
            }
            print(f"{shape} @ {label}: {times} s, {n_out} rows out",
                  file=sys.stderr)
        xs = [per_scale[lb]["rows_in"] for lb, _, _ in SCALES]
        ts = [per_scale[lb]["best_sec"] for lb, _, _ in SCALES]
        ro = [max(1, per_scale[lb]["rows_out"]) for lb, _, _ in SCALES]
        per_scale_exp = {
            "time_vs_rows_exponent": round(_slope(xs, ts), 3),
            # the last step is the one that extrapolates to 100 TB —
            # small scales carry fixed planning cost that flattens the
            # full-fit slope, so report the sf1→sf10 step too
            "time_exponent_sf1_to_sf10": round(
                math.log(ts[2] / ts[1]) / math.log(xs[2] / xs[1]), 3
            ),
            "rows_out_exponent": round(_slope(xs, ro), 3),
        }
        out["shapes"][shape] = {"per_scale": per_scale, **per_scale_exp}

    out["noise"] = {
        "steal_pct_before": steal_before,
        "steal_pct_after": bench._loaded_steal_pct(5.0),
    }
    with open(os.path.join(repo, args.out), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(
        {s: {k: v for k, v in d.items() if k != "per_scale"}
         for s, d in out["shapes"].items()} | {"noise": out["noise"]},
        indent=1,
    ))
    return 0


if __name__ == "__main__":
    sys.exit(main())
