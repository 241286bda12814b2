#!/usr/bin/env python
"""State-store provider A/B on the stream-stream interval join
(round 17 optimization, OPTIMIZATION_r17.md "Not yet optimized" #1 —
MEASUREMENT ONLY; the provider lands as a default only if the drain
wall-time drops materially, else this records the result like the
MinHash-kernel and SHUFFLE_HASH negatives).

After the round-17 no-data-batch skip, `evt_stream_stream_join`'s
remaining cost is ONE fed micro-batch: planning + the join's 4×8
state-store commits (two sides × two store types per partition).  The
candidate lever is `spark.sql.streaming.stateStore.providerClass`:

- default `HDFSBackedStateStoreProvider` — in-heap map per store,
  snapshot/delta files to the checkpoint dir;
- `RocksDBStateStoreProvider` — off-heap RocksDB per store, the
  provider large-state deployments run (bounded executor heap at
  100 TB state; changelog checkpointing).

Both providers persist the SAME logical state; the memory-sink rows
must be identical (asserted).  The conf is read at query START, so the
A/B scopes it around each whole-key invocation via the runner's
refcounted `_session_conf_scope`; arms alternate rep-by-rep in one
session (interleaved same-session protocol, BASELINE.md noise doc).

Usage::

    python tools/statestore_ab.py [--sf .scale/sf1.0] [--reps 5]
        [--out STATESTORE_AB_r17.json]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time


PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"
ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=".scale/sf1.0")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--out", default="STATESTORE_AB_r17.json")
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from data_ingest_utils_spark.plans import QUERIES
    from data_ingest_utils_spark.session import get_session
    from data_ingest_utils_spark.streaming.runner import _session_conf_scope

    spark = get_session("dius-statestore-ab")
    sf_dir = args.sf if os.path.isabs(args.sf) else os.path.join(repo, args.sf)
    key = "evt_stream_stream_join"

    default_provider = spark.conf.get(PROVIDER_KEY)
    arms = {"hdfs_backed": default_provider, "rocksdb": ROCKSDB}

    # Un-timed warmup per arm: JVM/codegen + staged-source cache build
    # (first invocation may pay the fixture staging; neither arm's
    # timed reps should).
    rows_by_arm: dict[str, list] = {}
    for arm, provider in arms.items():
        with _session_conf_scope(spark, PROVIDER_KEY, provider):
            df = QUERIES[key](spark, sf_dir)
        rows_by_arm[arm] = sorted(tuple(r) for r in df.collect())

    times: dict[str, list[float]] = {a: [] for a in arms}
    for rep in range(args.reps):
        for arm, provider in arms.items():  # interleaved, alternating
            t0 = time.perf_counter()
            with _session_conf_scope(spark, PROVIDER_KEY, provider):
                QUERIES[key](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            dt = time.perf_counter() - t0
            times[arm].append(dt)
            print(f"ab: rep {rep + 1} {arm} = {dt:.3f}s", file=sys.stderr)

    identical = rows_by_arm["hdfs_backed"] == rows_by_arm["rocksdb"]
    out = {
        "key": key,
        "sf_dir": sf_dir,
        "reps": args.reps,
        "rows_identical": identical,
        "n_rows": len(rows_by_arm["hdfs_backed"]),
        "arms": {
            arm: {
                "provider": arms[arm],
                "reps_s": [round(t, 4) for t in times[arm]],
                "median_s": round(statistics.median(times[arm]), 4),
                "best_s": round(min(times[arm]), 4),
            }
            for arm in arms
        },
        "conf_restored": spark.conf.get(PROVIDER_KEY) == default_provider,
    }
    with open(os.path.join(repo, args.out), "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(json.dumps(out))
    return 0 if identical else 1


if __name__ == "__main__":
    sys.exit(main())
