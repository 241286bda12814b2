#!/usr/bin/env python
"""Collision-level-verify A/B for ``ngram_jaccard_banded`` under a
REAL multi-executor master (VERDICT r13 #5 / builder lead (a)).

The round-13 prototype restructures the banded-Jaccard pipeline so the
per-doc shingle-hash ARRAYS ride the band explode+shuffle (attached
once, before banding) and every band collision is scored immediately,
deduping (distinct) only pairs that SURVIVE the threshold — versus the
landed shape, which dedups candidate pairs first and then re-shuffles
the pair stream through two array-attach joins.  Trade-off:

- landed:    dedup early (small pair set), but 2 extra attach joins
             re-shuffling the pair stream against the hv table;
- prototype: zero attach joins (arrays are already on the collision
             rows), but the band shuffle carries each doc's array 4×
             and multi-band collisions are scored redundantly.

On ``local[*]`` the prototype measured SLOWER (6.8 vs 5.6 s, round 13
— shuffle "network" is memcpy, so the attach joins are cheap and the
4× array volume dominates) and was rightly not landed.  This tool runs
the same A/B under ``local-cluster[2,8,4096]`` — separate executor
JVMs, netty shuffle over loopback, the sandbox's closest thing to a
real cluster where shuffled bytes cost real serialization — and lands
the decision either way as ``ABCHECK_r14.json``.  Both arms must agree
row-for-row (the prototype is byte-identical by construction).

Usage::

    python tools/collision_verify_ab.py [--sf .scale/sf1.0]
        [--cluster 2,8,4096] [--reps 3] [--out ABCHECK_r14.json]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def prototype_collision_verify(
    docs: DataFrame, n: int, threshold: float, signatures: int = 2
) -> DataFrame:
    """Arrays-ride-the-band-shuffle formulation (round-13 prototype).

    Round 17 (VERDICT r16 "what's wrong" #2): the band explode is no
    longer 4-band hardcoded — it picks up every ``band*`` column the
    requested signature count emits, so the prototype arm A/Bs
    against the PRODUCTION geometry (signatures=2 → 8×16 bands since
    round 16) instead of the legacy signatures=1 shape."""
    from data_ingest_utils_spark.operators import dedup as dd

    sig = dd.simhash64(
        docs, "text", "doc_id", unit="token", n=n, signatures=signatures
    ).localCheckpoint(eager=True)
    band_cols = sorted(
        (c for c in sig.columns if c.startswith("band")),
        key=lambda c: int(c[4:]),
    )
    hv, _ = dd._shingle_hash_arrays(docs, n, "doc_id")
    both = sig.join(hv, "doc_id")
    bands = both.select(
        "doc_id",
        "hv",
        F.posexplode(
            F.array(*[F.col(c) for c in band_cols])
        ).alias("band_idx", "band_val"),
    )
    a = bands.select(
        F.col("doc_id").alias("doc_a"), F.col("hv").alias("hva"),
        "band_idx", "band_val",
    )
    b = bands.select(
        F.col("doc_id").alias("doc_b"), F.col("hv").alias("hvb"),
        "band_idx", "band_val",
    )
    coll = a.join(b, ["band_idx", "band_val"]).filter(F.col("doc_a") < F.col("doc_b"))
    inter = F.size(F.array_intersect("hva", "hvb"))
    return (
        coll.withColumn("inter", inter)
        .filter(F.col("inter") > 0)
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter").cast("double")
                / (F.size("hva") + F.size("hvb") - F.col("inter")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
        .distinct()
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=".scale/sf1.0")
    ap.add_argument("--cluster", default="2,8,4096")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default="ABCHECK_r14.json")
    ap.add_argument("--masters", default="local,cluster",
                    help="comma subset of {local,cluster}")
    ap.add_argument("--signatures", type=int, default=2,
                    help="SimHash signature count for BOTH arms "
                         "(2 = the production 8x16-band geometry "
                         "since round 16; 1 = the legacy 4x16 pin "
                         "the r14 artifact was measured with)")
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from pyspark.sql import SparkSession

    from data_ingest_utils_spark.operators.dedup import ngram_jaccard_banded
    from data_ingest_utils_spark.session import get_session
    from data_ingest_utils_spark.sources.readers import load_table

    n, threshold = 3, 0.5
    result: dict = {"tool": "collision_verify_ab", "sf_dir": args.sf,
                    "reps": args.reps, "masters": {}}

    masters = []
    if "local" in args.masters:
        masters.append(("local", None))
    if "cluster" in args.masters:
        masters.append(("cluster", f"local-cluster[{args.cluster}]"))

    for label, master in masters:
        active = SparkSession.getActiveSession()
        if active is not None:
            active.stop()
        spark = get_session(f"dius-collision-ab-{label}", master=master)
        actual_master = spark.conf.get("spark.master")
        print(f"=== {label}: {actual_master}", file=sys.stderr)
        docs = load_table(spark, args.sf, "documents")
        docs.count()

        arms: dict = {}
        rows_by_arm: dict[str, list] = {}
        for arm, build in (
            # Both arms run the SAME signature count (default 2 — the
            # production 8×16-band geometry since round 16; round 17
            # generalized the prototype's band explode away from its
            # 4-band hardcoding), so the A/B isolates the VERIFY
            # SHAPE at the geometry production actually uses.  Band
            # geometry itself is A/B'd by tools/simhash_bands_ab.py.
            ("landed", lambda: ngram_jaccard_banded(
                docs, n=n, threshold=threshold,
                signatures=args.signatures)),
            ("prototype", lambda: prototype_collision_verify(
                docs, n, threshold, signatures=args.signatures)),
        ):
            build().write.format("noop").mode("overwrite").save()  # warm
            times = []
            for _ in range(args.reps):
                df = build()
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                times.append(round(time.perf_counter() - t0, 3))
            rows_by_arm[arm] = sorted(
                (r.doc_a, r.doc_b, r.jaccard) for r in build().collect()
            )
            arms[arm] = {
                "times_sec": times,
                "median_sec": round(statistics.median(times), 3),
                "best_sec": min(times),
                "n_rows": len(rows_by_arm[arm]),
            }
            print(f"{label}/{arm}: {times} s ({arms[arm]['n_rows']} rows)",
                  file=sys.stderr)
        identical = rows_by_arm["landed"] == rows_by_arm["prototype"]
        ratio = arms["prototype"]["median_sec"] / max(
            1e-9, arms["landed"]["median_sec"]
        )
        result["masters"][label] = {
            "master": actual_master,
            "arms": arms,
            "rows_identical": identical,
            "prototype_vs_landed": round(ratio, 3),
        }

    verdicts = {
        lb: m["prototype_vs_landed"] for lb, m in result["masters"].items()
    }
    inverted = verdicts.get("cluster", 99) < 0.9
    result["decision"] = (
        "land-prototype" if inverted and all(
            m["rows_identical"] for m in result["masters"].values()
        ) else "keep-landed"
    )
    with open(os.path.join(repo, args.out), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
