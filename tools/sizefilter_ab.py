#!/usr/bin/env python
"""Lossless size-prefilter A/B on the banded exact-verify stage
(round 17, VERDICT r16 task #4 — MEASUREMENT ONLY; the dial lands as
the production default only if the verify-stage wall-time drops
≥ 10%, else this records the negative result like the r16 Hamming
A/B).

The filter: for exact Jaccard ≥ τ over the two docs' distinct-shingle
sets, ``|A∩B| ≤ min(|A|,|B|)`` and ``|A∪B| ≥ max(|A|,|B|)`` force
``min ≥ τ·max`` — two integer feature counts per side, ZERO recall
risk by construction (unlike ``hamming_max``, whose cut is
probabilistic).  The counts are ``size(hv)`` off the verify stage's
already-materialized array checkpoint (no extra tokenize pass) and
ride the band explode as one extra int per row; the cut applies
before the pair ``distinct`` and the array-attach joins.

Measured per arm (landed default vs ``size_prefilter=True``):

- candidate-pair volume reaching the verify stage (its cost driver);
- full-key wall time (candidates + exact verify), best-of-``reps``;
- output rows — MUST be identical (losslessness is a theorem, this
  asserts the implementation);
- recall vs the exact-verify reference (must be bit-unchanged).

Usage::

    python tools/sizefilter_ab.py [--sf /root/testdata/sf0.1]
        [--reps 3] [--out SIZEFILTER_AB_r17.json]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--threshold", type=float, default=0.5)
    ap.add_argument("--out", default="SIZEFILTER_AB_r17.json")
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from data_ingest_utils_spark.operators.dedup import (
        _shingle_hash_arrays,
        ngram_jaccard_banded,
        simhash_band_candidates,
    )
    from data_ingest_utils_spark.plans import QUERIES
    from data_ingest_utils_spark.session import get_session
    from data_ingest_utils_spark.sources.readers import load_table
    from pyspark.sql import functions as F

    spark = get_session("dius-sizefilter-ab")
    sf_dir = args.sf if os.path.isabs(args.sf) else os.path.join(repo, args.sf)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    docs.count()  # warm the scan

    exact = {
        (r.doc_a, r.doc_b)
        for r in QUERIES["llm_dedup_near_exactverify"](spark, sf_dir).collect()
    }

    # Candidate volume per arm (the verify stage's cost driver).
    hv, _ = _shingle_hash_arrays(docs, 3, "doc_id")
    sizes = hv.select("doc_id", F.size("hv").alias("_n"))
    n_cand_landed = simhash_band_candidates(docs).count()
    n_cand_filtered = simhash_band_candidates(
        docs, size_frame=sizes, size_threshold=args.threshold
    ).count()

    arms: dict = {}
    rows_by_arm: dict[str, list] = {}
    for name, build in (
        ("landed", lambda: ngram_jaccard_banded(
            docs, threshold=args.threshold)),
        ("size_prefilter", lambda: ngram_jaccard_banded(
            docs, threshold=args.threshold, size_prefilter=True)),
    ):
        build().write.format("noop").mode("overwrite").save()  # warm
        times = []
        for _ in range(args.reps):
            df = build()
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
        rows = sorted((r.doc_a, r.doc_b, r.jaccard) for r in build().collect())
        rows_by_arm[name] = rows
        got = {(a, b) for a, b, _ in rows}
        hit = len(exact & got)
        arms[name] = {
            "times_sec": times,
            "median_sec": round(statistics.median(times), 3),
            "best_sec": min(times),
            "n_rows": len(rows),
            "recall_vs_exactverify": round(hit / max(len(exact), 1), 4),
        }
        print(f"{name}: {times} s ({len(rows)} rows)", file=sys.stderr)

    identical = rows_by_arm["landed"] == rows_by_arm["size_prefilter"]
    speedup = arms["landed"]["median_sec"] / max(
        1e-9, arms["size_prefilter"]["median_sec"]
    )
    out = {
        "tool": "sizefilter_ab",
        "sf_dir": args.sf,
        "threshold": args.threshold,
        "n_exact_reference_pairs": len(exact),
        "candidates": {
            "landed": n_cand_landed,
            "size_prefilter": n_cand_filtered,
            "cut_pct": round(
                100.0 * (1 - n_cand_filtered / max(1, n_cand_landed)), 2
            ),
        },
        "arms": arms,
        "rows_identical": identical,
        "landed_over_filtered_speedup": round(speedup, 3),
        "decision": (
            "land-size-prefilter"
            if identical and speedup >= 1.10 else "keep-landed"
        ),
    }
    with open(os.path.join(repo, args.out), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
