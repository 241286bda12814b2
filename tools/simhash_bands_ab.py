#!/usr/bin/env python
"""SimHash band-geometry A/B (round 15 — evidence for the round-16
recall lead; MEASUREMENT ONLY, no registry key changes).

The two-scale rows-only certificate quantified the landed 4×16-bit
SimHash banding at 0.92 / 0.887 recall vs the exact-verify reference
(sf0.01 / sf0.1, pairs of J ∈ [0.7, 1.0]) — the expected operating
band of the geometry (any-of-4 exact-band match ≈ 0.5 at J ≈ 0.9 for
independent bits).  The obvious dial is MORE bands at the SAME band
width: a SECOND independent 64-bit signature (salted feature hash)
yields 8 bands × 16 bits — per-band background collision rate stays
2^-16 (bucket sizes unchanged, the scale property that matters), the
any-band match probability doubles its exponent:
1 − (1 − (1−p)^16)^8 ≈ 0.78 → 0.95+ at p ≈ 0.10 (J ≈ 0.9).  The price
is ~2× signature/band-shuffle volume and up to ~2× candidate pairs
feeding the exact-verify stage.

This tool measures both arms on the same corpus:

- candidate-pair RECALL vs the exact-verify reference pair set
  (llm_dedup_near_exactverify — driver-hash-certified 100% recall);
- candidate-pair VOLUME (the verify stage's cost driver);
- wall time of the candidate stage.

Writes SIMHASH8_r{N}.json.  Decision protocol: land the 8-band form
in round 16 only if recall gains hold AND the bench ngram_banded
shape stays within its baseline under the ~2× verify load.

Usage::

    python tools/simhash_bands_ab.py [--sf /root/testdata/sf0.1]
        [--out SIMHASH8_r15.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="SIMHASH8_r15.json")
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from pyspark.sql import functions as F

    from data_ingest_utils_spark.operators.dedup import (
        simhash_band_candidates,
        tokens,
    )
    from data_ingest_utils_spark.plans import QUERIES
    from data_ingest_utils_spark.session import get_session
    from data_ingest_utils_spark.sources.readers import load_table

    spark = get_session("dius-simhash8-ab")
    sf_dir = args.sf if os.path.isabs(args.sf) else os.path.join(repo, args.sf)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    # Reference: the oracle-certified exact pair set at J >= 0.5.
    exact = {
        (r.doc_a, r.doc_b)
        for r in QUERIES["llm_dedup_near_exactverify"](spark, sf_dir).collect()
    }

    def eight_band_candidates(df):
        """Prototype: TWO independent signatures (feature hash and
        salted feature hash) -> 8 bands x 16 bits.  Same one-hash-agg
        shape as operators.dedup.simhash64, twice the bit columns;
        band join identical to simhash_band_candidates."""
        feats = F.array_remove(tokens(F.col("text")), "")
        tok = df.select("doc_id", F.explode(feats).alias("term"))
        tok = tok.withColumn("h0", F.xxhash64("term")).withColumn(
            "h1", F.xxhash64(F.concat(F.col("term"), F.lit("\x01")))
        )
        sums = [
            F.sum(
                F.when(
                    F.shiftright(F.col(h), i).bitwiseAND(F.lit(1)) == 1, 1
                ).otherwise(-1)
            ).alias(f"{h}b{i}")
            for h in ("h0", "h1")
            for i in range(64)
        ]
        per_doc = tok.groupBy("doc_id").agg(*sums)
        sigs = []
        for h in ("h0", "h1"):
            sig = sum(
                (
                    F.when(
                        F.col(f"{h}b{i}") > 0,
                        F.shiftleft(F.lit(1).cast("long"), i),
                    ).otherwise(F.lit(0).cast("long"))
                    for i in range(64)
                ),
                start=F.lit(0).cast("long"),
            )
            sigs.append(sig.alias(f"sig_{h}"))
        st = per_doc.select("doc_id", *sigs)
        bands = st.select(
            "doc_id",
            F.posexplode(
                F.array(
                    *[
                        F.shiftrightunsigned(F.col(f"sig_{h}"), b * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        # band index must be globally unique across the
                        # two signatures: (h_idx * 4 + b)
                        for h in ("h0", "h1")
                        for b in range(4)
                    ]
                )
            ).alias("band_idx", "band_val"),
        )
        a = bands.select(
            F.col("doc_id").alias("doc_a"), "band_idx", "band_val"
        )
        b = bands.select(
            F.col("doc_id").alias("doc_b"), "band_idx", "band_val"
        )
        return (
            a.join(b, ["band_idx", "band_val"])
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b")
            .distinct()
        )

    arms = {}
    for name, gen in (
        ("landed_4x16", lambda: simhash_band_candidates(docs)),
        ("proto_8x16", lambda: eight_band_candidates(docs)),
    ):
        t0 = time.monotonic()
        cands = {(r.doc_a, r.doc_b) for r in gen().collect()}
        elapsed = round(time.monotonic() - t0, 2)
        hit = len(exact & cands)
        arms[name] = {
            "n_candidates": len(cands),
            "candidate_stage_s": elapsed,
            "recall_vs_exactverify": round(hit / max(len(exact), 1), 4),
            "exact_pairs_missed": len(exact) - hit,
        }

    out = {
        "tool": "simhash_bands_ab",
        "sf_dir": args.sf,
        "n_exact_reference_pairs": len(exact),
        "arms": arms,
        "note": "measurement-only prototype; landing decision deferred "
                "to round 16 (needs the bench ngram_banded cost under "
                "the larger candidate volume)",
    }
    with open(os.path.join(repo, args.out), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["arms"], indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
