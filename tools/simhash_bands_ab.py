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

ROUND 16 UPDATE: the 8-band form LANDED (``signatures=2`` is now the
default in operators/dedup.py), so both arms are expressed through
the landed ``signatures`` parameter — ``legacy_4x16`` is
``signatures=1`` (the pre-round-16 geometry), ``landed_8x16`` is the
default.  The r15 prototype closure this tool used for measurement is
gone; the arms now exercise the exact production code path.

Usage::

    python tools/simhash_bands_ab.py [--sf /root/testdata/sf0.1]
        [--out SIMHASH8_r16.json]
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
    ap.add_argument("--out", default="SIMHASH8_r16.json")
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from data_ingest_utils_spark.operators.dedup import simhash_band_candidates
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

    arms = {}
    for name, gen in (
        ("legacy_4x16", lambda: simhash_band_candidates(docs, signatures=1)),
        ("landed_8x16", lambda: simhash_band_candidates(docs)),
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
        "note": "round 16: landed_8x16 IS the production default "
                "(signatures=2 in operators/dedup.py); legacy_4x16 is "
                "the pre-round-16 geometry via signatures=1",
    }
    with open(os.path.join(repo, args.out), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["arms"], indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
