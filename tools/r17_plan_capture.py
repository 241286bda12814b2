#!/usr/bin/env python
"""Capture `explain("formatted")` snapshots for the optimization-round
evidence files ``plans/r17/<key>_{before,after}.txt``.

Usage::

    python tools/r17_plan_capture.py before [key ...]
    python tools/r17_plan_capture.py after  [key ...]

With no keys, captures every bench query (HEADLINE + HEAVY_SF1) plus
``llm_dedup_near_exactverify`` — the set the optimization round is
graded on.  Run ``before`` at the pre-change HEAD (git stash the
optimization diff first) and ``after`` at the final HEAD; the judge
diffs the pairs against OPTIMIZATION_r17.md's plan claims.

Same normalization as tools/plan_dossier.py (volatile ids stripped) so
before/after diffs show only real shape changes.
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r17"
)


def main() -> None:
    from bench import HEADLINE, HEAVY_SF1
    from data_ingest_utils_spark.plans import QUERIES
    from data_ingest_utils_spark.session import get_session

    if len(sys.argv) < 2 or sys.argv[1] not in ("before", "after"):
        raise SystemExit("usage: r17_plan_capture.py before|after [key ...]")
    phase = sys.argv[1]
    keys = sys.argv[2:] or (
        list(HEADLINE)
        + [k for k in HEAVY_SF1 if k not in HEADLINE]
        + ["llm_dedup_near_exactverify"]
    )

    os.makedirs(OUT_DIR, exist_ok=True)
    # Same session shape as tools/plan_dossier.py so the two artifacts
    # stay comparable (local[8]/8 shuffle partitions: plan SHAPE is
    # partition-count independent; the dossier notes why).
    spark = get_session(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.1"
    for key in keys:
        df = QUERIES[key](spark, sf)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue().rstrip()
        plan = re.sub(r"plan_id=\d+", "plan_id=N", plan)
        plan = re.sub(r"file:[^\s,\]]+", "file:<path>", plan)
        path = os.path.join(OUT_DIR, f"{key}_{phase}.txt")
        with open(path, "w") as fh:
            fh.write(plan + "\n")
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
