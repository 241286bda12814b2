#!/usr/bin/env python
"""Matched-scale oracle parity probe — the t2 gate at ANY sf dir.

The driver grades sf0.01; tests/test_parity.py replicates it there.
This tool runs the SAME comparison (assert_parity: row count, schema
family, order-insensitive value equality) at an arbitrary scale, which
catches the failure class that only appears when magnitudes grow:
float sums crossing a ROUND half-step under accumulation-order ulp,
domain edges absent from the small fixture (ln of a zero value), and
oracle-side overflow.  Round 8's run at sf0.1 found three such gaps
(sql_recursive_cte 6-dp revenue, the two geomean keys' ln(0)) that
every smaller-scale check had passed.

Usage::

    python tools/parity_probe.py [--sf DIR] [--keys k1,k2]

Exit 0 = all compared keys match; 1 = at least one mismatch (each is
printed with its first differing cells).  Rows-only keys are skipped —
they have no oracle to compare.
"""

from __future__ import annotations

import argparse
import contextlib
import os
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--keys", default="", help="comma-separated subset (default: all oracle keys)")
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    import duckdb

    from data_ingest_utils_spark.plans import ORACLES, QUERIES
    from data_ingest_utils_spark.plans.registry import PROBE_ORACLES
    from data_ingest_utils_spark.session import get_session
    from tests.parity import assert_parity

    keys = [k for k in args.keys.split(",") if k] or sorted(
        k for k in QUERIES if k in ORACLES
    )
    unknown = [k for k in keys if k not in ORACLES]
    if unknown:
        print(f"not oracle-backed / unknown: {unknown}", file=sys.stderr)
        return 2

    spark = get_session("dius-parity-probe")

    def fresh_oracle_con():
        """A NEW DuckDB connection per key (round-11 post-mortem): the
        probe used one shared in-process connection for the whole
        surface, and after ~113 keys of accumulated Spark-JVM memory
        the big all-pairs oracles hit DuckDB's memory ceiling and
        spilled — llm_dedup_clusters' sf1.0 oracle ground 25+ min at
        79 GB RSS mid-run while the SAME SQL completes in minutes on a
        fresh connection with full headroom.  View setup is
        milliseconds; reconnecting per key keeps every oracle's memory
        budget independent of position in the run."""
        con = duckdb.connect()
        for t in (
            "region nation customer supplier part orders lineitem events "
            "documents embeddings"
        ).split():
            # testdata dirs hold one file per table; Spark-written scale
            # dirs (tools/make_scale_data.py) hold a DIRECTORY of part
            # files under the same name — glob in that case.  A missing
            # table (e.g. embeddings at sf1) just skips its view; keys
            # that need it fail individually instead of blocking the run.
            path = f"{args.sf}/{t}.parquet"
            if os.path.isdir(path):
                path = f"{path}/*.parquet"
            elif not os.path.exists(path):
                continue
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
        return con

    def resolved_path(t: str) -> str:
        path = f"{args.sf}/{t}.parquet"
        return f"{path}/*.parquet" if os.path.isdir(path) else path

    def oracle_sql_for(key: str) -> str:
        # layout-aware probe twin when declared (round 13): fills the
        # {<table>_path} holes so the oracle can read_parquet(...,
        # filename=true) over whichever layout this sf dir has
        if key in PROBE_ORACLES:
            paths = {
                f"{t}_path": resolved_path(t)
                for t in (
                    "region nation customer supplier part orders lineitem "
                    "events documents embeddings"
                ).split()
            }
            return PROBE_ORACLES[key].format(**paths)
        return ORACLES[key]

    fails: list[tuple[str, str]] = []
    for i, key in enumerate(keys, 1):
        try:
            spark_pdf = QUERIES[key](spark, args.sf).toPandas()
            with contextlib.closing(fresh_oracle_con()) as con:
                oracle_pdf = con.execute(oracle_sql_for(key)).fetchdf()
            assert_parity(spark_pdf, oracle_pdf, key)
            print(f"probe [{i}/{len(keys)}] {key} OK", file=sys.stderr)
        except Exception as exc:  # record and continue — map the whole surface
            fails.append((key, f"{type(exc).__name__}: {exc}"[:400]))
            print(f"probe [{i}/{len(keys)}] {key} FAIL", file=sys.stderr)

    print(f"parity probe at {args.sf}: {len(keys) - len(fails)}/{len(keys)} match")
    for key, err in fails:
        print(f"FAIL {key}: {err}")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
