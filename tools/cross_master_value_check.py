#!/usr/bin/env python
"""Cross-master VALUE certificate (round 14).

The 4-arm sweeps prove every registry key EXECUTES on both local[*]
and local-cluster[2,8,4096]; the parity probe proves values against
DuckDB on one master.  Nothing yet proved the two masters produce the
SAME values — the distributed arm changes task placement and shuffle
transport, which is exactly where a nondeterministic plan (unseeded
sampling, accumulation-order-sensitive float aggs, first-wins races)
would diverge while still "passing" both sweeps.  This tool collects
every oracle-backed key's full result on BOTH masters and compares:

- EXACT match (after canonical row sort) — the target for every key
  since the round-13 money work moved order-sensitive sums to exact
  integer micro-units;
- for non-exact keys, the max absolute per-cell numeric delta, so a
  last-ulp accumulation difference is distinguishable from a real
  divergence.

Writes one JSON artifact (default XMASTER_r14.json): n_exact /
n_close / n_diverged plus per-key detail for anything non-exact.

Usage::

    python tools/cross_master_value_check.py [--cluster 2,8,4096]
        [--sf /root/testdata/sf0.01] [--keys k1,k2] [--out FILE]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys


def _canon(rows) -> list[tuple]:
    """Canonical, hashable form of a collected result: rows sorted by
    their string image (column order is schema order, stable across
    masters)."""
    out = []
    for r in rows:
        vals = []
        for v in r:
            if isinstance(v, float):
                vals.append(("f", repr(v)))  # repr: full precision
            elif isinstance(v, (list, tuple)):
                vals.append(("l", str(v)))
            elif isinstance(v, bytearray):
                vals.append(("b", bytes(v).hex()))
            elif isinstance(v, bytes):
                vals.append(("b", v.hex()))
            else:
                vals.append(("o", str(v)))
        out.append(tuple(vals))
    return sorted(out)


def _max_delta(a: list[tuple], b: list[tuple]) -> float | None:
    """Max |Δ| across numeric cells of two equal-shape canonical
    results; None when shapes differ (true divergence)."""
    if len(a) != len(b):
        return None
    worst = 0.0
    for ra, rb in zip(a, b):
        if len(ra) != len(rb):
            return None
        for (ta, va), (tb, vb) in zip(ra, rb):
            if (ta, va) == (tb, vb):
                continue
            if ta == "f" and tb == "f":
                try:
                    d = abs(float(va) - float(vb))
                except ValueError:
                    return None
                if math.isnan(d):
                    return None
                worst = max(worst, d)
            else:
                return None
    return worst


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--cluster", default="2,8,4096")
    ap.add_argument("--keys", default="")
    ap.add_argument("--out", default="XMASTER_r14.json")
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from pyspark.sql import SparkSession

    from data_ingest_utils_spark.plans import ORACLES, QUERIES
    from data_ingest_utils_spark.session import get_session

    keys = [k for k in args.keys.split(",") if k] or sorted(
        k for k in QUERIES if k in ORACLES
    )

    results: dict[str, dict[str, list]] = {}
    masters = [("local", None), ("cluster", f"local-cluster[{args.cluster}]")]
    for label, master in masters:
        active = SparkSession.getActiveSession()
        if active is not None:
            active.stop()
        extra_confs = None
        if master:
            # same executor-side Python setup as tools/registry_sweep.py:
            # executor JVMs spawn their own Python workers, which must
            # import the repo package for cloudpickled pandas UDFs /
            # Python datasources
            os.environ["PYSPARK_PYTHON"] = sys.executable
            extra_confs = {"spark.executorEnv.PYTHONPATH": repo}
        spark = get_session(
            f"dius-xmaster-{label}", master=master, extra_confs=extra_confs
        )
        print(f"=== {label}: {spark.conf.get('spark.master')}", file=sys.stderr)
        for i, key in enumerate(keys, 1):
            try:
                rows = QUERIES[key](spark, args.sf).collect()
                results.setdefault(key, {})[label] = _canon(rows)
            except Exception as e:  # record, keep going
                results.setdefault(key, {})[label] = f"ERROR: {e}"
            if i % 40 == 0:
                print(f"{label}: {i}/{len(keys)}", file=sys.stderr)

    exact, close, diverged, errored = [], [], [], []
    detail = {}
    for key in keys:
        a, b = results[key].get("local"), results[key].get("cluster")
        if isinstance(a, str) or isinstance(b, str):
            errored.append(key)
            detail[key] = {"local": str(a)[:200], "cluster": str(b)[:200]}
        elif a == b:
            exact.append(key)
        else:
            d = _max_delta(a, b)
            if d is not None and d < 1e-6:
                close.append(key)
                detail[key] = {"max_abs_delta": d}
            else:
                diverged.append(key)
                detail[key] = {
                    "max_abs_delta": d,
                    "n_rows": (len(a), len(b)),
                }
    out = {
        "tool": "cross_master_value_check",
        "sf_dir": args.sf,
        "cluster": f"local-cluster[{args.cluster}]",
        "n_keys": len(keys),
        "n_exact": len(exact),
        "n_close_lt_1e-6": len(close),
        "n_diverged": len(diverged),
        "n_errored": len(errored),
        "close_keys": close,
        "diverged_keys": diverged,
        "errored_keys": errored,
        "detail": detail,
    }
    with open(os.path.join(repo, args.out), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in (
        "n_keys", "n_exact", "n_close_lt_1e-6", "n_diverged", "n_errored")}))
    return 0 if not diverged and not errored else 1


if __name__ == "__main__":
    sys.exit(main())
