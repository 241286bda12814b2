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

Writes one JSON artifact (default XMASTER.json — pass --out
XMASTER_r{N}[...].json for the committed per-round artifacts so a
bare run can never clobber them): n_exact /
n_close / n_diverged plus per-key detail for anything non-exact.

Round 15 (VERDICT r14 #2): ``--rows-only`` extends the certificate to
the 12 rows-only keys.  Their driver evidence class is "rows-only"
because no SQL oracle can state their VALUES — but most are
seeded-deterministic (sampleBy seed, deterministic Lloyd from cached
centroids, keyed hashes, driver-drawn LSH models) and the HLL sketch
keys merge by register-max (commutative/associative), so their full
results should be byte-identical under real multi-JVM task placement
too.  A rows-only key that legitimately varies across masters must be
declared in ``ROWS_ONLY_XMASTER_EXCLUDED`` with a reason; membership
was determined EMPIRICALLY (all 12 compared byte-identical at sf0.01
on first measurement), not assumed.

Usage::

    python tools/cross_master_value_check.py [--cluster 2,8,4096]
        [--sf /root/testdata/sf0.01] [--keys k1,k2] [--rows-only]
        [--out FILE]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys


#: Rows-only keys whose results legitimately differ across masters,
#: with the reason — consulted only under ``--rows-only``.  Empty as
#: of round 15: every rows-only key compared byte-identical between
#: local[*] and local-cluster at sf0.01.  A key that starts to vary
#: must be added here with its mechanism, not waved through.
ROWS_ONLY_XMASTER_EXCLUDED: dict[str, str] = {}


def _cell(v):
    """Recursive canonical cell: floats keep full precision (repr) at
    EVERY nesting depth — arrays/structs of doubles must be
    delta-comparable, not opaque str() images (code-review r14)."""
    if isinstance(v, float):
        return ("f", repr(v))
    if isinstance(v, (list, tuple)):  # includes nested Row (tuple sub)
        return ("l", tuple(_cell(x) for x in v))
    if isinstance(v, (bytes, bytearray)):
        return ("b", bytes(v).hex())
    if isinstance(v, dict):
        return ("m", tuple(sorted((str(k), _cell(x)) for k, x in v.items())))
    return ("o", str(v))


def _sort_image(cell):
    """Ordering key with floats ROUNDED to 6 significant digits, so a
    last-ulp difference between masters cannot reorder the row sort
    and misalign the positional delta compare (code-review r14); the
    full-precision form still decides exactness."""
    t, v = cell
    if t == "f":
        f = float(v)
        return ("f", "nan" if math.isnan(f) else f"{f:.6g}")
    if t == "l":
        return ("l", tuple(_sort_image(x) for x in v))
    if t == "m":
        return ("m", tuple((k, _sort_image(x)) for k, x in v))
    return cell


def _canon(rows) -> list[tuple]:
    """Canonical form of a collected result: full-precision rows,
    sorted by their rounded sort image (column order is schema order,
    stable across masters)."""
    out = [tuple(_cell(v) for v in r) for r in rows]
    return sorted(out, key=lambda row: tuple(_sort_image(c) for c in row))


def _cell_delta(a, b) -> float | None:
    """Max |Δ| between two canonical cells; None = non-numeric
    divergence."""
    (ta, va), (tb, vb) = a, b
    if ta != tb:
        return None
    if a == b:
        return 0.0
    if ta == "f":
        try:
            d = abs(float(va) - float(vb))
        except ValueError:
            return None
        return None if math.isnan(d) else d
    if ta in ("l", "m"):
        if len(va) != len(vb):
            return None
        worst = 0.0
        for xa, xb in zip(va, vb):
            if ta == "m":
                if xa[0] != xb[0]:
                    return None
                xa, xb = xa[1], xb[1]
            d = _cell_delta(xa, xb)
            if d is None:
                return None
            worst = max(worst, d)
        return worst
    return None


def _max_delta(a: list[tuple], b: list[tuple]) -> float | None:
    """Max |Δ| across numeric cells of two equal-shape canonical
    results; None when shapes differ (true divergence)."""
    if len(a) != len(b):
        return None
    worst = 0.0
    for ra, rb in zip(a, b):
        if len(ra) != len(rb):
            return None
        for ca, cb in zip(ra, rb):
            d = _cell_delta(ca, cb)
            if d is None:
                return None
            worst = max(worst, d)
    return worst


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--cluster", default="2,8,4096")
    ap.add_argument("--keys", default="")
    ap.add_argument("--rows-only", action="store_true",
                    help="compare the rows-only keys (minus declared "
                         "exclusions) instead of the oracle-backed ones")
    ap.add_argument("--out", default="XMASTER.json")
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from pyspark.sql import SparkSession

    from data_ingest_utils_spark.plans import ORACLES, QUERIES
    from data_ingest_utils_spark.session import get_session

    if args.rows_only:
        pool = [k for k in QUERIES if k not in ORACLES
                and k not in ROWS_ONLY_XMASTER_EXCLUDED]
    else:
        pool = [k for k in QUERIES if k in ORACLES]
    keys = [k for k in args.keys.split(",") if k] or sorted(pool)

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
        "tier": "rows_only" if args.rows_only else "oracle",
        "excluded": ROWS_ONLY_XMASTER_EXCLUDED if args.rows_only else {},
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
