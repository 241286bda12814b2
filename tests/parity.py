"""Replica of the driver's DuckDB-oracle comparison: row-count, schema
(column names + dtype family), and order-insensitive value equality.

Stricter than a hash: on mismatch it reports WHERE the results differ
(first differing cells, max float delta) so plan bugs are debuggable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

#: numpy kind → comparison family.  int/uint fold together; a float
#: column on one side folds ints too (nullable ints surface as floats).
_KIND_FAMILY = {"i": "num", "u": "num", "f": "num", "b": "bool", "M": "ts", "O": "obj", "m": "td"}


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]")
        elif s.dtype.kind in "iu":
            df[c] = s.astype("int64")
        elif s.dtype.kind == "f":
            df[c] = s.astype("float64")
        elif isinstance(s.dtype, pd.CategoricalDtype):
            df[c] = s.astype(object)
        elif s.dtype.kind == "b":
            df[c] = s.astype(bool)
    if len(df):
        df = df.sort_values(by=list(df.columns), na_position="last").reset_index(
            drop=True
        )
    return df


def _family(dtype) -> str:
    return _KIND_FAMILY.get(dtype.kind, dtype.kind)


def assert_parity(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, key: str) -> None:
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{key}: column names differ: spark={sorted(spark_pdf.columns)} "
        f"oracle={sorted(oracle_pdf.columns)}"
    )
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{key}: row count differs: spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
    )
    a, b = _canon(spark_pdf), _canon(oracle_pdf)
    for c in a.columns:
        fa, fb = _family(a[c].dtype), _family(b[c].dtype)
        # nullable ints arrive as float64 on either side — unify
        if {fa, fb} == {"num"}:
            if a[c].dtype.kind == "f" or b[c].dtype.kind == "f":
                a[c] = a[c].astype("float64")
                b[c] = b[c].astype("float64")
        else:
            assert fa == fb, f"{key}.{c}: dtype family differs: {a[c].dtype} vs {b[c].dtype}"
    # after potential int→float normalization, re-sort both identically
    a = a.sort_values(by=list(a.columns), na_position="last").reset_index(drop=True) if len(a) else a
    b = b.sort_values(by=list(b.columns), na_position="last").reset_index(drop=True) if len(b) else b
    for c in a.columns:
        va, vb = a[c].to_numpy(), b[c].to_numpy()
        if a[c].dtype.kind == "f":
            eq = (va == vb) | (np.isnan(va) & np.isnan(vb))
            if not eq.all():
                bad = np.flatnonzero(~eq)[:5]
                delta = np.nanmax(np.abs(va[~eq] - vb[~eq]))
                raise AssertionError(
                    f"{key}.{c}: {len(np.flatnonzero(~eq))} float cells differ "
                    f"(max |Δ|={delta:.3e}); first rows {bad.tolist()}: "
                    f"spark={va[bad].tolist()} oracle={vb[bad].tolist()}"
                )
        else:
            pa, pb = pd.Series(va), pd.Series(vb)
            eq = (pa == pb) | (pa.isna() & pb.isna())
            if not eq.all():
                bad = np.flatnonzero(~eq.to_numpy())[:5]
                raise AssertionError(
                    f"{key}.{c}: {int((~eq).sum())} cells differ; first rows "
                    f"{bad.tolist()}: spark={pa.iloc[bad].tolist()} "
                    f"oracle={pb.iloc[bad].tolist()}"
                )
