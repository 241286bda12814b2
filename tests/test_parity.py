"""The t2 gate, run locally: every declared key at sf0.01 against its
DuckDB oracle (exact replica of the driver's comparison, with richer
diagnostics); rows-only keys must at least execute and return a stable
schema.
"""

from __future__ import annotations

import pytest

from data_ingest_utils_spark.plans import ORACLES, QUERIES
from tests.conftest import SF_T2
from tests.parity import assert_parity

ORACLE_KEYS = sorted(k for k in QUERIES if k in ORACLES)
ROWS_ONLY_KEYS = sorted(k for k in QUERIES if k not in ORACLES)


@pytest.mark.parametrize("key", ORACLE_KEYS)
def test_oracle_parity(key, spark, duck):
    sdf = QUERIES[key](spark, SF_T2)
    _assert_atomic_schema(key, sdf)
    spark_pdf = sdf.toPandas()
    oracle_pdf = duck.execute(ORACLES[key]).fetchdf()
    assert_parity(spark_pdf, oracle_pdf, key)


@pytest.mark.parametrize("key", ROWS_ONLY_KEYS)
def test_rows_only_executes(key, spark):
    sdf = QUERIES[key](spark, SF_T2)
    n = sdf.count()
    assert n >= 0
    assert len(sdf.schema.fields) > 0
    _assert_atomic_schema(key, sdf)


#: Keys allowed to expose a non-atomic top-level column, each with the
#: canonicalization rule that makes the driver's pandas sort safe.
#: Empty on purpose: the round-5 llm_multimodal_features failure showed
#: an array<double> column crashes the driver's rows-only canonicalizer
#: (pandas factorize over ndarrays) — whitelist only with a written rule.
NON_ATOMIC_WHITELIST: dict[str, str] = {}

_NON_ATOMIC = ("array", "map", "struct")


def _assert_atomic_schema(key, sdf):
    if key in NON_ATOMIC_WHITELIST:
        return
    bad = [
        (f.name, f.dataType.simpleString())
        for f in sdf.schema.fields
        if f.dataType.simpleString().startswith(_NON_ATOMIC)
    ]
    assert not bad, (
        f"{key}: non-atomic top-level columns {bad} would crash the driver's "
        "canonicalizer (pandas sort_values over unhashable cells) — project "
        "to scalars (per-dim round / to_json) or whitelist with a rule"
    )

def test_r5_correctness_window():
    """The driver grades only the first 50 registry entries per round;
    round 5 fronts the final 50 never-driver-checked keys (backlog clear,
    part 2 of 2) — after this round every key has a driver row."""
    from data_ingest_utils_spark import plans

    first50 = list(QUERIES)[:50]
    assert first50 == plans._R5_WINDOW
    assert len(plans._R5_WINDOW) == 50
    # Oracle-backed keys precede every rows-only key so a truncated run
    # loses the weaker signal first.
    oracle_flags = [k in ORACLES for k in first50]
    assert oracle_flags == sorted(oracle_flags, reverse=True)
    assert sum(1 for f in oracle_flags if not f) == 11


def test_r5_window_is_exact_driver_backlog():
    """The r5 window must equal EXACTLY the keys with no driver
    CORRECTNESS row in rounds 1-4 (committed artifacts) — windowing an
    already-checked key would waste a slot; missing one would strand it.
    Keys added in round 5 itself are exempt: they register behind the
    window and rotate in next round."""
    import json
    from pathlib import Path

    from data_ingest_utils_spark import plans

    repo = Path(__file__).resolve().parent.parent
    checked: set[str] = set()
    for r in (1, 2, 3, 4):
        f = repo / f"CORRECTNESS_r{r:02d}.json"
        if f.exists():
            checked |= set(json.loads(f.read_text()).keys())
    if not checked:
        pytest.skip("driver CORRECTNESS artifacts not present")
    backlog = (set(plans._R4_WINDOW) | set(plans._R5_WINDOW)) - checked
    assert set(plans._R5_WINDOW) == backlog
