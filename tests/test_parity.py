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
    spark_pdf = sdf.toPandas()
    oracle_pdf = duck.execute(ORACLES[key]).fetchdf()
    assert_parity(spark_pdf, oracle_pdf, key)


@pytest.mark.parametrize("key", ROWS_ONLY_KEYS)
def test_rows_only_executes(key, spark):
    sdf = QUERIES[key](spark, SF_T2)
    n = sdf.count()
    assert n >= 0
    assert len(sdf.schema.fields) > 0

def test_r4_correctness_window():
    """The driver grades only the first 50 registry entries per round;
    round 4 rotates 50 of the 81 never-driver-checked oracle-backed keys
    into that window (backlog clear, part 1 of 2)."""
    from data_ingest_utils_spark import plans

    first50 = list(QUERIES)[:50]
    assert first50 == plans._R4_WINDOW
    assert len(plans._R4_WINDOW) == 50
    # Every round-4 windowed key is hash-checkable (oracle-backed).
    assert [k for k in first50 if k not in ORACLES] == []


def test_windows_cover_exact_driver_backlog():
    """r4 ∪ r5 windows must equal EXACTLY the keys with no driver
    CORRECTNESS row in rounds 1-3 (committed artifacts) — windowing an
    already-checked key would waste a slot; missing one would strand
    it past round 5."""
    import json
    from pathlib import Path

    from data_ingest_utils_spark import plans

    repo = Path(__file__).resolve().parent.parent
    checked: set[str] = set()
    for r in (1, 2, 3):
        f = repo / f"CORRECTNESS_r{r:02d}.json"
        if f.exists():
            checked |= set(json.loads(f.read_text()).keys())
    if not checked:
        pytest.skip("driver CORRECTNESS artifacts not present")
    backlog = set(QUERIES) - checked
    assert set(plans._R4_WINDOW) | set(plans._R5_WINDOW) == backlog


def test_r5_window_prepped():
    """Round-5 window: the remaining 42 never-driver-checked keys (31
    oracle-backed first, 11 rows-only parked last), disjoint from round 4
    and covering the whole backlog."""
    from data_ingest_utils_spark import plans

    r4, r5 = plans._R4_WINDOW, plans._R5_WINDOW
    assert len(r5) == 42
    assert not set(r4) & set(r5)
    assert all(k in QUERIES for k in r5)
    # Oracle-backed keys precede every rows-only key.
    oracle_flags = [k in ORACLES for k in r5]
    assert oracle_flags == sorted(oracle_flags, reverse=True)
    assert sum(1 for f in oracle_flags if not f) == 11
