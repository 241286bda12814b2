"""Gated REAL-JDBC test (round 15): a genuine parallel JDBC pull over
a discovered public DuckDB driver jar — the production surface
``sources/jdbc.py`` documents and ``scan_sqlite_partitioned``
approximates.  Skips (not fails) when no jar is discoverable, exactly
like the protobuf-gated streaming twin.

Runs in a SUBPROCESS because the driver jar must be on the JVM
classpath at startup (``spark.jars`` + extraClassPath) and the shared
test session's JVM is already running; deliberately NOT a registry
key — the jar is an environment artifact, and registry keys must
execute in every environment the sweeps/driver run in.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.jdbc_real_probe import find_duckdb_jdbc_jar  # noqa: E402


@pytest.mark.skipif(
    find_duckdb_jdbc_jar() is None,
    reason="no duckdb_jdbc driver jar discoverable in local artifact caches",
)
def test_real_jdbc_parallel_pull(tmp_path):
    out = tmp_path / "jdbc_probe.json"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "jdbc_real_probe.py"),
         "--out", str(out)],
        capture_output=True, text=True, timeout=300, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    result = json.loads(out.read_text())
    assert all(result["checks"].values()), result["checks"]
    # four genuinely parallel range partitions, disjoint and complete
    assert len(result["partition_rows"]) == 4
    assert all(n > 0 for n in result["partition_rows"])
