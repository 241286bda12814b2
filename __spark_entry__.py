"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``data_ingest_utils_spark``; this module is a
thin adapter.  One ``queries()`` entry per implemented operator from
SURVEY.md §2 (+ the task-brief LLM-pipeline extensions); keys without
an ``oracle_sql()`` entry are the documented rows-only ops
(approximate / randomized / env-dependent results).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

# Make the engine importable no matter where the driver launches from.
_REPO_ROOT = str(Path(__file__).resolve().parent)
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from data_ingest_utils_spark.plans import ORACLES, QUERIES  # noqa: E402
from data_ingest_utils_spark.session import ensure_runtime_confs  # noqa: E402

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on sf0.001."""
    ensure_runtime_confs(spark)
    return QUERIES["agg_hash_group"](spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every hash-checkable key."""
    return dict(ORACLES)
