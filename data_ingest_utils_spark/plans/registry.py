"""Plan registry: every SURVEY.md §2 key maps to a (spark, sf_dir) ->
DataFrame callable, and — when SQL-expressible — a DuckDB oracle SQL
string the driver hash-matches against (driver contract in
``__spark_entry__.py``).

Authoring rules (SURVEY.md §7, enforced by tests/test_parity.py):
- alias every computed column identically on both sides;
- ROUND(x, 6) any float whose value depends on aggregation order
  (4 dp for similarity / tf-idf scores);
- cast DuckDB's wider default types (BIGINT year(), HUGEINT sum(int),
  BIGINT row_number, …) to match Spark's (int year, long sum, …);
- pin a total order (unique tiebreaker) on every LIMIT query;
- never emit raw arrays/structs from an oracle-checked query —
  stringify or aggregate them instead.
"""

from __future__ import annotations

import textwrap
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def plan(key: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query plan; ``oracle=None`` ⇒ rows-only check."""

    def deco(fn: QueryFn) -> QueryFn:
        if key in QUERIES:
            raise ValueError(f"duplicate plan key: {key}")
        QUERIES[key] = fn
        if oracle is not None:
            ORACLES[key] = textwrap.dedent(oracle).strip()
        fn.__plan_key__ = key  # type: ignore[attr-defined]
        return fn

    return deco
