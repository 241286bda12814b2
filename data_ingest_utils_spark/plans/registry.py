"""Plan registry: every SURVEY.md §2 key maps to a (spark, sf_dir) ->
DataFrame callable, and — when SQL-expressible — a DuckDB oracle SQL
string the driver hash-matches against (driver contract in
``__spark_entry__.py``).

Authoring rules (SURVEY.md §7, enforced by tests/test_parity.py):
- alias every computed column identically on both sides;
- ROUND(x, 6) any float whose value depends on aggregation order
  (4 dp for similarity / tf-idf scores);
- money sums large enough for accumulation-order ulp to reach the
  rounding grid's half-step use plans/money.py's exact integer
  micro-unit accumulation on BOTH sides (round 13) — rounding alone
  only widens the half-step, it never removes order sensitivity;
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

#: Layout-aware oracle templates for tools/parity_probe.py (round 13,
#: VERDICT r12 #3).  The driver's oracle runs over pre-registered
#: views, which cannot expose DuckDB's per-row ``filename`` — fine at
#: sf0.01 where each table is ONE file, but a key whose output encodes
#: the source basename (ing_add_audit_cols) needs the REAL file names
#: at scale dirs, where a table is a directory of part files.  A probe
#: oracle is a str.format template with ``{<table>_path}`` holes the
#: probe fills with the resolved parquet path/glob, letting it use
#: ``read_parquet(path, filename=true)`` directly.  The driver contract
#: is untouched: ORACLES stays the single-file-correct SQL.
PROBE_ORACLES: dict[str, str] = {}


def plan(
    key: str, oracle: str | None = None, probe_oracle: str | None = None
) -> Callable[[QueryFn], QueryFn]:
    """Register a query plan; ``oracle=None`` ⇒ rows-only check;
    ``probe_oracle`` ⇒ layout-aware template for matched-scale probes."""

    def deco(fn: QueryFn) -> QueryFn:
        if key in QUERIES:
            raise ValueError(f"duplicate plan key: {key}")
        QUERIES[key] = fn
        if oracle is not None:
            ORACLES[key] = textwrap.dedent(oracle).strip()
        if probe_oracle is not None:
            PROBE_ORACLES[key] = textwrap.dedent(probe_oracle).strip()
        fn.__plan_key__ = key  # type: ignore[attr-defined]
        return fn

    return deco
