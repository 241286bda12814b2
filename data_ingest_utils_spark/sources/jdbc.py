"""JDBC ingestion (jar-gated surface — executed for real since r15).

SURVEY.md §2a ``scan_jdbc``: the classic ingestion-utility path
(RDBMS → data-lake table).  Not declared in ``queries()`` because the
driver jar is an environment artifact and registry keys must run in
every environment the sweeps/driver use — but :func:`read_jdbc` is
EXECUTED end-to-end by tools/jdbc_real_probe.py and the gated
tests/test_jdbc_real.py whenever a public ``duckdb_jdbc`` driver jar
is discoverable in the local artifact caches (it is, as of round 15):
a real database file pulled over 4 parallel executor-side JDBC
connections, verified against the parquet fixture (JDBC_r15.json).
The range-partition PLANNING is additionally factored into
:func:`range_partition_predicates` and oracle-checked EVERY round by
the sqlite3-backed Python data source
(sources/pydatasource.SqlPartitionedDataSource, registry key
``scan_sqlite_partitioned``) — the same per-partition WHERE clauses
Spark's JDBC relation generates, driving live SQL pulls on executors.

100 TB notes: a single-JDBC-connection read is a driver bottleneck;
production pulls ALWAYS set (partitionColumn, lowerBound, upperBound,
numPartitions) so Spark issues parallel range-partitioned queries, or
``predicates`` for hand-sharded pulls.  Incremental loads compose this
with operators.ingest.incremental (high-watermark filter) pushed down
via the WHERE clause of ``dbtable``-as-subquery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def range_partition_predicates(
    column: str,
    lower_bound: int,
    upper_bound: int,
    num_partitions: int,
) -> list[str | None]:
    """Per-partition WHERE clauses for a parallel range-partitioned
    SQL pull — the contract of Spark's JDBC ``partitionColumn``
    options (documented in the JDBC data source guide):

    - stride = upper/n − lower/n (integer arithmetic), n clamped so
      every stride is ≥ 1;
    - the FIRST partition is unbounded below and also picks up NULLs
      (``col < x OR col IS NULL``), the LAST is unbounded above, so
      rows OUTSIDE [lower, upper) are still read — the bounds shape
      parallelism, they never filter;
    - interior partitions are half-open ``lo <= col AND col < hi`` —
      disjoint and complete by construction.

    ``[None]`` (single full-scan partition) comes back when the range
    can't support more than one stride.  Shared by the sqlite-backed
    Python data source so the planning logic the sandbox can't
    exercise through a JDBC jar is still executed and oracle-checked
    end-to-end.
    """
    if num_partitions <= 1 or upper_bound <= lower_bound:
        return [None]
    n = min(num_partitions, max(1, upper_bound - lower_bound))
    if n == 1:
        # the clamp can collapse a multi-partition request to one
        # (range width 1): that single partition must be the full
        # unbounded scan, not a WHERE built from two absent bounds
        # (round-8 review: the else-branch interpolated a literal
        # Python 'None' into SQL here)
        return [None]
    stride = upper_bound // n - lower_bound // n
    preds: list[str | None] = []
    current = lower_bound
    for i in range(n):
        lb = f"{column} >= {current}" if i > 0 else None
        current += stride
        ub = f"{column} < {current}" if i < n - 1 else None
        if lb is not None and ub is not None:
            preds.append(f"{lb} AND {ub}")
        elif lb is not None:
            preds.append(lb)
        else:
            preds.append(f"{ub} OR {column} IS NULL")
    return preds


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """Parallel JDBC range-partitioned read."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
    )
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned JDBC read needs lower/upper bounds")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()
