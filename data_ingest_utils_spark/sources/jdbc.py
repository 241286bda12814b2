"""JDBC ingestion (documented surface — no RDBMS/driver jar in sandbox).

SURVEY.md §2a ``scan_jdbc``: the classic ingestion-utility path
(RDBMS → data-lake table).  Not declared in ``queries()`` because the
sandbox has no database or JDBC driver jar; the implementation below
is the real production shape and is unit-tested only for argument
construction.

100 TB notes: a single-JDBC-connection read is a driver bottleneck;
production pulls ALWAYS set (partitionColumn, lowerBound, upperBound,
numPartitions) so Spark issues parallel range-partitioned queries, or
``predicates`` for hand-sharded pulls.  Incremental loads compose this
with operators.ingest.incremental (high-watermark filter) pushed down
via the WHERE clause of ``dbtable``-as-subquery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


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
