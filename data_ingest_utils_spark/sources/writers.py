"""Sinks: partitioned parquet writes.

100 TB notes: ``partitionBy`` on a low-cardinality column (here
mktsegment / lang) produces a layout that static + dynamic partition
pruning can exploit on read.  At scale you additionally want
``df.repartition(*cols)`` first so each task writes one file per
partition value instead of ``tasks × values`` small files — done here.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    mode: str = "overwrite",
) -> None:
    """Write ``df`` to parquet partitioned by ``cols``.

    Repartitions by the partition columns first to avoid the
    small-files explosion (each shuffle partition then holds whole
    partition values).
    """
    df.repartition(*cols).write.mode(mode).partitionBy(*cols).parquet(path)


def read_back(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned dataset back (partition columns from paths)."""
    return spark.read.parquet(path)
