"""Sinks: partitioned parquet writes.

100 TB notes: ``partitionBy`` on a low-cardinality column (here
mktsegment / lang) produces a layout that static + dynamic partition
pruning can exploit on read.  Repartitioning on the partition columns
first avoids the ``tasks × values`` small-files explosion — but it
also funnels each value through ONE task, so for hot values at scale
use ``files_per_partition > 1`` to spread every value over N tasks /
N files via a deterministic content salt.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    mode: str = "overwrite",
    files_per_partition: int = 1,
) -> None:
    """Write ``df`` to parquet partitioned by ``cols``.

    Repartitions by the partition columns first to avoid the
    small-files explosion (each shuffle partition then holds whole
    partition values).  ``files_per_partition=1`` (default) gives one
    file per value — right for small/medium dims; it also means one
    TASK per value, a straggler when one value dominates.  At scale
    set ``files_per_partition=N``: rows additionally shuffle on a
    deterministic salt (xxhash64 of the full row, mod N), so each hot
    value spreads over N tasks and lands as N files.
    """
    if files_per_partition > 1:
        salt = F.pmod(
            F.xxhash64(*[F.col(c) for c in df.columns]),
            F.lit(files_per_partition),
        )
        part = df.repartition(*[F.col(c) for c in cols], salt)
    else:
        part = df.repartition(*cols)
    part.write.mode(mode).partitionBy(*cols).parquet(path)


def read_back(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned dataset back (partition columns from paths)."""
    return spark.read.parquet(path)
