"""Custom Python data source (Spark 4 ``pyspark.sql.datasource``).

The connector surface an ingestion engine needs for systems without a
JVM driver: implement ``DataSource``/``DataSourceReader`` in Python,
register once per session, then ``spark.read.format(name)`` like any
built-in.  Spark plans PARTITIONS from ``partitions()`` and calls
``read(partition)`` on executors — the source scales out like a native
one; only the per-partition byte decoding is Python (Arrow-batched by
the engine).

The demo source generates a deterministic synthetic sequence
(``i, (i*i) % 97``) so the full pipeline — registration, partition
planning, executor-side reads — is DuckDB-oracle-checkable; a real
REST/queue/proprietary-format connector swaps only the body of
``read()``.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)


@dataclass
class _RangePartition(InputPartition):
    start: int
    end: int


class SyntheticSeqReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.num_partitions = int(options.get("numpartitions", 4))

    def partitions(self):
        if self.n <= 0:
            # Spark schedules a task even for an empty source and
            # passes partition=None if the list is empty — always
            # return at least one (empty) partition.
            return [_RangePartition(0, 0)]
        step = max(1, -(-self.n // self.num_partitions))
        return [
            _RangePartition(s, min(s + step, self.n))
            for s in range(0, self.n, step)
        ]

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            yield (i, (i * i) % 97)


class SyntheticSeqDataSource(DataSource):
    """``spark.read.format("synthetic_seq").option("n", N)``."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_seq"

    def schema(self) -> str:
        return "seq_id long, val long"

    def reader(self, schema) -> DataSourceReader:
        return SyntheticSeqReader(self.options)


def register(spark: SparkSession) -> None:
    """Idempotently register the batch sources on a session."""
    spark.dataSource.register(SyntheticSeqDataSource)
    spark.dataSource.register(SqlPartitionedDataSource)


@dataclass
class _PredicatePartition(InputPartition):
    predicate: str | None


class SqlPartitionedReader(DataSourceReader):
    """Range-partitioned pull from a live SQL engine (sqlite3), one
    connection + one ranged SELECT per PARTITION on the executors —
    the exact execution shape of Spark's JDBC ``partitionColumn``
    read, with the per-partition WHERE clauses produced by the SAME
    planner (sources/jdbc.range_partition_predicates) the JDBC
    docstring documents.  The sandbox has no JDBC driver jar; this
    source is how that planning logic actually executes and gets
    oracle-checked."""

    def __init__(self, schema, options):
        self.path = options["path"]
        self.table = options["table"]
        self.columns = [f.name for f in schema.fields]
        self.partition_column = options.get("partitioncolumn")
        self.lower = int(options.get("lowerbound", 0))
        self.upper = int(options.get("upperbound", 0))
        self.num_partitions = int(options.get("numpartitions", 1))

    def partitions(self):
        from data_ingest_utils_spark.sources.jdbc import range_partition_predicates

        if not self.partition_column:
            return [_PredicatePartition(None)]
        return [
            _PredicatePartition(p)
            for p in range_partition_predicates(
                self.partition_column, self.lower, self.upper, self.num_partitions
            )
        ]

    def read(self, partition: _PredicatePartition):
        import sqlite3

        where = f" WHERE {partition.predicate}" if partition.predicate else ""
        con = sqlite3.connect(self.path)
        try:
            yield from con.execute(
                f"SELECT {', '.join(self.columns)} FROM {self.table}{where}"
            )
        finally:
            con.close()


class SqlPartitionedDataSource(DataSource):
    """``spark.read.format("sql_partitioned").schema(...).options(
    path=, table=, partitionColumn=, lowerBound=, upperBound=,
    numPartitions=)`` — schema comes from the caller (a database scan
    has no self-describing schema without an extra driver round-trip,
    same as Spark's JDBC ``customSchema`` escape hatch).  The db file
    must be reachable from executors (shared storage on a real
    cluster; local FS under local[*])."""

    @classmethod
    def name(cls) -> str:
        return "sql_partitioned"

    def reader(self, schema) -> DataSourceReader:
        return SqlPartitionedReader(schema, self.options)


class SyntheticSeqStreamReader(SimpleDataSourceStreamReader):
    """Offset-tracked streaming twin of SyntheticSeqReader: each
    micro-batch advances {"offset": k} by ``step`` until ``n`` —
    exactly the shape of a queue/REST poller (Kafka-less Kinesis,
    paginated APIs).  Spark checkpoints the offset dict, so restart
    resumes where the last committed batch ended; readBetweenOffsets
    makes committed batches replayable for exactly-once sinks."""

    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.step = int(options.get("step", 256))

    def initialOffset(self):
        return {"offset": 0}

    def read(self, start):
        lo = start["offset"]
        # clamp BELOW at lo: a checkpointed offset beyond a shrunken
        # `n` option (restart with smaller n) must not regress the
        # offset — end < start breaks monotonicity and replay
        hi = max(lo, min(lo + self.step, self.n))
        return iter([(i, (i * i) % 97) for i in range(lo, hi)]), {"offset": hi}

    def readBetweenOffsets(self, start, end):
        return iter(
            [(i, (i * i) % 97) for i in range(start["offset"], end["offset"])]
        )


class SyntheticSeqStreamDataSource(DataSource):
    """``spark.readStream.format("synthetic_seq_stream")``."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_seq_stream"

    def schema(self) -> str:
        return "seq_id bigint, val bigint"

    def simpleStreamReader(self, schema):
        return SyntheticSeqStreamReader(self.options)


def register_stream(spark: SparkSession) -> None:
    spark.dataSource.register(SyntheticSeqStreamDataSource)
