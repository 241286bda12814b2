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
    """Idempotently register the source on a session."""
    spark.dataSource.register(SyntheticSeqDataSource)


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
