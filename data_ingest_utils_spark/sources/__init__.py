"""Sources and sinks (SURVEY.md §2a)."""

from data_ingest_utils_spark.sources.readers import (
    TABLES,
    load_table,
    read_csv,
    read_jsonl,
)
from data_ingest_utils_spark.sources.writers import write_partitioned

__all__ = ["TABLES", "load_table", "read_csv", "read_jsonl", "write_partitioned"]
