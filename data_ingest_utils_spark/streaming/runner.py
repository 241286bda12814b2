"""Streaming execution harness: file-source micro-batch streams with
availableNow triggers into memory sinks.

The engine's event-time transforms (streaming.transforms) are written
against plain DataFrames; this module runs THE SAME transform over an
unbounded file stream — the one-code-path property the batch plans
advertise.  Tests craft parquet micro-batch files with staggered
modification times + ``maxFilesPerTrigger=1`` so watermark/state
semantics are exercised across genuinely separate micro-batches.

100 TB notes: the file source is swapped for Kafka in production; the
transform and sink stages are unchanged.  Memory sinks are test-only —
production sinks are partitioned parquet/Delta with exactly-once via
checkpointing, which this harness also exercises (every run writes a
real checkpoint dir).
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession

#: Explicit stream schema for crafted event micro-batches (µs
#: timestamps — no nanos leniency needed on the streaming path).
#: ts MUST be tz-sensitive TIMESTAMP: Spark (4.1) rejects
#: TIMESTAMP_NTZ event time for watermarks
#: (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE — verified).  The batch twin
#: reads NTZ, so batch==stream value equality relies on the UTC
#: session pin in session.py (spark.sql.session.timeZone=UTC); a
#: non-UTC session shifts streaming window starts by the tz offset.
EVENTS_STREAM_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, value double"
)


def read_parquet_stream(
    spark: SparkSession,
    path: str,
    schema: str = EVENTS_STREAM_SCHEMA,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Unbounded stream over a directory of parquet files, one file per
    micro-batch by default (modification-time order)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def run_available_now(
    df: DataFrame,
    table_name: str,
    output_mode: str = "append",
    timeout_sec: int = 120,
) -> list[dict]:
    """Drain all available input through the streaming query into an
    in-memory table (``spark.table(table_name)``), then stop.  Returns
    the per-micro-batch progress dicts (watermarks, state metrics,
    ``numRowsDroppedByWatermark`` …).

    availableNow honors source rate limits (maxFilesPerTrigger), so
    multi-file inputs run as genuine successive micro-batches with
    watermark advancement and state persistence between them.

    Watermark semantics note (Spark >= 3.4): micro-batch N filters
    late events with the watermark as of batch N-1's START, while
    state eviction uses the watermark as of N's start — so a late row
    is only dropped when it arrives >= 2 batches after the event that
    advanced the watermark past it.
    """
    checkpoint = tempfile.mkdtemp(prefix=f"ckpt_{table_name}_")
    conf = df.sparkSession.conf
    # recentProgress is a ring buffer capped at
    # spark.sql.streaming.numRecentProgressUpdates (default 100):
    # a >100-file source under maxFilesPerTrigger=1 would silently
    # drop the EARLY micro-batches' metrics and undercount
    # numRowsDroppedByWatermark sums.  Raise the cap before the query
    # starts (read at query start), and RESTORE the prior value after
    # the drain — the raise is scoped to this query; leaving it set
    # would make every later streaming query on the shared session
    # retain up to 10000 progress objects (ADVICE r7: slow leak in
    # long-lived sessions).
    _PROGRESS_CAP = "spark.sql.streaming.numRecentProgressUpdates"
    prior_cap = conf.get(_PROGRESS_CAP, None)
    conf.set(_PROGRESS_CAP, "10000")
    # start() sits INSIDE the try: a start-time AnalysisException
    # (invalid plan, sink/mode mismatch) must still restore the cap
    # and drop the checkpoint dir, or the leak this scoping exists to
    # prevent comes back on exactly the failure path.
    query = None
    try:
        query = (
            df.writeStream.format("memory")
            .queryName(table_name)
            .outputMode(output_mode)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        if not query.awaitTermination(timeout_sec):
            raise TimeoutError(f"stream {table_name} did not drain in {timeout_sec}s")
    finally:
        if query is not None and query.isActive:  # pragma: no cover - timeout path
            query.stop()
        # Restore AFTER the query is fully stopped — the cap is read
        # at query start, so this can't retroactively shrink the
        # finished query's buffer, but restoring early could race a
        # concurrent start elsewhere on the session.
        if prior_cap is None:
            conf.unset(_PROGRESS_CAP)
        else:
            conf.set(_PROGRESS_CAP, prior_cap)
        # One-shot drains never resume — drop the checkpoint (also on
        # the timeout path) so repeated runs don't accumulate state
        # dirs under /tmp.  (Resume tests manage their OWN checkpoint
        # and don't go through this helper's cleanup path.)
        shutil.rmtree(checkpoint, ignore_errors=True)
    progress = [p.asDict() if hasattr(p, "asDict") else p for p in query.recentProgress]
    return progress
