"""Window transforms applied identically to batch and streaming
DataFrames (the Structured Streaming unbounded-table property).

All output floats that depend on aggregation order are ROUND(…, 6)
to satisfy the cross-engine oracle (SURVEY §7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: tz-independent epoch seconds for a TIMESTAMP_NTZ column, with FLOOR
#: semantics (matching DuckDB's floor(epoch(ts)) in the oracles):
#: timestampdiff(SECOND, ...) truncates toward zero, which diverges by
#: one second for pre-epoch timestamps with fractional seconds, so the
#: µs diff is floored exactly in long arithmetic via the pmod identity
#: (x - pmod(x, d)) div d == floor(x / d).  Single source — import
#: this, never re-define it.
_EPOCH_US = "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {col})"
EPOCH_SECONDS = f"(({_EPOCH_US} - pmod({_EPOCH_US}, 1000000)) div 1000000)"


def tumbling_agg(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """Tumbling count+sum per event_type.  Streaming: one state entry
    per (window, type); pair with a watermark to expire state."""
    return (
        events.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("sum_value"))
        .select(F.col("w.start").alias("bucket_start"), "event_type", "n", "sum_value")
    )


def sliding_agg(
    events: DataFrame, width: str = "1 hour", slide: str = "15 minutes"
) -> DataFrame:
    """Sliding window count+sum (each event in width/slide windows)."""
    return (
        events.groupBy(F.window("ts", width, slide).alias("w"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("sum_value"))
        .select(F.col("w.start").alias("bucket_start"), "n", "sum_value")
    )


def session_agg(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Per-user session windows (gap-merged).  session_window.start
    equals min(ts) of the session; duration is computed on floored
    epoch seconds so batch, streaming, and the DuckDB oracle agree."""
    sec = F.expr(EPOCH_SECONDS.format(col="ts"))
    return (
        events.withColumn("_sec", sec)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("_sec").alias("_sec_min"),
            F.max("_sec").alias("_sec_max"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            (F.col("_sec_max") - F.col("_sec_min")).alias("dur_sec"),
        )
    )


def watermarked_tumbling(
    events: DataFrame, watermark: str = "10 minutes", width: str = "1 hour"
) -> DataFrame:
    """Tumbling agg with a watermark: in streaming, events later than
    (max event time - watermark) are dropped and window state expires;
    in batch the watermark is a documented no-op."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("bucket_start"), "event_type", "n")
    )
