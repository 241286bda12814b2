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

import contextlib
import shutil
import tempfile
import threading
from collections.abc import Callable

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
    state_partitions: int | None = 8,
    no_data_batches: bool | None = None,
) -> list[dict]:
    """Drain all available input through the streaming query into an
    in-memory table (``spark.table(table_name)``), then stop.  Returns
    the per-micro-batch progress dicts (watermarks, state metrics,
    ``numRowsDroppedByWatermark`` …).

    availableNow honors source rate limits (maxFilesPerTrigger), so
    multi-file inputs run as genuine successive micro-batches with
    watermark advancement and state persistence between them.

    ``state_partitions`` (VERDICT r10 #5): every drain through here
    latches a DELIBERATE state-store count instead of inheriting the
    batch-tuned session default (32) — per-batch store snapshot/commit
    overhead is fixed per store, so fixture-volume state pays 32×
    that tax for nothing (see :func:`state_partitions_scope` for the
    stream-stream measurement, 14.5 → 6.25 s at sf1; the multi-batch
    test drains measure 1.36× end-to-end, BASELINE.md).  State is
    hash-distributed, so outputs and metric SUMS are store-count
    invariant (asserted in tests/test_streaming.py).  Pass ``None``
    to inherit the session value, or an int to size for real state
    volume (at 100 TB: ~2-4× total executor cores).

    Watermark semantics note (Spark >= 3.4): micro-batch N filters
    late events with the watermark as of batch N-1's START, while
    state eviction uses the watermark as of N's start — so a late row
    is only dropped when it arrives >= 2 batches after the event that
    advanced the watermark past it.

    ``no_data_batches`` (round 17, guide §1/§5 — per-drain overhead):
    ``False`` scopes ``spark.sql.streaming.noDataMicroBatches.enabled``
    off for this drain, skipping the trailing empty micro-batch
    availableNow otherwise runs after the data is drained.  That
    trailing batch exists to let WATERMARK-GATED emission flush
    (append-mode windowed aggs emit a window only once the watermark
    passes it) — so it is ONLY safe to skip for sinks whose every
    output row is emitted in the data batches themselves: stateless
    maps, update/complete-mode aggs, and stream-stream INNER joins
    (matches emit on arrival; the watermark only GCs state, moot once
    the one-shot drain ends).  Measured on evt_stream_stream_join at
    sf1 (interleaved same-session A/B, 5 reps): median 4.01 → 2.46 s,
    identical 3420-row output.  ``None`` (default) inherits the
    session value — append-mode windowed aggregations MUST keep it.
    """
    scope = (
        state_partitions_scope(df.sparkSession, state_partitions)
        if state_partitions is not None
        else contextlib.nullcontext()
    )
    nd_scope = (
        _session_conf_scope(
            df.sparkSession, _ND_KEY, "true" if no_data_batches else "false"
        )
        if no_data_batches is not None
        else contextlib.nullcontext()
    )
    with scope, nd_scope:
        query = drain_available_now(
            df,
            lambda w: w.format("memory").queryName(table_name).outputMode(output_mode),
            name=table_name,
            timeout_sec=timeout_sec,
        )
    return [p.asDict() if hasattr(p, "asDict") else p for p in query.recentProgress]


_PROGRESS_CAP = "spark.sql.streaming.numRecentProgressUpdates"
_CAP_LOCK = threading.Lock()
_CAP_DEPTH = 0
_CAP_PRIOR: str | None = None


@contextlib.contextmanager
def _progress_cap_scope(conf):
    """Refcounted scope for the progress-cap raise.

    recentProgress is a ring buffer capped at
    spark.sql.streaming.numRecentProgressUpdates (default 100): a
    >100-file source under maxFilesPerTrigger=1 would silently drop
    the EARLY micro-batches' metrics and undercount
    numRowsDroppedByWatermark sums, so drains raise the cap before the
    query starts (the conf is read at query start) and restore it
    after — leaving it raised would make every later streaming query
    on the shared session retain up to 10000 progress objects (ADVICE
    r7: slow leak in long-lived sessions).

    The refcount + lock make the save/set/restore safe under
    CONCURRENT drains on one session (a plain read-modify-restore
    pair can strand the 10000 cap, or restore the default mid-drain
    and undercount a sibling — round-8 review): the FIRST scope in
    saves the prior value, the LAST one out restores it, and every
    nested/overlapping drain inside just rides the raised cap.
    Python-side only — out-of-process writers to the same conf are
    outside its reach, like any session conf.
    """
    global _CAP_DEPTH, _CAP_PRIOR
    with _CAP_LOCK:
        if _CAP_DEPTH == 0:
            _CAP_PRIOR = conf.get(_PROGRESS_CAP, None)
            conf.set(_PROGRESS_CAP, "10000")
        _CAP_DEPTH += 1
    try:
        yield
    finally:
        with _CAP_LOCK:
            _CAP_DEPTH -= 1
            if _CAP_DEPTH == 0:
                if _CAP_PRIOR is None:
                    conf.unset(_PROGRESS_CAP)
                else:
                    conf.set(_PROGRESS_CAP, _CAP_PRIOR)


_SPS_KEY = "spark.sql.shuffle.partitions"
_ND_KEY = "spark.sql.streaming.noDataMicroBatches.enabled"
_SPS_LOCK = threading.Lock()
#: Per-(session, conf-key) scope state, keyed by
#: ``(_session_key(spark), conf_key)``: {"prior": str, "active":
#: [(token, value), ...]}.  Keyed per session (ADVICE r10) so
#: concurrent scopes on TWO different SparkSessions save/restore each
#: session's own prior instead of sharing one global — a second
#: session's first scope must not adopt (or clobber) the first
#: session's saved value.  Entries are deleted when their last scope
#: exits, so key reuse after a session is GC'd cannot alias live
#: state.  Generalized round 17 (was shuffle-partitions-only) so the
#: no-data-micro-batch dial rides the same leak-proof machinery.
_SPS_STATE: dict[object, dict] = {}


def _session_key(spark: SparkSession):
    """Session-STABLE identity for the scope state (ADVICE r11):
    ``id(spark)`` keys the Python WRAPPER, and two distinct wrappers
    over the same underlying session (``getActiveSession()`` vs a
    stored handle) share one conf — under id()-keying each would get
    an independent "prior" entry, and one scope could capture
    another's temporary value as the prior it restores.  The JVM
    SparkSession's identity hash is stable across any number of
    Python wrappers and distinct per underlying session — keyed by
    ``sessionUUID`` (ADVICE r12: identityHashCode is stable but only
    32 bits, so two live sessions can collide and alias each other's
    scope state), with identityHashCode as the fallback where a Spark
    build lacks it; the ``id(spark)`` fallback only fires where no
    JVM handle exists (mocks in unit tests), where a second wrapper
    can't arise."""
    try:
        jvm_session = spark._jsparkSession
        try:
            # genuinely unique per session (ADVICE r12): the 32-bit
            # identityHashCode is stable but CAN collide across two
            # live sessions, aliasing their scope state
            return ("jvm", str(jvm_session.sessionUUID()))
        except Exception:
            return ("jvm", spark._jvm.System.identityHashCode(jvm_session))
    except Exception:
        return ("py", id(spark))


@contextlib.contextmanager
def _session_conf_scope(spark: SparkSession, conf_key: str, value: str):
    """Scoped session-conf override with stacked, refcounted
    save/restore — the leak-proofing documented on
    :func:`state_partitions_scope`, factored out (round 17) so any
    drain-scoped conf (shuffle partitions, no-data micro-batches)
    shares ONE correct implementation instead of drifted copies.
    Within a (session, conf_key) the FIRST scope in saves the session
    value, the LAST one out restores it; each exit re-asserts the most
    recent still-active scope's value for well-nested use."""
    conf = spark.conf
    token = object()
    key = (_session_key(spark), conf_key)
    with _SPS_LOCK:
        state = _SPS_STATE.get(key)
        if state is None:
            state = _SPS_STATE[key] = {
                "prior": conf.get(conf_key),
                "active": [],
            }
        state["active"].append((token, str(value)))
        conf.set(conf_key, str(value))
    try:
        yield
    finally:
        with _SPS_LOCK:
            state = _SPS_STATE[key]
            active = state["active"]
            for i in range(len(active) - 1, -1, -1):
                if active[i][0] is token:
                    del active[i]
                    break
            if active:
                conf.set(conf_key, active[-1][1])
            else:
                conf.set(conf_key, state["prior"])
                del _SPS_STATE[key]


def state_partitions_scope(spark: SparkSession, n: int):
    """Scoped ``spark.sql.shuffle.partitions`` for ONE stateful drain.

    A streaming query latches shuffle partitions at first start as its
    state-store count, so the batch-tuned session default (32) also
    sizes per-micro-batch state overhead: every store pays fixed
    snapshot/commit cost per batch regardless of how few rows it
    holds.  Measured on evt_stream_stream_join at sf1 (1 M staged
    events, one availableNow batch): median 14.5 s at 32 stores vs
    6.25 s at 8 vs 7.6 s at 16, identical 3420-row output — state is
    hash-distributed, so results are partition-count invariant and
    hash certificates are unaffected.  At 100 TB the same dial sizes
    UP (stores ≈ 2-4× total executor cores, rescalable only by state
    rebalance): the point is that state parallelism is a deliberate,
    state-volume-sized choice, not the inherited batch default.

    Leak-proof under both nesting and concurrent drains, and scoped
    PER SESSION (ADVICE r10 — two sessions' scopes never share a
    saved prior): within a session the FIRST scope in saves the
    session value, the LAST one out restores it — a plain per-scope save/restore pair could
    strand an inner scope's value as the "prior" and permanently cut
    every later batch plan's shuffle parallelism.  Overlapping scopes
    with DIFFERENT n still race on which value a concurrently
    starting query latches (one global conf — unavoidable), but the
    session always exits to its original value; each exit re-asserts
    the most recent still-active scope's value for well-nested use.
    """
    return _session_conf_scope(spark, _SPS_KEY, str(n))


def drain_available_now(
    df: DataFrame,
    configure: Callable,
    name: str = "drain",
    timeout_sec: int = 120,
):
    """Shared one-shot availableNow drain: checkpoint tmpdir +
    progress-cap scope + start/await/stop + checkpoint cleanup, with
    the sink-specific writer options supplied by ``configure(writer)``
    (memory sink, foreachBatch, …).  Returns the finished query (for
    recentProgress).  This is the ONE copy of the drain plumbing —
    evt_foreach_batch_sink used to carry a drifted inline twin
    (round-8 review).

    start() sits INSIDE the try: a start-time AnalysisException
    (invalid plan, sink/mode mismatch) must still restore the cap and
    drop the checkpoint dir.  The cap restore happens after the query
    is fully stopped — the cap is read at query start, so the order
    can't shrink a finished query's buffer.  One-shot drains never
    resume, so the checkpoint is dropped in the same finally (resume
    tests manage their OWN checkpoint and don't come through here).
    """
    checkpoint = tempfile.mkdtemp(prefix=f"ckpt_{name}_")
    query = None
    with _progress_cap_scope(df.sparkSession.conf):
        try:
            query = (
                configure(df.writeStream)
                .option("checkpointLocation", checkpoint)
                .trigger(availableNow=True)
                .start()
            )
            if not query.awaitTermination(timeout_sec):
                raise TimeoutError(f"stream {name} did not drain in {timeout_sec}s")
        finally:
            if query is not None and query.isActive:  # pragma: no cover - timeout
                query.stop()
            shutil.rmtree(checkpoint, ignore_errors=True)
    return query
