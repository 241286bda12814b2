"""Custom stateful streaming operators via applyInPandasWithState.

``running_counter`` is the streaming twin of the batch
``evt_stateful_counter`` plan (cumulative per-user event count): state
is one long per user, each micro-batch emits its input rows with the
updated running total.  Equivalence with the batch window phrasing is
asserted in tests/test_streaming.py.

100 TB notes: state lives in the executor state store (RocksDB in
production), partitioned by the grouping key — the shuffle is on
user_id only, and each micro-batch touches only keys present in that
batch.  Pair with a watermark + timeout to expire idle keys; here the
counter is intentionally unbounded (NoTimeout) to mirror the batch
cumulative window exactly.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: Output rows: the input row identity plus the running total.
COUNTER_OUTPUT_SCHEMA = "user_id long, event_id long, n_so_far long"
#: Per-user state: a single running count.
COUNTER_STATE_SCHEMA = "n long"


def _counter_fn(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (n,) = state.get if state.exists else (0,)
    out = []
    for pdf in pdfs:
        # ts-then-event_id order inside the batch mirrors the batch
        # window's ORDER BY ts, event_id.
        pdf = pdf.sort_values(["ts", "event_id"])
        for eid in pdf["event_id"]:
            n += 1
            out.append((key[0], int(eid), n))
    state.update((n,))
    yield pd.DataFrame(out, columns=["user_id", "event_id", "n_so_far"])


def running_counter(events: DataFrame) -> DataFrame:
    """Per-user running event count over a STREAMING DataFrame; state
    persists across micro-batches."""
    return events.groupBy("user_id").applyInPandasWithState(
        _counter_fn,
        COUNTER_OUTPUT_SCHEMA,
        COUNTER_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def running_counter_tws(events: DataFrame) -> DataFrame:
    """Per-user running count via ``transformWithStateInPandas`` —
    Spark 4's successor to applyInPandasWithState: typed state handles
    (value/list/map), timers, TTL.  Semantics here are identical to
    :func:`running_counter`; equality is asserted in
    tests/test_streaming.py (environment-gated).

    Environment requirements, both enforced by Spark at query start:
    - RocksDB state store provider
      (``spark.sql.streaming.stateStore.providerClass``);
    - a working ``google.protobuf`` (the transformWithState Python
      driver worker speaks protobuf to the JVM).  This container's
      protobuf install is broken (``cannot import name 'descriptor'``),
      so the API is exercised only where the import succeeds — the
      applyInPandasWithState twin above carries the tested semantics.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class CounterProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._count = handle.getValueState("count", "n long")

        def handleInputRows(self, key, rows, timerValues):
            n = self._count.get()[0] if self._count.exists() else 0
            out = []
            for pdf in rows:
                pdf = pdf.sort_values(["ts", "event_id"])
                for eid in pdf["event_id"]:
                    n += 1
                    out.append((key[0], int(eid), n))
            self._count.update((n,))
            yield pd.DataFrame(out, columns=["user_id", "event_id", "n_so_far"])

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=CounterProcessor(),
        outputStructType=COUNTER_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


#: Funnel output: running per-user totals (update mode — totals are
#: monotonic, so the latest row per user is the answer).
FUNNEL_OUTPUT_SCHEMA = "user_id long, n_purchases long, n_converted long"
#: Per-user state: last signup event time (µs; -1 = none seen) and the
#: running purchase/conversion totals.
FUNNEL_STATE_SCHEMA = "last_signup_us long, n_purchases long, n_converted long"

#: 30-minute conversion window, in microseconds.
_FUNNEL_GAP_US = 30 * 60 * 1_000_000


def _funnel_fn(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    last_signup_us, n_p, n_c = (
        state.get if state.exists else (-1, 0, 0)
    )
    for pdf in pdfs:
        # In-batch order mirrors the batch plan's ORDER BY ts,
        # event_id; cross-batch order is the stream's arrival order
        # (event-time ordered micro-batches in the tests).
        pdf = pdf.sort_values(["ts", "event_id"])
        for ts, etype in zip(pdf["ts"], pdf["event_type"]):
            ts_us = ts.value // 1_000
            if etype == "signup":
                last_signup_us = ts_us
            elif etype == "purchase":
                n_p += 1
                if last_signup_us >= 0 and ts_us - last_signup_us <= _FUNNEL_GAP_US:
                    n_c += 1
    state.update((last_signup_us, n_p, n_c))
    yield pd.DataFrame(
        [(key[0], n_p, n_c)],
        columns=["user_id", "n_purchases", "n_converted"],
    )


def funnel_detector(events: DataFrame) -> DataFrame:
    """Streaming signup->purchase-within-30-min funnel — the stateful
    CEP twin of the batch ``evt_funnel_conversion`` plan: one long of
    state per user (the last signup time) instead of the batch
    window's unbounded-preceding frame.  State shuffles on user_id
    only; pair with a timeout in production to expire users whose
    signup can no longer convert (bounded state at 100 TB/day)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _funnel_fn,
        FUNNEL_OUTPUT_SCHEMA,
        FUNNEL_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
