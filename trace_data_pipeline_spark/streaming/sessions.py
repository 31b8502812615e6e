"""Custom stateful streaming operator: gap sessionization with
per-group state (`applyInPandasWithState`).

The batch twin is the catalog's `s1_sessionize` (lag + cumsum windows,
30-minute inactivity gap). Streaming can't window over unbounded
history, so the operator keeps ONE open session per user as state —
(start, last-seen, count, min event id) — and emits a session the
moment a later event closes it by exceeding the gap. State size is
O(active users), independent of stream length; a watermark-based
timeout can evict idle users when run against production traffic.

All timekeeping is integer epoch-MICROSECONDS (pandas `.value // 1000`
on one side, `unix_micros` on the other) so stream and batch compare
exactly — epoch nanoseconds exceed 2^53 and don't round-trip through
doubles.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

GAP_SECONDS = 1800

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start_us", LongType()),
        StructField("session_end_us", LongType()),
        StructField("n_events", LongType()),
        StructField("first_event", LongType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", LongType()),
        StructField("first_event", LongType()),
    ]
)


def streaming_sessionize(
    events: DataFrame,
    gap_seconds: int = GAP_SECONDS,
    ts_col: str = "ts",
    id_col: str = "user_id",
    event_col: str = "event_id",
) -> DataFrame:
    """Emit CLOSED sessions (user_id, start/end micros, n_events,
    min event id). The per-user open session stays in state until a
    later event closes it. Requires micro-batches to deliver each
    user's events in non-decreasing event time (the file-replay and
    production Kafka-keyed layouts both satisfy this); within a batch
    the kernel sorts by (ts, event_id) — the batch twin's tiebreak."""
    gap_us = int(gap_seconds) * 1_000_000

    def kernel(key, pdf_iter, state: GroupState):
        (uid,) = key
        if state.exists:
            start, last, n, first_ev = state.get
        else:
            start = last = first_ev = None
            n = 0
        closed = []
        for pdf in pdf_iter:
            pdf = pdf.sort_values([ts_col, event_col], kind="mergesort")
            for ts, ev in zip(pdf[ts_col], pdf[event_col]):
                t = pd.Timestamp(ts).value // 1000
                ev = int(ev)
                if last is None:
                    start, last, n, first_ev = t, t, 1, ev
                elif t - last > gap_us:
                    closed.append((uid, start, last, n, first_ev))
                    start, last, n, first_ev = t, t, 1, ev
                else:
                    # max(): an out-of-order event inside the gap must
                    # extend the session, never rewind its end bound
                    last = max(last, t)
                    n += 1
                    if ev < first_ev:
                        first_ev = ev
        if last is not None:
            state.update((start, last, n, first_ev))
        if closed:
            yield pd.DataFrame(
                closed, columns=[f.name for f in SESSION_SCHEMA.fields]
            )

    return events.groupBy(id_col).applyInPandasWithState(
        kernel,
        SESSION_SCHEMA,
        _STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
