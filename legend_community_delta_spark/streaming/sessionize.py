"""Custom stateful streaming operator: gap-based sessionization.

This is the pattern the built-in windowed aggregations can't express —
sessions close on inactivity gaps, not on wall-clock boundaries — so it
rides ``applyInPandasWithState`` (Arrow-batched, grouped state, timeout
driven).  Batch and streaming share the same semantics; the batch
equivalent (one window + running sum) is in ``demo.sessionize_events``.

State per user: (session_id counter, last event ts, events in session).
On timeout (no events past the gap), the open session is emitted and
state cleared.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("session_id", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("start_us", T.LongType()),
    T.StructField("end_us", T.LongType()),
])

_STATE_SCHEMA = "session_id long, last_us long, n_events long, start_us long"


def _sessionize_group(key, pdfs: Iterable[pd.DataFrame], state: GroupState,
                      gap_us: int, flush_timeout: bool = True):
    (user_id,) = key
    if state.hasTimedOut:
        session_id, last_us, n_events, start_us = state.get
        state.remove()
        yield pd.DataFrame([{
            "user_id": user_id, "session_id": session_id,
            "n_events": n_events, "start_us": start_us, "end_us": last_us}])
        return

    if state.exists:
        session_id, last_us, n_events, start_us = state.get
    else:
        session_id, last_us, n_events, start_us = 0, None, 0, None

    closed = []
    for pdf in pdfs:
        for us in sorted(int(v) for v in pdf["ts_us"]):
            if last_us is not None and us - last_us > gap_us:
                closed.append({
                    "user_id": user_id, "session_id": session_id,
                    "n_events": n_events, "start_us": start_us,
                    "end_us": last_us})
                session_id += 1
                n_events, start_us = 0, None
            if start_us is None:
                start_us = us
            n_events += 1
            last_us = us

    state.update((session_id, last_us, n_events, start_us))
    if flush_timeout:
        state.setTimeoutDuration(gap_us // 1000)
    if closed:
        yield pd.DataFrame(closed)


def sessionize_stream(events: DataFrame, ts_col: str = "ts",
                      user_col: str = "user_id",
                      gap: str = "30 minutes",
                      flush_timeout: bool = True) -> DataFrame:
    """Streaming sessionization over an event stream.

    Emits one row per *closed* session (update mode).  The state store
    holds one small tuple per active user — bounded by the processing
    timeout, not by history length.

    ``flush_timeout=False`` disables the processing-time timeout (idle
    sessions are then only closed by a later event, never by inactivity).
    Use it for one-shot ``availableNow`` backfills: a pending timeout
    keeps the query alive past the last batch, so with it disabled the
    run terminates as soon as the data is drained.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import TimestampNTZType

    gap_us = _parse_gap_us(gap)
    # TIMESTAMP_NTZ never goes through CAST(... AS TIMESTAMP): that would
    # apply the session timezone and shift gaps across DST transitions —
    # µs-since-epoch is computed timezone-free instead
    if isinstance(events.schema[ts_col].dataType, TimestampNTZType):
        ts_us = F.expr(
            f"timestampdiff(MICROSECOND, "
            f"TIMESTAMP_NTZ '1970-01-01 00:00:00', {ts_col})")
    else:
        ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prepared = events.select(
        F.col(user_col).cast("long").alias("user_id"),
        ts_us.alias("ts_us"))

    def fn(key, pdfs, state):
        return _sessionize_group(key, pdfs, state, gap_us, flush_timeout)

    timeout_conf = (GroupStateTimeout.ProcessingTimeTimeout
                    if flush_timeout else GroupStateTimeout.NoTimeout)
    return (prepared.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout_conf))


def _parse_gap_us(gap: str) -> int:
    amount, unit = gap.split()
    units = {"second": 1, "seconds": 1, "minute": 60, "minutes": 60,
             "hour": 3600, "hours": 3600}
    return int(amount) * units[unit] * 1_000_000
