"""Custom stateful streaming operators via applyInPandasWithState.

The reference needs no custom state (SURVEY §2.8) — this is the engine's
extension point for operators Spark's built-ins can't express: per-key
state machines over unbounded streams. First instance: streaming
sessionization with an inactivity gap, the streaming twin of the batch
``events_sessionize`` query (incremental == batch for closed sessions).

Scale: state is partitioned by the group key across executors; each
micro-batch touches only keys present in the batch; emitted rows are
closed sessions (append semantics), so state size is bounded by active
keys, not history.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, sum_value double"
)
STATE_SCHEMA = "start long, last long, n long, sv double"


def _sessionize_fn(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    gap_us: int,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        start, last, n, sv = state.get
    else:
        start = last = None
        n, sv = 0, 0.0
    closed: list[tuple] = []
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        for ts, val in zip(pdf["ts"], pdf["value"]):
            ts_us = int(ts.value // 1000)  # pandas ns → µs
            if last is not None and ts_us - last > gap_us:
                closed.append((user_id, start, last, n, sv))
                start, n, sv = ts_us, 0, 0.0
            if start is None:
                start = ts_us
            last = ts_us
            n += 1
            sv += float(val)
    state.update((start, last, n, sv))
    if closed:
        out = pd.DataFrame(
            closed,
            columns=["user_id", "session_start", "session_end", "n_events", "sum_value"],
        )
        out["session_start"] = pd.to_datetime(out["session_start"], unit="us")
        out["session_end"] = pd.to_datetime(out["session_end"], unit="us")
        yield out


def streaming_sessionize(
    events_stream: DataFrame, gap_seconds: int = 1800
) -> DataFrame:
    """Per-user streaming sessionization: emits a session row when the
    inactivity gap closes it; open sessions live in state across
    micro-batches. Requires columns (user_id, event_id, ts, value)."""
    gap_us = gap_seconds * 1_000_000

    def fn(key, pdfs, state):
        yield from _sessionize_fn(key, pdfs, state, gap_us)

    return (
        events_stream.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
