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

STATE_SCHEMA = "start long, last long, n long, sv double"


def _session_schema(ts_type) -> str:
    """Output timestamps mirror the input ts type (TIMESTAMP vs
    TIMESTAMP_NTZ) so downstream comparisons are timezone-consistent."""
    t = ts_type.simpleString()  # "timestamp" or "timestamp_ntz"
    return (
        f"user_id long, session_start {t}, session_end {t}, "
        "n_events long, sum_value double"
    )


def _sessionize_fn(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    gap_us: int,
) -> Iterator[pd.DataFrame]:
    """Vectorized session assembly: events are sorted once, segment
    boundaries come from a diff-over-gap mask, and per-segment aggregates
    from ``np.add.reduceat`` — no per-row Python loop (the r01
    anti-pattern). State carries the open session across micro-batches."""
    import numpy as np

    (user_id,) = key
    carried = state.get if state.exists else None
    chunks = list(pdfs)
    pdf = pd.concat(chunks, ignore_index=True) if chunks else pd.DataFrame()
    if len(pdf) == 0:
        # no new events: state (and any open session) is unchanged
        if carried is not None:
            state.update(carried)
        return
    pdf = pdf.sort_values(["ts", "event_id"])
    # normalize to epoch MICROS regardless of the pandas datetime unit —
    # Arrow may deliver datetime64[ns] or datetime64[us] depending on the
    # source column type; a blind astype(int64)//1000 silently mis-scales
    # the [us] case by 1000×.
    ts_us = pdf["ts"].to_numpy(dtype="datetime64[us]").astype("int64")
    vals = pdf["value"].to_numpy(dtype="float64")

    # segment starts: position 0 plus every position whose gap from the
    # previous event exceeds the inactivity gap
    ibrk = np.flatnonzero(np.diff(ts_us) > gap_us) + 1
    offsets = np.concatenate([[0], ibrk])
    seg_start = ts_us[offsets]
    seg_end = ts_us[np.concatenate([ibrk - 1, [len(ts_us) - 1]])]
    seg_n = np.diff(np.concatenate([offsets, [len(ts_us)]]))
    seg_sv = np.add.reduceat(vals, offsets)

    closed: list[tuple] = []
    if carried is not None:
        c_start, c_last, c_n, c_sv = carried
        if ts_us[0] - c_last <= gap_us:
            # first segment continues the carried session
            seg_start[0] = c_start
            seg_n[0] += c_n
            seg_sv[0] += c_sv
        else:
            closed.append((user_id, c_start, c_last, c_n, c_sv))
    # all segments but the last are closed by a following gap
    closed += [
        (user_id, int(seg_start[s]), int(seg_end[s]), int(seg_n[s]), float(seg_sv[s]))
        for s in range(len(seg_start) - 1)
    ]
    state.update(
        (int(seg_start[-1]), int(seg_end[-1]), int(seg_n[-1]), float(seg_sv[-1]))
    )
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
            outputStructType=_session_schema(events_stream.schema["ts"].dataType),
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
