"""Custom stateful streaming operators — T4/T5/T6 via
``applyInPandasWithState`` (SURVEY §2.9, §4.2).

These are the three operators Flink implements with keyed state that
have no one-line Spark equivalent in streaming mode. Each mirrors its
batch-replay twin in operators/stateful.py; tests assert the two agree
on identical input.

Input contract (flat, Kafka-friendly): ``mid string, ts long (epoch
ms), flag string, payload string`` — ``flag`` carries the operator-
specific attribute (claimed is_new / is-entry marker), ``payload`` the
untouched event JSON, so the operators compose with any upstream shape.

Ordering: Structured Streaming does not order rows within a micro-batch;
each operator sorts its group's batch rows by (ts, payload). Cross-batch
order is the source's append order (file source: file sequence).

Scale note: state per key is O(1) (a date string / marker / one pending
event), the same footprint as the reference's ValueState. Shuffle is
one hash partition on mid per micro-batch — identical to Flink keyBy.
"""

from __future__ import annotations

from collections.abc import Iterable
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

EVENT_SCHEMA = StructType(
    [
        StructField("mid", StringType()),
        StructField("ts", LongType()),
        StructField("flag", StringType()),
        StructField("payload", StringType()),
    ]
)

_STATE_ONE_STR = StructType([StructField("v", StringType())])
_STATE_PENDING = StructType([StructField("ts", LongType()), StructField("payload", StringType())])


def _sorted_concat(pdfs: Iterable[pd.DataFrame]) -> pd.DataFrame:
    frames = [p for p in pdfs if len(p)]
    if not frames:
        return pd.DataFrame(columns=["mid", "ts", "flag", "payload"])
    return pd.concat(frames).sort_values(["ts", "payload"], kind="mergesort")


def _fix_is_new_fn(key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState):
    """T6 — dwd/BaseLogApp.java:64-95: a claimed is_new='1' survives only
    on the mid's first-ever event; state is a seen marker."""
    pdf = _sorted_concat(pdfs)
    seen = state.exists
    out_flags = []
    for flag in pdf["flag"]:
        if flag == "1" and seen:
            out_flags.append("0")
        else:
            out_flags.append(flag)
        seen = True
    if len(pdf) and not state.exists:
        state.update(("seen",))
    pdf = pdf.assign(flag=out_flags)
    yield pdf


def _ship(df: DataFrame) -> None:
    from gmall_flink_210726_spark.session import ship_package

    ship_package(df.sparkSession)


def streaming_fix_is_new(df: DataFrame) -> DataFrame:
    _ship(df)
    return df.groupBy("mid").applyInPandasWithState(
        _fix_is_new_fn, EVENT_SCHEMA, _STATE_ONE_STR, "append", GroupStateTimeout.NoTimeout
    )


def _daily_uv_fn(key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState):
    """T5 — dwm/UniqueVisitApp.java:70-91: emit the mid's first event per
    day; state is the last emitted visit date (the reference's 24 h TTL
    re-keys by day — replay keeps the date string)."""
    pdf = _sorted_concat(pdfs)
    last_date = state.get[0] if state.exists else None
    keep = []
    for _, row in pdf.iterrows():
        day = pd.Timestamp(row["ts"], unit="ms").strftime("%Y-%m-%d")
        if day != last_date:
            keep.append(row)
            last_date = day
    if len(pdf):
        state.update((last_date,))
    yield (
        pd.DataFrame(keep, columns=pdf.columns)
        if keep
        else pd.DataFrame(columns=pdf.columns)
    )


def streaming_daily_uv(df: DataFrame) -> DataFrame:
    _ship(df)
    return df.groupBy("mid").applyInPandasWithState(
        _daily_uv_fn, EVENT_SCHEMA, _STATE_ONE_STR, "append", GroupStateTimeout.NoTimeout
    )


_JUMP_TIMEOUT_MS = 60_000


def _detect_jumps_fn(key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState):
    """T4 — dwm/UserJumpDetailApp.java:65-96, full CEP semantics:

    state = pending session-entry event (flag='entry'). On each next
    event of the mid, ordered by ts:
      - next within 60 s and also an entry  → pending is a jump (matched
        branch); next becomes pending.
      - next within 60 s, not an entry      → pending cleared (normal
        navigation).
      - next later than 60 s                → pending is a jump (timeout
        branch); next becomes pending iff it is an entry.
    An event-time timer emits a still-pending entry once the watermark
    passes pending.ts + 60 s (the CEP within-timeout with no successor).
    """
    rows_out: list[dict] = []
    mid = key[0]

    if state.hasTimedOut:
        if state.exists:
            ts, payload = state.get
            rows_out.append({"mid": mid, "ts": ts, "flag": "jump", "payload": payload})
            state.remove()
        yield pd.DataFrame(rows_out, columns=["mid", "ts", "flag", "payload"])
        return

    pdf = _sorted_concat(pdfs)
    pending: tuple[int, str] | None = tuple(state.get) if state.exists else None
    for _, row in pdf.iterrows():
        ts, flag, payload = int(row["ts"]), row["flag"], row["payload"]
        is_entry = flag == "entry"
        if pending is not None:
            delta = ts - pending[0]
            if delta > _JUMP_TIMEOUT_MS or is_entry:
                rows_out.append(
                    {"mid": mid, "ts": pending[0], "flag": "jump", "payload": pending[1]}
                )
            pending = None
        if is_entry:
            pending = (ts, payload)
    if pending is not None:
        deadline = pending[0] + _JUMP_TIMEOUT_MS
        # Another key may already have pushed the global watermark past
        # this pending entry's deadline — its timer can never be set
        # (Spark rejects timestamps behind the watermark); the timeout
        # branch fires now instead.
        if state.getCurrentWatermarkMs() >= deadline:
            rows_out.append(
                {"mid": mid, "ts": pending[0], "flag": "jump", "payload": pending[1]}
            )
            if state.exists:
                state.remove()
        else:
            state.update(pending)
            state.setTimeoutTimestamp(deadline)
    elif state.exists:
        state.remove()
    yield pd.DataFrame(rows_out, columns=["mid", "ts", "flag", "payload"])


def streaming_detect_jumps(df: DataFrame, watermark_delay: str = "5 seconds") -> DataFrame:
    """df needs an ``event_time`` timestamp column (for the watermark
    that drives the event-time timer; 5 s ≈ the reference's
    out-of-orderness at dwm/UserJumpDetailApp.java:56-61)."""
    import pyspark.sql.functions as F

    _ship(df)
    with_wm = df.withColumn("event_time", F.timestamp_millis("ts")).withWatermark(
        "event_time", watermark_delay
    )
    return with_wm.groupBy("mid").applyInPandasWithState(
        _detect_jumps_fn,
        EVENT_SCHEMA,
        _STATE_PENDING,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )
