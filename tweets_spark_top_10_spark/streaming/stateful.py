"""Arbitrary stateful streaming: gap-based sessionization with
``applyInPandasWithState``.

The built-in ``session_window`` covers plain gap sessions;
this operator is the template for state machines the built-ins can't
express (per-key counters, custom merge/expiry logic).  Design:

- State per key is a compact numeric tuple (epoch-micros + count) — the
  state store moves GBs at scale, so no nested/py-object state.
- Sessions closed *within* a batch emit immediately; the trailing open
  session lives in the state store with an event-time timeout of
  ``session_end + gap``, so expiry is driven by the watermark, not by
  more data arriving for that key.
- Output is append-mode: rows are final when emitted (mirrors the
  reference's "recompute then replace" hour semantics without the ES
  delete dance, App.java:146-157).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n", LongType()),
    ]
)

_US = 1_000_000


def sessionize_with_state(
    stream: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap_seconds: int = 7200,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Sessionize a keyed event stream with an inactivity gap.

    Returns closed sessions only (append mode): a session closes when a
    later event of the same key breaks the gap, or when the event-time
    watermark passes ``session_end + gap``.
    """
    gap_us = gap_seconds * _US

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key

        def emit(start_us: int, end_us: int, n: int) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(end_us, unit="us")],
                    "n_events": [n],
                }
            )

        if state.hasTimedOut:
            start_us, end_us, n = state.get
            state.remove()
            yield emit(start_us, end_us, n)
            return

        ts_us = sorted(
            int(t.value) // 1000  # pandas Timestamp.value is nanoseconds
            for pdf in pdfs
            for t in pdf[ts_col]
            if t is not None
        )
        if not ts_us:
            return
        if state.exists:
            cur_start, cur_end, cur_n = state.get
        else:
            cur_start, cur_end, cur_n = 0, 0, 0
        for t in ts_us:
            if cur_n > 0 and t - cur_end > gap_us:
                yield emit(cur_start, cur_end, cur_n)
                cur_start, cur_end, cur_n = t, t, 1
            else:
                if cur_n == 0:
                    cur_start = t
                else:
                    # A late-but-within-watermark event can predate the
                    # stored session's start (cross-batch arrival);
                    # session_window semantics start the merged session
                    # at the earliest member.
                    cur_start = min(cur_start, t)
                cur_end = max(cur_end, t)
                cur_n += 1
        state.update((cur_start, cur_end, cur_n))
        # epoch-millis timeout: fires once the watermark passes end + gap
        state.setTimeoutTimestamp((cur_end + gap_us) // 1000)

    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
