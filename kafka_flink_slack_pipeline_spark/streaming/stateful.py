"""Custom keyed-state operators via applyInPandasWithState (ST1 upgrade
path) and streaming session windows.

`thread_registry_stream` (event_server.py) covers ST1 with built-in
`dropDuplicates` + watermark. This module is the arbitrary-state variant
the north star asks for ("applyInPandasWithState for custom stateful
operators"): per-key Python state with explicit TTL, for semantics the
built-ins can't express — here, a running mention COUNT per thread (the
reference's `Set` can only answer membership; a registry that counts
engagement per thread needs real state).

Scale notes: state lives in the state store (RocksDB on a cluster),
partitioned by key — the Python function only ever sees one key's rows
per call, Arrow-batched. TTL via processing-time timeout bounds state
exactly like the watermark TTL on the dropDuplicates variant.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "channel string, thread_root string, n_mentions bigint"
STATE_SCHEMA = "n bigint"
TTL_MS = 7 * 24 * 3600 * 1000  # 7-day event-time TTL


def _count_mentions(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-(channel, thread_root): emit the running mention count."""
    if state.hasTimedOut:
        state.remove()
        return
    batch_n = 0
    last_event_ms = 0
    for pdf in pdfs:
        batch_n += len(pdf)
        if len(pdf):
            last_event_ms = max(
                last_event_ms, int(pdf["event_time"].max().value // 1_000_000)
            )
    prev = state.get[0] if state.exists else 0
    total = prev + batch_n
    state.update((total,))
    # event-time TTL anchored on the LAST ACTIVITY in the data, not on
    # getCurrentWatermarkMs(): the watermark is still 0 during the first
    # batch, which would set a 1970s timeout and expire the state
    # immediately. (Processing-time timeouts are also out: they keep an
    # availableNow drain alive forever servicing re-armed timers.)
    state.setTimeoutTimestamp(last_event_ms + TTL_MS)
    channel, thread_root = key
    yield pd.DataFrame(
        {
            "channel": [channel],
            "thread_root": [thread_root],
            "n_mentions": [total],
        }
    )


def thread_mention_counts(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming running count of mentions per (channel, thread_root).

    Input: SLACK_EVENT_SCHEMA stream. Output (update mode): one row per
    key per batch with the cumulative count — state carries across
    micro-batches and expires 7 days (event time) after last activity."""
    keyed = (
        events.withColumn(
            "event_time", F.col("ts").cast("double").cast("timestamp")
        )
        .withWatermark("event_time", watermark)
        .withColumn("thread_root", F.coalesce(F.col("thread_ts"), F.col("ts")))
    )
    return keyed.groupBy("channel", "thread_root").applyInPandasWithState(
        _count_mentions,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def sessionized_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming session windows: per-key sessions closed after `gap` of
    inactivity (the built-in F.session_window — dynamic, data-driven
    windows; state bounded by the watermark). Batch frames run the same
    expression."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.session_window(F.col(ts_col), gap).alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            key_col,
            "n_events",
        )
    )
