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


# --------------------------------------------------------------------------
# Spark 4.x-native stateful processing: the same running-count registry on
# transformWithStateInPandas (the successor to applyInPandasWithState —
# typed state variables, store-managed TTL, composable timers). Kept
# alongside the applyInPandasWithState variant so both stateful APIs have
# executed coverage; semantics match test-for-test.
#
# Requires the RocksDB state store provider
# (spark.sql.streaming.stateStore.providerClass =
#  ...state.RocksDBStateStoreProvider) — the HDFS-backed default does not
# support transformWithState. On a cluster RocksDB is what you would run
# anyway (incremental checkpoints, state larger than heap).
TWS_TTL_MS = 7 * 24 * 3600 * 1000  # state TTL, store-managed


def _make_mention_processor():
    """Processor factory (lazy import keeps module import light)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class MentionCountProcessor(StatefulProcessor):
        """Running mention count per (channel, thread_root) key."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            # store-managed TTL replaces the hand-rolled timeout logic the
            # applyInPandasWithState variant needs
            self._n = handle.getValueState(
                "n", "n bigint", ttlDurationMs=TWS_TTL_MS
            )

        def handleInputRows(self, key, rows, timerValues):
            batch_n = sum(len(pdf) for pdf in rows)
            prev = self._n.get()[0] if self._n.exists() else 0
            total = prev + batch_n
            self._n.update((total,))
            channel, thread_root = key
            yield pd.DataFrame(
                {
                    "channel": [channel],
                    "thread_root": [thread_root],
                    "n_mentions": [total],
                }
            )

        def close(self) -> None:
            pass

    return MentionCountProcessor()


def thread_mention_counts_tws(events: DataFrame) -> DataFrame:
    """thread_mention_counts on the transformWithStateInPandas API."""
    keyed = events.withColumn(
        "thread_root", F.coalesce(F.col("thread_ts"), F.col("ts"))
    )
    return keyed.groupBy("channel", "thread_root").transformWithStateInPandas(
        statefulProcessor=_make_mention_processor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
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
