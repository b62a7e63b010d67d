"""Streaming face of operators/windows.py events_anomaly_zscore — the
trailing-window z-score monitor as keyed streaming state.

The batch operator scores each event against the 20 PRECEDING events of
its type under a total (ts, event_id) order; a stream cannot see
"preceding by timestamp" without reordering, so this face scores against
the last 20 ARRIVED events, with each micro-batch internally sorted by
(ts, event_id). When arrival order follows event time (the monotone
ingest the parity test constructs, and the normal case for a live
monitor), the two definitions coincide row for row — the parity test
pins flagged event_ids AND zscores equal to the batch operator's.

Decision math is the batch op's INTEGER-CENTS arithmetic verbatim
((n·x − S)² > 9(n·Q − S²) over exact 2-dp values; zero-variance spikes
flagged with NULL z), so stream and batch cannot diverge by float rules.

State per event_type: a 20-slot ring of int64 cents + a last-seen
event-time ms — bounded by construction (the monitor's whole point),
evicted by event-time timeout after _ANOM_TTL_MS of silence. At 100
TB/day the shuffle key is event_type (metric series); a deployment with
few heavy series would sub-key by source shard and merge, the standard
sharded-monitor layout.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

from ..operators.windows import _ANOM_LOOKBACK, _ANOM_Z

ANOMALY_OUTPUT = (
    "event_id bigint, ts timestamp, event_type string, value double, "
    "zscore double"
)
ANOMALY_STATE = "ring string, last_ms bigint"
_ANOM_TTL_MS = 24 * 3600 * 1000


def _score_events(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        state.remove()
        return
    rows = [pdf for pdf in pdfs if len(pdf)]
    if not rows:
        return
    batch = pd.concat(rows).sort_values(["ts", "event_id"])
    if state.exists:
        ring_csv, last_ms = state.get
        ring = [int(x) for x in ring_csv.split(",")] if ring_csv else []
    else:
        ring, last_ms = [], 0
    n = _ANOM_LOOKBACK
    out = []
    for r in batch.itertuples():
        vc = int(round(r.value * 100))
        if len(ring) == n:
            s = sum(ring)
            q = sum(x * x for x in ring)
            dev = n * vc - s
            den = n * q - s * s
            if den > 0 and dev * dev > _ANOM_Z * _ANOM_Z * den:
                z = round(dev / math.sqrt(den), 4)
                out.append((int(r.event_id), r.ts, key[0], r.value, z))
            elif den == 0 and dev != 0:
                out.append((int(r.event_id), r.ts, key[0], r.value, None))
        ring.append(vc)
        if len(ring) > n:
            ring.pop(0)
        last_ms = max(last_ms, int(r.ts.value // 1_000_000))
    state.update((",".join(str(x) for x in ring), last_ms))
    state.setTimeoutTimestamp(last_ms + _ANOM_TTL_MS)
    if out:
        yield pd.DataFrame(
            out, columns=["event_id", "ts", "event_type", "value", "zscore"]
        )


def anomaly_events_stream(
    events: DataFrame, ts_col: str = "ts", watermark: str = "1 hour"
) -> DataFrame:
    """Streaming z-score anomaly flags (update mode). Input needs
    `event_id`, `event_type`, `value`, and an event-time column."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from pyspark.sql import functions as F

    src = events.select(
        "event_id",
        F.col(ts_col).alias("ts"),
        "event_type",
        "value",
    ).withWatermark("ts", watermark)
    return src.groupBy("event_type").applyInPandasWithState(
        _score_events,
        outputStructType=ANOMALY_OUTPUT,
        stateStructType=ANOMALY_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
