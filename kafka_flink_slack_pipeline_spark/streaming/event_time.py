"""Event-time processing (ST5 — absent in the reference, added per the
north star): watermarks, tumbling/sliding windows, late-data policy.

The reference's only notion of time is a 10-minute processing-time poll
(`Producer/kafkaProducer.js:232`). This module gives the engine true
event-time semantics on any stream with a timestamp column: windowed
aggregation with bounded state, late rows dropped once the watermark
passes (documented policy: drop, no side-output — extend with a DLQ tap
if late-data auditing is needed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def clicks_followed_by_errors(
    events: DataFrame,
    within_minutes: int = 5,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Stream-stream self-join: error events within N minutes after a
    click by the same user. Both sides carry watermarks and the join
    condition is time-bounded, so Structured Streaming can expire join
    state — unbounded-state stream joins don't run at scale.

    Batch frames run the identical expression (the batch oracle analogue
    is operators/temporal.py:events_range_join_errors)."""
    c = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("cu"),
        F.col("ts").alias("click_ts"),
    )
    x = events.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.col("user_id").alias("eu"),
        F.col("ts").alias("err_ts"),
    )
    if events.isStreaming:
        c = c.withWatermark("click_ts", watermark)
        x = x.withWatermark("err_ts", watermark)
    return c.join(
        x,
        F.expr(
            f"cu = eu AND err_ts > click_ts "
            f"AND err_ts <= click_ts + interval {within_minutes} minutes"
        ),
    ).select(
        "click_id", "error_id", F.col("cu").alias("user_id"),
        "click_ts", "err_ts",
    )


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Tumbling (or sliding, when `slide` is given) windowed counts with a
    watermark. On a stream: append-mode output, finalized windows only;
    on a batch frame: same expression, all windows."""
    win = (
        F.window(F.col(ts_col), window, slide)
        if slide
        else F.window(F.col(ts_col), window)
    )
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(win.alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            "n_events",
        )
    )


def trending_terms_stream(
    docs: DataFrame,
    ts_col: str = "ingest_ts",
    window: str = "1 hour",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Windowed term counts over a document stream — the counting half of
    a trending-terms feed (the streaming face of the batch heavy-hitter
    ops in operators/training.py).

    Built-ins first, deliberately: explode + watermark + windowed count
    is all whole-stage-codegen'd JVM work with bounded state (one counter
    per (window, term) inside the horizon), where a stateful-Python top-k
    would cap throughput at the Arrow boundary. On a stream the append
    output emits FINALIZED windows only; rank those per micro-batch with
    `top_k_per_window` inside foreachBatch (ranking can't run above a
    streaming aggregate in append mode — window functions need the
    finalized frame). On a batch frame: the identical expression, all
    windows (the batch/stream parity rule of windowed_event_counts).

    100 TB/day: state is term-cardinality-bounded per window (vocab-
    scale, not corpus-scale); the shuffle key (window, term) is uniform.
    A production feed caps the per-window vocabulary (e.g. hash-mod
    sampling or the CMS sketch) before the shuffle; the synthetic corpus
    vocabulary is ~100 terms so the cap is omitted here.
    """
    df = docs
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    terms = df.select(
        F.col(ts_col).alias("_ts"),
        F.explode(F.split(F.trim(F.col("text")), "\\s+")).alias("term"),
    ).filter(F.col("term") != "")
    return (
        terms.groupBy(F.window("_ts", window).alias("w"), "term")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "term",
            "n",
        )
    )


def top_k_per_window(counts: DataFrame, k: int = 5) -> DataFrame:
    """Rank finalized (window, term, n) counts to the top-k per window.

    Batch-only by design (row_number over a streaming aggregate is not
    executable in append mode) — call inside foreachBatch, where each
    micro-batch is a plain batch frame of newly-finalized windows. The
    window spec partitions by window_start, so no global sort."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("window_start").orderBy(
        F.desc("n"), F.col("term")
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("window_start", "rank")
    )


def length_bucket_counts_stream(
    docs: DataFrame,
    ts_col: str = "ingest_ts",
    window: str = "1 hour",
    watermark: str = "30 minutes",
    n_buckets: int = 16,
    bucket_width: int = 16,
) -> DataFrame:
    """Windowed token-length-bucket counts over a document stream — the
    counting half of streaming drift monitoring (the streaming face of
    operators/curation.py corpus_drift_report, same bucketing rule).

    Built-in watermark + windowed aggregation with (windows x 16)-bounded
    state; distances against a reference distribution are computed per
    finalized window by `tv_drift_against_reference` inside foreachBatch
    (same split as trending terms: aggregation streams, ranking/distance
    math runs on the finalized batch frame)."""
    df = docs
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    n = F.size(F.split(F.trim(F.col("text")), "\\s+"))
    bucket = F.least(
        F.lit(n_buckets - 1), F.floor(n / bucket_width)
    ).cast("int")
    return (
        df.select(F.col(ts_col).alias("_ts"), bucket.alias("bucket"))
        .groupBy(F.window("_ts", window).alias("w"), "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "bucket",
            "n",
        )
    )


def tv_drift_against_reference(
    counts: DataFrame, reference: dict[int, float]
) -> DataFrame:
    """Per-window total-variation distance of the observed bucket
    distribution against a fixed reference distribution (the promoted
    snapshot's profile, passed as {bucket: proportion}).

    Batch-only by design — call inside foreachBatch on finalized
    windows. TV sums |p - q| over the UNION of observed and reference
    buckets (an observed-only bucket contributes its full mass, a
    reference-only bucket likewise), x 0.5.

    The reference proportions are NORMALIZED here (divided by their
    sum): the reference-only mass enters as (1 - seen_q), which is only
    correct when the reference sums to exactly 1 — an unnormalized or
    partial dict would silently yield a wrong (possibly negative) TV
    distance. An empty/non-positive reference raises."""
    total_ref = float(sum(reference.values()))
    if not total_ref > 0.0:
        raise ValueError(
            "reference distribution must have positive total mass, got "
            f"{total_ref!r}"
        )
    ref_rows = [
        (int(b), float(p) / total_ref) for b, p in sorted(reference.items())
    ]
    spark = counts.sparkSession
    ref = spark.createDataFrame(ref_rows, "bucket int, q double")
    totals = counts.groupBy("window_start").agg(F.sum("n").alias("tot"))
    # reference-only buckets have no window row to join onto; their
    # missing mass enters as (1 - seen_q) below — equivalent to the
    # union-of-buckets sum without fanning the reference out per window
    observed = (
        counts.join(totals, "window_start")
        .select(
            "window_start", "bucket", (F.col("n") / F.col("tot")).alias("p")
        )
        .join(F.broadcast(ref), "bucket", "left")
        .withColumn("q", F.coalesce(F.col("q"), F.lit(0.0)))
    )
    seen_ref_mass = observed.groupBy("window_start").agg(
        F.sum("q").alias("seen_q")
    )
    return (
        observed.groupBy("window_start")
        .agg(F.sum(F.abs(F.col("p") - F.col("q"))).alias("tv_seen"))
        .join(seen_ref_mass, "window_start")
        .select(
            "window_start",
            F.round(
                (F.col("tv_seen") + (1.0 - F.col("seen_q"))) * 0.5, 6
            ).alias("tv_distance"),
        )
        .orderBy("window_start")
    )


def quality_gate_stream(
    docs: DataFrame,
    ts_col: str = "ingest_ts",
    window: str = "1 hour",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming corpus-admission monitor: the published Gopher + C4
    rule batteries (operators/textops.py with_gopher_flags /
    with_c4_flags — both pure narrow projections, so they run on a
    stream unchanged) applied per document, aggregated into per-window
    admission counts. A doc is admitted when BOTH batteries keep it;
    the per-family reject counts tell an operator which battery is
    biting when the admit rate moves.

    The row-level gate itself is just
    `with_c4_flags(with_gopher_flags(stream)).filter("gopher_keep *
    c4_keep = 1")` — this aggregate is the monitoring face (watermark +
    windowed agg, state bounded by open windows x 1 row)."""
    from ..operators.textops import with_c4_flags, with_gopher_flags

    df = docs
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    flagged = with_c4_flags(with_gopher_flags(df))
    admit = F.col("gopher_keep") * F.col("c4_keep")
    return (
        flagged.select(
            F.col(ts_col).alias("_ts"),
            F.col("gopher_keep"),
            F.col("c4_keep"),
            admit.alias("admit"),
        )
        .groupBy(F.window("_ts", window).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("admit").alias("n_admitted"),
            F.sum(1 - F.col("gopher_keep")).alias("n_gopher_reject"),
            F.sum(1 - F.col("c4_keep")).alias("n_c4_reject"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_docs",
            "n_admitted",
            "n_gopher_reject",
            "n_c4_reject",
            F.round(F.col("n_admitted") / F.col("n_docs"), 4).alias(
                "admit_rate"
            ),
        )
    )


def ohlc_rollup_stream(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming face of operators/windows.py events_ohlc_rollup — the
    literal continuous aggregate. The batch op picks open/close with a
    row_number window; ranking can't run above a streaming aggregate,
    so here open/close are min_by/max_by over the (event-time, event_id)
    struct — the same total order, expressed as an aggregate, which
    Structured Streaming maintains incrementally with bounded per-window
    state. On a batch frame the identical expression reproduces the
    batch operator's numbers (parity test).

    total_value accumulates in DECIMAL(18,2) exactly like the batch op
    (money_sum), so stream and batch agree to the cent."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    pick = F.struct(F.col(ts_col), F.col("event_id"))
    return (
        df.groupBy(F.window(ts_col, window).alias("w"), key_col)
        .agg(
            F.min_by("value", pick).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", pick).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start_epoch"),
            key_col,
            "open",
            "high",
            "low",
            "close",
            "n_events",
            "total_value",
        )
    )
