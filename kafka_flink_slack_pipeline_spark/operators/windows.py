"""Windowed / ordered / event-time operators over the `events` stream table.

Reference parity (SURVEY.md §2.6, §2.7):
  W1/W2  last-N keyed history window, oldest-first, concatenated
         (`Slack Event Server/slackEventServer.js:187-221`)           → user_history_window
  W4     last-N fetch / top-k                 (`Producer/test-producer.js:35-39`)
                                                                      → last_events_per_user
  ST5    event-time tumbling/sliding/session windows (absent in the
         reference — north-star extension; batch formulations here,
         streaming formulations in streaming/event_time.py)              → events_* queries

Scale notes (100 TB):
  - Tumbling/sliding windows are pure narrow ops (floor arithmetic on the
    timestamp) followed by a partial-aggregating groupBy — no skew risk
    beyond hot windows, which AQE splits.
  - Keyed history windows shuffle once on the key; rank-prune (row_number
    <= N) happens inside the shuffle stage before any concat, so state per
    key is bounded at N rows.
  - Window starts are emitted as epoch-second BIGINTs (not formatted
    timestamps) — timezone-proof across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.numeric import money_sum
from ..plans.registry import QuerySpec
from ..tables import spread, table


# --------------------------------------------------------------------------
# Tumbling window: per-hour, per-type counts + value stats.
def events_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.window("ts", "1 hour").alias("w"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            money_sum(F.col("value")).alias("total_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start_epoch"),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("window_start_epoch", "event_type")
    )


EVENTS_HOURLY_ORACLE = """
SELECT (epoch_ms(date_trunc('hour', ts)) / 1000)::BIGINT AS window_start_epoch,
       event_type,
       count(*)             AS n_events,
       round(sum(value::DECIMAL(18,2)), 2)::DOUBLE AS total_value
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""


# --------------------------------------------------------------------------
# Sliding window: 1 hour window, 30 min slide (each event lands in 2 windows).
def events_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start_epoch"),
            "event_type",
            "n_events",
        )
        .orderBy("window_start_epoch", "event_type")
    )


# A 1h/30m sliding window containing t starts at floor(t/1800)*1800 and at
# floor(t/1800)*1800 - 1800 (always exactly two).
EVENTS_SLIDING_ORACLE = """
SELECT window_start_epoch, event_type, count(*) AS n_events
FROM (
  SELECT (floor(epoch_ms(ts) / 1800000) * 1800 - off)::BIGINT AS window_start_epoch,
         event_type
  FROM events
  CROSS JOIN (SELECT unnest([0, 1800]) AS off)
)
GROUP BY 1, 2
ORDER BY 1, 2
"""


# --------------------------------------------------------------------------
# Session windows (batch formulation): 30-minute inactivity gap per user.
# Streaming formulation: F.session_window in streaming/event_time.py.
def events_sessions_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r14 tried a pinned-width by-user spread here; the driver bench
    # measured x0.56 and the r15 in-session alternating A/B confirmed it
    # (6 passes: no-spread min 0.151 s vs spread 0.179 s, means 0.20 vs
    # 0.26): the lag window + integer sum over ~150 user keys is too
    # cheap to repay a pinned 16-way exchange of 100k rows — REVERTED.
    # user_history_window keeps its spread (its per-user collect+sort+
    # concat is heavier; same A/B: spread 0.245 vs no-spread 0.340).
    e = table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # Gap compare in integer MICROSECONDS on both engines — float/seconds
    # truncation at the 1800s boundary would silently diverge.
    sessions = e.withColumn("prev_ts", F.lag("ts").over(w)).withColumn(
        "new_session",
        F.when(
            F.col("prev_ts").isNull()
            | (F.unix_micros("ts") - F.unix_micros("prev_ts") > 1_800_000_000),
            1,
        ).otherwise(0),
    )
    return (
        sessions.groupBy("user_id")
        .agg(
            F.sum("new_session").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id")
    )


EVENTS_SESSIONS_ORACLE = """
SELECT user_id,
       sum(new_session)::BIGINT AS n_sessions,
       count(*)                 AS n_events
FROM (
  SELECT user_id,
         CASE WHEN prev_ts IS NULL
                OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM (
    SELECT user_id, ts,
           lag(ts) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_ts
    FROM events
  )
)
GROUP BY user_id
ORDER BY user_id
"""


# --------------------------------------------------------------------------
# JSON extraction from the props column (semi-structured handling).
def events_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return (
        e.withColumn("k", F.get_json_object("props", "$.k").cast("int"))
        .groupBy("event_type")
        .agg(
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.max("k").alias("max_k"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type")
    )


EVENTS_JSON_ORACLE = """
SELECT event_type,
       round(avg(k), 4) AS avg_k,
       max(k)           AS max_k,
       count(*)         AS n_events
FROM (
  SELECT event_type, json_extract(props, '$.k')::INTEGER AS k
  FROM events
)
GROUP BY event_type
ORDER BY event_type
"""


# --------------------------------------------------------------------------
# W4 analogue: last-5 events per user (keyed top-k by recency).
def last_events_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r14: same pinned by-user exchange as events_sessions_per_user.
    e = spread(
        table(spark, sf_dir, "events").select(
            "user_id", "event_id", "event_type", "ts"
        ),
        "user_id",
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        e.withColumn("recency_rank", F.row_number().over(w))
        .filter(F.col("recency_rank") <= 5)
        .select("user_id", "event_id", "event_type", "recency_rank")
        .orderBy("user_id", "recency_rank")
    )


LAST_EVENTS_ORACLE = """
SELECT user_id, event_id, event_type, recency_rank
FROM (
  SELECT user_id, event_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC)
           AS recency_rank
  FROM events
)
WHERE recency_rank <= 5
ORDER BY user_id, recency_rank
"""


# --------------------------------------------------------------------------
# W1/W2 analogue: last-100 history per key, oldest-first, formatted and
# concatenated into one context string (P19's `${user}: ${text}` line format
# becomes `${event_type}:${event_id}`; ints only — cross-engine stable).
def user_history_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r14: same pinned by-user exchange as events_sessions_per_user.
    e = spread(
        table(spark, sf_dir, "events").select(
            "user_id", "ts", "event_id", "event_type"
        ),
        "user_id",
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    ranked = e.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 100)
    # Oldest-first concat: collect (ts, event_id, line) structs, sort, join —
    # explicit order inside the aggregation, never relying on row order.
    line = F.concat_ws(":", "event_type", F.col("event_id").cast("string"))
    return (
        ranked.withColumn("line", line)
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("ts", "event_id", "line"))),
                    lambda s: s["line"],
                ),
                "\n",
            ).alias("history"),
            F.count(F.lit(1)).alias("n_messages"),
        )
        .orderBy("user_id")
    )


USER_HISTORY_ORACLE = """
SELECT user_id,
       string_agg(line, chr(10) ORDER BY epoch_us(ts), event_id) AS history,
       count(*)                                        AS n_messages
FROM (
  SELECT user_id, ts, event_id,
         event_type || ':' || event_id::VARCHAR AS line,
         row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC)
           AS rn
  FROM events
)
WHERE rn <= 100
GROUP BY user_id
ORDER BY user_id
"""


# --------------------------------------------------------------------------
# Sequential funnel: first view → first click AFTER it → first purchase
# after that, per user. The ordering constraint makes this a sequential
# pattern match, not a plain conditional aggregation: each stage's
# anchor timestamp depends on the previous stage's result.
# 100 TB: three aggregations + two joins, ALL keyed on user_id — one
# logical partitioning reused across every stage; no window-sort over
# full event history per user.
def funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view -> click-after-view -> purchase-after-click funnel per user.

    r4 rewrite: ONE events pass. The three stage timestamps are chained
    min-over-user window projections (each stage's predicate reads the
    previous stage's projected column), all over the SAME user_id
    partitioning — one exchange, three WindowExec layers, then a
    partition-local groupBy collapses each user to one row. The r1 form
    built views/clicks/purchases as separate agg+join branches; under
    Spark 4.1 AQE (no cross-branch reuse) that planned SIX events scans."""
    e = table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    w = Window.partitionBy("user_id")
    staged = (
        e.withColumn(
            "view_ts",
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w),
        )
        .withColumn(
            "click_ts",
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("ts") > F.col("view_ts")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "purchase_ts",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") > F.col("click_ts")),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    return (
        staged.filter(F.col("view_ts").isNotNull())
        .groupBy("user_id")
        .agg(
            F.min("view_ts").alias("view_ts"),
            F.min("click_ts").alias("click_ts"),
            F.min("purchase_ts").alias("purchase_ts"),
        )
        .select(
            "user_id",
            F.unix_timestamp("view_ts").alias("view_epoch"),
            F.unix_timestamp("click_ts").alias("click_epoch"),
            F.unix_timestamp("purchase_ts").alias("purchase_epoch"),
            F.when(F.col("purchase_ts").isNotNull(), "purchase")
            .when(F.col("click_ts").isNotNull(), "click")
            .otherwise("view")
            .alias("furthest_stage"),
        )
        .orderBy("user_id")
    )


FUNNEL_STAGES_ORACLE = """
WITH views AS (
  SELECT user_id, min(ts) AS view_ts FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
clicks AS (
  SELECT e.user_id, v.view_ts, min(e.ts) AS click_ts
  FROM events e JOIN views v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.view_ts
  GROUP BY e.user_id, v.view_ts
),
purchases AS (
  SELECT e.user_id, min(e.ts) AS purchase_ts
  FROM events e JOIN clicks c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.click_ts
  GROUP BY e.user_id
)
SELECT v.user_id,
       (epoch_ms(v.view_ts) // 1000)     AS view_epoch,
       (epoch_ms(c.click_ts) // 1000)    AS click_epoch,
       (epoch_ms(p.purchase_ts) // 1000) AS purchase_epoch,
       CASE WHEN p.purchase_ts IS NOT NULL THEN 'purchase'
            WHEN c.click_ts IS NOT NULL THEN 'click'
            ELSE 'view' END AS furthest_stage
FROM views v
LEFT JOIN clicks c    ON v.user_id = c.user_id
LEFT JOIN purchases p ON v.user_id = p.user_id
ORDER BY v.user_id
"""


# --------------------------------------------------------------------------
# Weekly retention cohorts: users cohorted by first-signup week; for each
# later week, how many of the cohort were active at all. Two aggregations
# (cohort assignment, distinct user-week activity) joined on user_id, then
# a conditional count per (cohort_week, week_offset) — the standard cohort
# triangle. Weeks are integer floor(epoch/604800): timezone-proof and
# identical across engines.
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    # integer `div`, not `/`: long / long is DOUBLE division in Spark, and
    # a timestamp within an ulp of a week boundary could floor differently
    # than the oracle's exact integer division.
    week = F.expr("unix_timestamp(ts) div 604800")
    cohorts = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(week).alias("cohort_week"))
    )
    activity = e.select("user_id", week.alias("act_week")).distinct()
    return (
        activity.join(cohorts, "user_id")
        .filter(F.col("act_week") >= F.col("cohort_week"))
        .groupBy(
            "cohort_week",
            (F.col("act_week") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
        .orderBy("cohort_week", "week_offset")
    )


RETENTION_COHORTS_ORACLE = """
WITH cohorts AS (
  SELECT user_id, min(epoch_ms(ts) // 604800000) AS cohort_week
  FROM events WHERE event_type = 'signup' GROUP BY user_id
),
activity AS (
  SELECT DISTINCT user_id, epoch_ms(ts) // 604800000 AS act_week FROM events
)
SELECT cohort_week,
       (act_week - cohort_week) AS week_offset,
       count(DISTINCT a.user_id)::BIGINT AS n_active
FROM activity a JOIN cohorts c USING (user_id)
WHERE act_week >= cohort_week
GROUP BY cohort_week, week_offset
ORDER BY cohort_week, week_offset
"""


# --------------------------------------------------------------------------
# Time-series OHLC rollup — the hypertable/continuous-aggregate shape
# (TimescaleDB's signature op, called out in the build brief): per
# (hour, event_type), the first/last/extreme values of the metric column
# plus exact totals. Open/close are defined by (event-time, event_id)
# order — the event_id tie-break makes the pick total; the oracle orders
# by MICROSECOND-truncated ts to mirror Spark's nanos->micros ingestion
# exactly (a same-microsecond pair would otherwise tie-break differently
# against DuckDB's nanosecond view).
#
# Scale shape: ONE window pass partitioned by the rollup key computes
# row numbers + per-partition counts, and the groupBy that follows uses
# the same keys, so the sort and the aggregate share one hash
# partitioning (no second exchange). This is the plan a continuous
# aggregate materializes incrementally; here it runs as one batch pass.


def events_ohlc_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    base = e.select(
        F.unix_timestamp(
            F.window("ts", "1 hour").getField("start")
        ).alias("win"),
        "event_type",
        "value",
        "ts",
        "event_id",
    )
    w = Window.partitionBy("win", "event_type")
    ranked = base.select(
        "win",
        "event_type",
        "value",
        F.row_number()
        .over(w.orderBy("ts", "event_id"))
        .alias("rn"),
        F.count(F.lit(1)).over(w).alias("cnt"),
    )
    return (
        ranked.groupBy("win", "event_type")
        .agg(
            F.max(F.when(F.col("rn") == 1, F.col("value"))).alias("open"),
            F.max(
                F.when(F.col("rn") == F.col("cnt"), F.col("value"))
            ).alias("close"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.count(F.lit(1)).alias("n_events"),
            money_sum(F.col("value")).alias("total_value"),
        )
        .select(
            F.col("win").alias("window_start_epoch"),
            "event_type",
            "open",
            "high",
            "low",
            "close",
            "n_events",
            "total_value",
        )
        .orderBy("window_start_epoch", "event_type")
    )


# --------------------------------------------------------------------------
# Gap-filled hourly rollup with last-observation-carried-forward — the
# hypertable `time_bucket_gapfill(...) + locf(last(value))` shape
# (TimescaleDB's flagship continuous-query verb; every monitoring
# dashboard draws from it): per event_type, the FULL hourly bucket grid
# between the type's first and last active bucket, empty buckets emitted
# with n_events = 0 and the value carried forward from the latest
# non-empty bucket.
#
# Determinism: the carried value is the bucket's LAST event by
# (ts, event_id) — the OHLC `close` pick, same rn == cnt trick, so both
# engines choose the same row even under ts ties. LOCF itself is the
# engine-agnostic gaps-and-islands form: a running count of non-empty
# buckets partitions each type's grid into islands led by exactly one
# non-empty bucket, and max(value) over (type, island) propagates it —
# no IGNORE NULLS window dependence (DuckDB 1.0 lacks it on last_value).
#
# 100 TB shape: one events scan into the bucketed rollup; the grid is
# sequence(min, max, 3600) per type — bounded by the TIME RANGE, not by
# event volume (720 buckets/month/type regardless of SF); the LOCF
# windows run over that bounded grid. Bounded-key frames only.


def events_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    base = e.select(
        F.unix_timestamp(
            F.window("ts", "1 hour").getField("start")
        ).alias("win"),
        "event_type",
        "value",
        "ts",
        "event_id",
    )
    w = Window.partitionBy("win", "event_type")
    ranked = base.select(
        "win",
        "event_type",
        "value",
        F.row_number().over(w.orderBy("ts", "event_id")).alias("rn"),
        F.count(F.lit(1)).over(w).alias("cnt"),
    )
    agg = ranked.groupBy("event_type", "win").agg(
        F.max(
            F.when(F.col("rn") == F.col("cnt"), F.col("value"))
        ).alias("last_value"),
        F.count(F.lit(1)).alias("n_events"),
    )
    grid = (
        agg.groupBy("event_type")
        .agg(F.min("win").alias("lo"), F.max("win").alias("hi"))
        .select(
            "event_type",
            F.explode(
                F.sequence(F.col("lo"), F.col("hi"), F.lit(3600))
            ).alias("win"),
        )
    )
    joined = grid.join(agg, ["event_type", "win"], "left")
    islanded = joined.select(
        "event_type",
        "win",
        "n_events",
        "last_value",
        F.count(F.when(F.col("n_events").isNotNull(), F.lit(1)))
        .over(Window.partitionBy("event_type").orderBy("win"))
        .alias("grp"),
    )
    return (
        islanded.select(
            "event_type",
            F.col("win").alias("bucket_epoch"),
            F.coalesce("n_events", F.lit(0).cast("long")).alias("n_events"),
            F.round(
                F.max("last_value").over(
                    Window.partitionBy("event_type", "grp")
                ),
                2,
            ).alias("value_locf"),
            F.col("n_events").isNull().cast("int").alias("is_gap"),
        )
        .orderBy("event_type", "bucket_epoch")
    )


EVENTS_GAPFILL_ORACLE = """
WITH ranked AS (
  SELECT (epoch_ms(date_trunc('hour', ts)) / 1000)::BIGINT AS win,
         event_type, value,
         row_number() OVER (
           PARTITION BY date_trunc('hour', ts), event_type
           ORDER BY date_trunc('microsecond', ts), event_id) AS rn,
         count(*) OVER (
           PARTITION BY date_trunc('hour', ts), event_type) AS cnt
  FROM events
),
agg AS (
  SELECT event_type, win,
         max(CASE WHEN rn = cnt THEN value END) AS last_value,
         count(*)::BIGINT AS n_events
  FROM ranked GROUP BY event_type, win
),
grid AS (
  SELECT event_type, unnest(generate_series(lo, hi, 3600)) AS win
  FROM (SELECT event_type, min(win) AS lo, max(win) AS hi
        FROM agg GROUP BY event_type)
),
islanded AS (
  SELECT g.event_type, g.win, a.n_events, a.last_value,
         count(CASE WHEN a.n_events IS NOT NULL THEN 1 END) OVER (
           PARTITION BY g.event_type ORDER BY g.win) AS grp
  FROM grid g LEFT JOIN agg a
    ON a.event_type = g.event_type AND a.win = g.win
)
SELECT event_type, win AS bucket_epoch,
       coalesce(n_events, 0)::BIGINT AS n_events,
       round(max(last_value) OVER (PARTITION BY event_type, grp),
             2)::DOUBLE AS value_locf,
       CASE WHEN n_events IS NULL THEN 1 ELSE 0 END AS is_gap
FROM islanded
ORDER BY event_type, bucket_epoch
"""


EVENTS_OHLC_ORACLE = """
WITH ranked AS (
  SELECT (epoch_ms(date_trunc('hour', ts)) / 1000)::BIGINT AS win,
         event_type, value,
         row_number() OVER (
           PARTITION BY date_trunc('hour', ts), event_type
           ORDER BY date_trunc('microsecond', ts), event_id) AS rn,
         count(*) OVER (
           PARTITION BY date_trunc('hour', ts), event_type) AS cnt
  FROM events
)
SELECT win AS window_start_epoch, event_type,
       max(CASE WHEN rn = 1 THEN value END)   AS open,
       max(value)                             AS high,
       min(value)                             AS low,
       max(CASE WHEN rn = cnt THEN value END) AS close,
       count(*)::BIGINT                       AS n_events,
       round(sum(value::DECIMAL(18,2)), 2)::DOUBLE AS total_value
FROM ranked
GROUP BY win, event_type
ORDER BY win, event_type
"""


# --------------------------------------------------------------------------
# Winsorized robust statistics — the numeric-column cleaning primitive
# (clamp to [p05, p95] before aggregating) every metrics pipeline ships
# next to its raw means. Percentile determinism: both engines compute
# interpolated quantiles with the same rank = p*(n-1) formula on the
# same doubles, so the UNROUNDED bounds are identical and the clamp
# comparisons can never diverge at a boundary value (the reason the
# bounds are NOT pre-rounded before clamping). Means accumulate the
# clamped values in DECIMAL (order-free), divided once as doubles.
#
# Scale shape: one bounded per-type percentile aggregate broadcast back
# onto the events scan (two scans, the default budget), then one
# aggregation — no windows, no sort.


def events_value_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").select("event_type", "value")
    pct = e.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.05)).alias("lo"),
        F.percentile("value", F.lit(0.95)).alias("hi"),
    )
    clamped = F.greatest(F.col("lo"), F.least(F.col("hi"), F.col("value")))
    return (
        e.join(F.broadcast(pct), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("lo"), 4).alias("p05"),
            F.round(F.min("hi"), 4).alias("p95"),
            F.sum((F.col("value") < F.col("lo")).cast("long")).alias(
                "n_clip_lo"
            ),
            F.sum((F.col("value") > F.col("hi")).cast("long")).alias(
                "n_clip_hi"
            ),
            F.round(
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1)),
                4,
            ).alias("mean_raw"),
            F.round(
                F.sum(clamped.cast("decimal(25,10)")).cast("double")
                / F.count(F.lit(1)),
                4,
            ).alias("mean_winsorized"),
        )
        .orderBy("event_type")
    )


EVENTS_WINSOR_ORACLE = """
WITH pct AS (
  SELECT event_type,
         quantile_cont(value, 0.05) AS lo,
         quantile_cont(value, 0.95) AS hi
  FROM events GROUP BY event_type
)
SELECT e.event_type,
       count(*)::BIGINT AS n,
       round(min(lo), 4) AS p05,
       round(min(hi), 4) AS p95,
       sum(CASE WHEN value < lo THEN 1 ELSE 0 END)::BIGINT AS n_clip_lo,
       sum(CASE WHEN value > hi THEN 1 ELSE 0 END)::BIGINT AS n_clip_hi,
       round(sum(value::DECIMAL(18,2))::DOUBLE / count(*), 4) AS mean_raw,
       round(sum(CAST(greatest(lo, least(hi, value)) AS DECIMAL(25,10))
             )::DOUBLE / count(*), 4) AS mean_winsorized
FROM events e JOIN pct USING (event_type)
GROUP BY e.event_type
ORDER BY e.event_type
"""


# --------------------------------------------------------------------------
# LTTB downsampling (Steinarsson 2013, "Downsampling Time Series for
# Visual Representation" — the Largest-Triangle-Three-Buckets algorithm
# Grafana/Timescale ship for chart rendering): reduce each series to
# ~NB+2 points keeping the visually dominant ones. The classic algorithm
# is SEQUENTIAL (each bucket's pick anchors on the PREVIOUS pick); this
# is the standard parallel variant that anchors every bucket on its
# NEIGHBOR BUCKETS' MEAN POINTS instead — embarrassingly parallel, the
# form a distributed engine can actually run, at slightly different (not
# worse-looking) picks. First/last points are always kept.
#
# Determinism: bucket assignment is floor((rn-2)*NB/(n-2)) on exact
# small-int doubles; bucket means accumulate in DECIMAL (order-free
# sums) before one double division; the triangle area is one fixed
# IEEE expression of identical inputs on both engines, rounded to 6
# BEFORE ranking so a last-ulp disagreement cannot flip an argmax
# (ties then break on (ts, event_id)). Timestamps ride as unix micros
# (the nanos->micros ingestion lesson, events_ohlc_rollup).
#
# Scale shape: one window pass per series for (rn, n), a bounded
# (series x NB) mean aggregate re-entered via broadcast joins, and a
# per-(series, bucket) argmax window — equi-key shuffles only; the
# bounded means frame is localCheckpoint-ed because the left/right
# anchor shifts consume it twice (AQE no-reuse).
_LTTB_NB = 16


def events_downsample_lttb(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r14: pinned by-type exchange — all four window branches (interior
    # x2 via means/picks, endpoints, ends_out) recompute this head, so
    # the spread replaces each branch's AQE-coalesced ENSURE exchange.
    e = spread(
        table(spark, sf_dir, "events").select(
            "event_type", "ts", "value", "event_id"
        ),
        "event_type",
    ).select(
        "event_type",
        F.unix_micros("ts").alias("x"),
        F.col("value").alias("y"),
        "event_id",
    )
    w = Window.partitionBy("event_type")
    pts = e.select(
        "event_type",
        "x",
        "y",
        "event_id",
        F.row_number().over(w.orderBy("x", "event_id")).alias("rn"),
        F.count(F.lit(1)).over(w).alias("n"),
    )
    interior = pts.filter(
        (F.col("rn") >= 2) & (F.col("rn") <= F.col("n") - 1)
    ).withColumn(
        "b",
        F.floor(
            ((F.col("rn") - 2) * _LTTB_NB) / (F.col("n") - 2)
        ).cast("int"),
    )
    means = (
        interior.groupBy("event_type", "b")
        .agg(
            (
                F.sum(F.col("x").cast("decimal(25,0)")).cast("double")
                / F.count(F.lit(1))
            ).alias("mx"),
            (
                F.sum(F.col("y").cast("decimal(25,10)")).cast("double")
                / F.count(F.lit(1))
            ).alias("my"),
        )
        .localCheckpoint(eager=False)  # bounded: series x NB rows
    )
    endpoints = pts.filter(
        (F.col("rn") == 1) | (F.col("rn") == F.col("n"))
    ).groupBy("event_type").agg(
        F.max(F.when(F.col("rn") == 1, F.col("x"))).alias("x1"),
        F.max(F.when(F.col("rn") == 1, F.col("y"))).alias("y1"),
        F.max(F.when(F.col("rn") == F.col("n"), F.col("x"))).alias("xn"),
        F.max(F.when(F.col("rn") == F.col("n"), F.col("y"))).alias("yn"),
    )
    left = means.select(
        "event_type", (F.col("b") + 1).alias("b"),
        F.col("mx").alias("lmx"), F.col("my").alias("lmy"),
    )
    right = means.select(
        "event_type", (F.col("b") - 1).alias("b"),
        F.col("mx").alias("rmx"), F.col("my").alias("rmy"),
    )
    # x-coordinates enter the area in SECONDS: at micro scale the areas
    # sit at ~1e13 where one ulp is ~0.008 and DuckDB's FMA-contracted
    # mul-sub disagrees with the JVM's by that ulp (measured); at second
    # scale the round-4 guard band is ~1e7 ulps wide, so both engines
    # round to the identical double and a sub-1e-4 near-tie breaks on
    # (x, event_id) instead of on FMA noise.
    ax = F.coalesce("lmx", F.col("x1").cast("double")) / 1e6
    ay = F.coalesce("lmy", "y1")
    cx = F.coalesce("rmx", F.col("xn").cast("double")) / 1e6
    cy = F.coalesce("rmy", "yn")
    xs = F.col("x").cast("double") / 1e6
    area = F.round(
        F.abs((cx - ax) * (F.col("y") - ay) - (xs - ax) * (cy - ay)),
        4,
    )
    wb = Window.partitionBy("event_type", "b").orderBy(
        F.desc("area"), F.asc("x"), F.asc("event_id")
    )
    picks = (
        interior.join(F.broadcast(endpoints), "event_type")
        .join(F.broadcast(left), ["event_type", "b"], "left")
        .join(F.broadcast(right), ["event_type", "b"], "left")
        .withColumn("area", area)
        .withColumn("pick", F.row_number().over(wb))
        .filter(F.col("pick") == 1)
        .select(
            "event_type",
            (F.col("b") + 1).alias("sel_pos"),
            "x",
            "y",
            "area",
        )
    )
    ends_out = pts.filter(
        (F.col("rn") == 1) | (F.col("rn") == F.col("n"))
    ).select(
        "event_type",
        F.when(F.col("rn") == 1, F.lit(0))
        .otherwise(F.lit(_LTTB_NB + 1))
        .alias("sel_pos"),
        "x",
        "y",
        F.lit(None).cast("double").alias("area"),
    )
    return (
        picks.unionByName(ends_out)
        .select(
            "event_type", "sel_pos", F.col("x").alias("ts_us"), "y", "area"
        )
        .orderBy("event_type", "sel_pos")
    )


EVENTS_LTTB_ORACLE = f"""
WITH pts AS (
  SELECT event_type,
         epoch_us(date_trunc('microsecond', ts))::BIGINT AS x,
         value AS y, event_id,
         row_number() OVER (
           PARTITION BY event_type
           ORDER BY date_trunc('microsecond', ts), event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events
),
interior AS (
  SELECT *, floor(((rn - 2) * {_LTTB_NB}) / (n - 2))::INT AS b
  FROM pts WHERE rn >= 2 AND rn <= n - 1
),
means AS (
  SELECT event_type, b,
         sum(x::DECIMAL(25,0))::DOUBLE / count(*) AS mx,
         sum(y::DECIMAL(25,10))::DOUBLE / count(*) AS my
  FROM interior GROUP BY event_type, b
),
endpoints AS (
  SELECT event_type,
         max(CASE WHEN rn = 1 THEN x END) AS x1,
         max(CASE WHEN rn = 1 THEN y END) AS y1,
         max(CASE WHEN rn = n THEN x END) AS xn,
         max(CASE WHEN rn = n THEN y END) AS yn
  FROM pts WHERE rn = 1 OR rn = n GROUP BY event_type
),
scored AS (
  SELECT i.event_type, i.b, i.x, i.y, i.event_id,
         round(abs(
           (coalesce(r.mx, ep.xn::DOUBLE) / 1000000.0
              - coalesce(l.mx, ep.x1::DOUBLE) / 1000000.0)
             * (i.y - coalesce(l.my, ep.y1))
           - (i.x::DOUBLE / 1000000.0
              - coalesce(l.mx, ep.x1::DOUBLE) / 1000000.0)
             * (coalesce(r.my, ep.yn) - coalesce(l.my, ep.y1))
         ), 4) AS area
  FROM interior i
  JOIN endpoints ep ON ep.event_type = i.event_type
  LEFT JOIN means l ON l.event_type = i.event_type AND l.b = i.b - 1
  LEFT JOIN means r ON r.event_type = i.event_type AND r.b = i.b + 1
),
picks AS (
  SELECT event_type, b + 1 AS sel_pos, x, y, area
  FROM (
    SELECT *, row_number() OVER (
      PARTITION BY event_type, b ORDER BY area DESC, x, event_id) AS pick
    FROM scored)
  WHERE pick = 1
)
SELECT event_type, sel_pos, x AS ts_us, y, area FROM picks
UNION ALL
SELECT event_type,
       CASE WHEN rn = 1 THEN 0 ELSE {_LTTB_NB + 1} END AS sel_pos,
       x AS ts_us, y, NULL::DOUBLE AS area
FROM pts WHERE rn = 1 OR rn = n
ORDER BY event_type, sel_pos
"""


# --------------------------------------------------------------------------
# Trailing-window anomaly detection (the z-score monitor every metrics
# pipeline ships — TimescaleDB/Grafana alerting shape): each event is
# scored against the 20 PRECEDING events of its type; |z| > 3 flags it.
#
# Cross-engine exactness: event values are exact 2-dp doubles (TESTDATA
# contract), so ALL decision arithmetic runs in INTEGER CENTS —
# n·x - S and n·Q - S² are int64 (bounds: dev² <= 1.4e12, 9·den <=
# 1.2e13 at the max observed value), and the flag test
# (n·x - S)² > 9·(n·Q - S²) is the |z| > 3 test with every division
# cleared — no decimal-widening rules, no float sum order, no FMA (the
# LTTB lesson). The DISPLAYED zscore is dev/sqrt(den) on doubles
# converted from identical integers: one division + one sqrt, both
# IEEE-correctly-rounded single ops, so the rounded display cannot
# diverge either.
#
# 100 TB shape: one equi-key (event_type) window pass with a bounded
# 20-row frame — the same bounded-frame class as user_history_window;
# no joins, no unbounded state. Warm-up rows (fewer than 20
# predecessors) are not scored, stated in the output contract.
_ANOM_LOOKBACK = 20
_ANOM_Z = 3


def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r14: pinned by-type exchange for the sliding-frame window (the
    # useful width is bounded by #event_types, but that still beats the
    # single partition AQE coalesced this to).
    e = spread(
        table(spark, sf_dir, "events").select(
            "event_id", "ts", "event_type", "value"
        ),
        "event_type",
    ).select(
        "event_id",
        "ts",
        "event_type",
        "value",
        F.round(F.col("value") * 100).cast("long").alias("vc"),
    )
    fr = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-_ANOM_LOOKBACK, -1)
    )
    n = F.lit(_ANOM_LOOKBACK)
    w = e.select(
        "event_id",
        "ts",
        "event_type",
        "value",
        "vc",
        F.count(F.lit(1)).over(fr).alias("nf"),
        F.sum("vc").over(fr).alias("s"),
        F.sum(F.col("vc") * F.col("vc")).over(fr).alias("q"),
    ).filter(F.col("nf") == _ANOM_LOOKBACK)
    dev = n * F.col("vc") - F.col("s")
    den = n * F.col("q") - F.col("s") * F.col("s")
    # den == 0 is a ZERO-VARIANCE history: any deviation from it is an
    # infinite z — the spike-after-flatline case a monitor must flag;
    # its zscore displays as NULL (no finite value exists)
    anomalous = ((den > 0) & (dev * dev > F.lit(_ANOM_Z * _ANOM_Z) * den)) | (
        (den == 0) & (dev != 0)
    )
    return (
        w.filter(anomalous)
        .select(
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
            "event_type",
            "value",
            F.when(
                den > 0,
                F.round(dev.cast("double") / F.sqrt(den.cast("double")), 4),
            ).alias("zscore"),
        )
        .orderBy("event_type", "event_id")
    )


EVENTS_ANOMALY_ORACLE = f"""
WITH w AS (
  SELECT event_id, ts, event_type, value,
         CAST(round(value * 100) AS BIGINT) AS vc,
         count(*) OVER fr AS nf,
         sum(CAST(round(value * 100) AS BIGINT)) OVER fr AS s,
         sum(CAST(round(value * 100) AS BIGINT)
             * CAST(round(value * 100) AS BIGINT)) OVER fr AS q
  FROM events
  WINDOW fr AS (PARTITION BY event_type ORDER BY ts, event_id
                ROWS BETWEEN {_ANOM_LOOKBACK} PRECEDING AND 1 PRECEDING)
),
scored AS (
  SELECT *,
         {_ANOM_LOOKBACK} * vc - s AS dev,
         {_ANOM_LOOKBACK} * q - s * s AS den
  FROM w WHERE nf = {_ANOM_LOOKBACK}
)
SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str, event_type,
       value,
       CASE WHEN den > 0
            THEN round(dev::DOUBLE / sqrt(den::DOUBLE), 4) END AS zscore
FROM scored
WHERE (den > 0 AND dev * dev > {_ANOM_Z * _ANOM_Z} * den)
   OR (den = 0 AND dev <> 0)
ORDER BY event_type, event_id
"""


QUERIES = [
    QuerySpec("events_hourly_counts", events_hourly_counts, EVENTS_HOURLY_ORACLE,
              "tumbling event-time window (ST5)"),
    QuerySpec("events_anomaly_zscore", events_anomaly_zscore,
              EVENTS_ANOMALY_ORACLE,
              "trailing-window z-score anomaly flags (integer-cents "
              "exact decision, bounded 20-row frame)"),
    QuerySpec("events_gapfill_locf", events_gapfill_locf,
              EVENTS_GAPFILL_ORACLE,
              "time_bucket_gapfill + locf: full hourly grid per type "
              "(bounded by time range, not volume), empty buckets "
              "carried forward via the engine-agnostic gaps-and-islands "
              "window"),
    QuerySpec("events_ohlc_rollup", events_ohlc_rollup, EVENTS_OHLC_ORACLE,
              "hypertable-style OHLC continuous-aggregate rollup"),
    QuerySpec("events_value_winsorize", events_value_winsorize,
              EVENTS_WINSOR_ORACLE,
              "winsorized robust stats (p05/p95 clamp, decimal means)"),
    QuerySpec("events_downsample_lttb", events_downsample_lttb,
              EVENTS_LTTB_ORACLE,
              "LTTB chart downsampling (parallel bucket-mean-anchor "
              "variant; round-6 area argmax per bucket)"),
    QuerySpec("events_sliding_counts", events_sliding_counts, EVENTS_SLIDING_ORACLE,
              "sliding event-time window (ST5)"),
    QuerySpec("events_sessions_per_user", events_sessions_per_user,
              EVENTS_SESSIONS_ORACLE, "session windows, 30-min gap (ST5)"),
    QuerySpec("events_json_stats", events_json_stats, EVENTS_JSON_ORACLE,
              "JSON prop extraction + aggregation"),
    QuerySpec("last_events_per_user", last_events_per_user, LAST_EVENTS_ORACLE,
              "keyed recency top-k (W4)"),
    QuerySpec("user_history_window", user_history_window, USER_HISTORY_ORACLE,
              "last-100 keyed history, oldest-first concat (W1/W2 + P19)"),
    QuerySpec("funnel_stages", funnel_stages, FUNNEL_STAGES_ORACLE,
              "sequential funnel pattern match (view -> click -> purchase)"),
    QuerySpec("retention_cohorts", retention_cohorts,
              RETENTION_COHORTS_ORACLE,
              "weekly signup cohorts x activity retention triangle"),
]
