"""Temporal join operators: as-of join and range join.

Spark has no native AS-OF join (DuckDB/kdb/pandas do). The scalable
Spark-first formulation is the union-and-carry trick: tag both sides, union
into one frame, and carry the most recent right-side row forward with a
running `last(..., ignorenulls=True)` window — ONE shuffle on the key, no
per-row lookups, no UDF, and it streams through window state at any scale
(vs. the naive per-left-row subquery, which is a quadratic non-starter at
100 TB).

The range join stays a plain equi-join on the key with a time-band
predicate — Catalyst executes it as a hash/sort-merge join on the key with
the band as a post-filter, which is the right plan when the key is
selective (per-user event streams). All timestamps are compared as integer
microseconds so the DuckDB oracle (native ASOF JOIN) matches exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..plans.registry import QuerySpec
from ..tables import table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_cols: list[str],
) -> DataFrame:
    """Generic backward as-of join: for each left row, the most recent
    right row with right.ts <= left.ts on the same key. Right side must be
    unique per (key, ts). Returns left columns + right_cols (null when no
    right row precedes)."""
    lt = left.withColumn("__side", F.lit(1))
    rt = right.withColumn("__side", F.lit(0))
    unioned = lt.unionByName(rt, allowMissingColumns=True)
    # right rows sort BEFORE left rows at equal ts → "at or before" semantics
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(
                F.when(F.col("__side") == 0, F.col(rc)), ignorenulls=True
            ).over(w).alias(f"asof_{rc}")
            for rc in right_cols
        ],
    )
    return carried.filter(F.col("__side") == 1).drop(
        "__side", *right_cols
    )


# --------------------------------------------------------------------------
def events_asof_last_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each click event: the user's most recent error event at or
    before it (backward as-of join; inner — clicks with no prior error are
    dropped, matching DuckDB's ASOF JOIN default)."""
    e = table(spark, sf_dir, "events").withColumn("ts_us", F.unix_micros("ts"))
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts_us"
    )
    # unique per (user, ts): keep the max event_id among same-microsecond errors
    errors = (
        e.filter(F.col("event_type") == "error")
        .groupBy("user_id", F.col("ts_us").alias("err_ts_us"))
        .agg(F.max("event_id").alias("err_id"))
        .withColumnRenamed("err_ts_us", "ts_us_r")
    )
    joined = asof_join(
        clicks,
        errors.withColumnRenamed("ts_us_r", "ts_us"),
        key="user_id",
        ts="ts_us",
        right_cols=["err_id"],
    )
    return (
        joined.filter(F.col("asof_err_id").isNotNull())
        .select(
            "click_id",
            "user_id",
            F.col("ts_us").alias("click_ts_us"),
            F.col("asof_err_id").alias("last_error_id"),
        )
        .orderBy("click_id")
    )


EVENTS_ASOF_ORACLE = """
WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us
           FROM events),
clicks AS (SELECT event_id AS click_id, user_id, ts_us
           FROM e WHERE event_type = 'click'),
errors AS (SELECT user_id, ts_us, max(event_id) AS err_id
           FROM e WHERE event_type = 'error' GROUP BY user_id, ts_us)
SELECT click_id, clicks.user_id AS user_id,
       clicks.ts_us AS click_ts_us, err_id AS last_error_id
FROM clicks
ASOF JOIN errors
  ON clicks.user_id = errors.user_id AND errors.ts_us <= clicks.ts_us
ORDER BY click_id
"""


# --------------------------------------------------------------------------
def events_range_join_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: error events within 5 minutes AFTER each click, same
    user. Equi-join on user_id with the time band as join predicate."""
    e = table(spark, sf_dir, "events").withColumn("ts_us", F.unix_micros("ts"))
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("cu"),
        F.col("ts_us").alias("click_ts"),
    )
    errors = e.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.col("user_id").alias("eu"),
        F.col("ts_us").alias("err_ts"),
    )
    five_min = 5 * 60 * 1_000_000
    return (
        clicks.join(
            errors,
            (F.col("cu") == F.col("eu"))
            & (F.col("err_ts") > F.col("click_ts"))
            & (F.col("err_ts") <= F.col("click_ts") + five_min),
        )
        .select(
            "click_id",
            "error_id",
            F.col("cu").alias("user_id"),
            ((F.col("err_ts") - F.col("click_ts")) / 1_000_000)
            .cast("bigint")
            .alias("gap_seconds"),
        )
        .orderBy("click_id", "error_id")
    )


EVENTS_RANGE_JOIN_ORACLE = """
WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us
           FROM events)
SELECT c.event_id AS click_id, x.event_id AS error_id,
       c.user_id AS user_id,
       ((x.ts_us - c.ts_us) // 1000000)::BIGINT AS gap_seconds
FROM e c JOIN e x
  ON c.user_id = x.user_id
 AND c.event_type = 'click' AND x.event_type = 'error'
 AND x.ts_us > c.ts_us AND x.ts_us <= c.ts_us + 300000000
ORDER BY click_id, error_id
"""


QUERIES = [
    QuerySpec("events_asof_last_error", events_asof_last_error,
              EVENTS_ASOF_ORACLE,
              "backward as-of join via union-and-carry window"),
    QuerySpec("events_range_join_errors", events_range_join_errors,
              EVENTS_RANGE_JOIN_ORACLE,
              "range join: time-banded equi-join"),
]
