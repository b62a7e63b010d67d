"""Skew-mitigation patterns, oracle-verified.

Natural-language token frequencies are Zipfian — the exact shape of the
skew a 100 TB corpus aggregation hits: a handful of stop-words receive
orders of magnitude more rows than the median key. The salted two-phase
aggregation splits each hot key across SALT_BUCKETS partial keys, so no
single reducer receives a hot key's full row stream; the second (tiny)
aggregation merges the partials. Results are EXACTLY the direct
aggregation — the oracle verifies that — only the physical distribution
changes.

(Spark's map-side partial aggregation covers this for plain counts when
partial_aggs fit in the hash map; explicit salting is the tool for the
cases it can't — high-cardinality combiners, skewed window partitions,
skewed join keys. AQE skew-join handles the join case at runtime; this
module demonstrates the aggregation case.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import QuerySpec
from ..tables import table

SALT_BUCKETS = 16
TOP_N = 100


def token_frequencies_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 token frequencies via salted two-phase aggregation."""
    d = table(spark, sf_dir, "documents")
    tokens = d.select(
        F.explode(F.split(F.lower(F.trim(F.col("text"))), "\\s+")).alias("tok"),
        (F.crc32(F.col("text")) % SALT_BUCKETS).alias("salt"),
    ).filter(F.col("tok") != "")
    partial = tokens.groupBy("tok", "salt").agg(F.count(F.lit(1)).alias("pc"))
    return (
        partial.groupBy("tok")
        .agg(F.sum("pc").alias("n"))
        .orderBy(F.desc("n"), F.asc("tok"))
        .limit(TOP_N)
    )


TOKEN_FREQ_ORACLE = f"""
SELECT tok, count(*)::BIGINT AS n
FROM (
  SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok
  FROM documents
)
WHERE tok <> ''
GROUP BY tok
ORDER BY n DESC, tok ASC
LIMIT {TOP_N}
"""


# --------------------------------------------------------------------------
# Salted JOIN — the skew pattern for the case the module docstring
# defers: a fact table whose JOIN KEY is skewed (here event_type: 5
# values over the whole fact table — the pathological case, every key
# hot) joined against a keyed table too large to broadcast. The fact
# side gets a DETERMINISTIC salt (event_id mod S, so the oracle
# reproduces it bit-for-bit); the keyed side is replicated S ways with
# an exploded salt column; the equi-join runs on (key, salt), so each
# hot key's rows spread across S reducers instead of one. Results are
# EXACTLY the unsalted join — the oracle runs the plain join.
#
# Honesty note: THIS dim (5 rows of per-type percentiles) would be
# broadcast in production — the SHUFFLE_HASH hint suppresses that
# precisely to pin the replicated-dim salted-join PLAN (the test
# asserts hashpartitioning(event_type, salt)), which is the tool when
# the keyed side is GBs of per-key state (per-key models, profiles)
# and AQE's skew-join split cannot help (it splits partitions, not a
# single key's hash bucket, for shuffled-hash joins it doesn't
# rebalance at all on the build side).
JOIN_SALT = 16


def events_above_p95_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").select(
        "event_type",
        "value",
        (F.col("event_id") % JOIN_SALT).alias("salt"),
    )
    pct = (
        table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.percentile("value", F.lit(0.95)).alias("p95"))
    )
    pct_salted = pct.select(
        "event_type",
        "p95",
        F.explode(F.sequence(F.lit(0), F.lit(JOIN_SALT - 1))).alias("salt"),
    )
    return (
        e.join(pct_salted.hint("SHUFFLE_HASH"), ["event_type", "salt"])
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum((F.col("value") > F.col("p95")).cast("long")).alias(
                "n_above_p95"
            ),
            F.round(F.min("p95"), 4).alias("p95"),
        )
        .orderBy("event_type")
    )


EVENTS_SALTED_JOIN_ORACLE = """
WITH pct AS (
  SELECT event_type, quantile_cont(value, 0.95) AS p95
  FROM events GROUP BY event_type
)
SELECT e.event_type, count(*)::BIGINT AS n_events,
       sum(CASE WHEN value > p95 THEN 1 ELSE 0 END)::BIGINT AS n_above_p95,
       round(min(p95), 4) AS p95
FROM events e JOIN pct USING (event_type)
GROUP BY e.event_type
ORDER BY e.event_type
"""


QUERIES = [
    QuerySpec("token_frequencies_salted", token_frequencies_salted,
              TOKEN_FREQ_ORACLE,
              "Zipf-skewed aggregation via salted two-phase groupBy"),
    QuerySpec("events_above_p95_salted_join", events_above_p95_salted_join,
              EVENTS_SALTED_JOIN_ORACLE,
              "salted equi-join for skewed join keys (deterministic "
              "fact salt + replicated keyed side) ≡ the plain join"),
]
