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


QUERIES = [
    QuerySpec("token_frequencies_salted", token_frequencies_salted,
              TOKEN_FREQ_ORACLE,
              "Zipf-skewed aggregation via salted two-phase groupBy"),
]
