"""Deduplication operators over `documents` (north-star surface).

Families:
  exact            hash-groupBy on raw text                → dedup_exact
  exact normalized hash-groupBy on normalized text         → dedup_exact_normalized
  n-gram Jaccard   shingle join + Jaccard threshold        → dedup_ngram_jaccard
  MinHash + LSH    see minhash_signatures (added in a later milestone
                   together with banded LSH pair generation)
  SimHash          see simhash (later milestone)
  embedding cosine near-dup pairs                          → operators/similarity.py

Scale notes (100 TB):
  - Exact dedup is the canonical hash-shuffle: groupBy(md5(text)) with
    map-side partial agg. Skew (a viral duplicated doc) is split by AQE.
  - n-gram Jaccard avoids the O(n²) cross join: explode DISTINCT shingles,
    self-join on shingle (inverted-index join), count common shingles per
    candidate pair, then filter by Jaccard. Hot shingles (stop-shingles)
    fan out quadratically — production would drop shingles with document
    frequency above a cap (we keep them here for oracle fidelity; the cap
    is a one-line filter on the inverted index).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import QuerySpec
from ..tables import table

NORMALIZE = lambda c: F.regexp_replace(F.lower(F.trim(c)), "\\s+", " ")  # noqa: E731


# --------------------------------------------------------------------------
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: canonical (min) doc_id per identical text + group size."""
    d = table(spark, sf_dir, "documents")
    groups = (
        d.select("doc_id", F.md5("text").alias("h"))
        .groupBy("h")
        .agg(
            F.min("doc_id").alias("canonical_id"),
            F.count(F.lit(1)).alias("group_size"),
        )
    )
    return (
        d.select("doc_id", F.md5("text").alias("h"))
        .join(groups, "h")
        .select("doc_id", "canonical_id", "group_size")
        .orderBy("doc_id")
    )


DEDUP_EXACT_ORACLE = """
SELECT doc_id, canonical_id, group_size
FROM (
  SELECT doc_id,
         min(doc_id) OVER (PARTITION BY md5(text))      AS canonical_id,
         count(*)  OVER (PARTITION BY md5(text))        AS group_size
  FROM documents
)
ORDER BY doc_id
"""


def dedup_exact_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on normalized text (lowercase, collapsed whitespace)."""
    d = table(spark, sf_dir, "documents")
    hashed = d.select("doc_id", F.md5(NORMALIZE(F.col("text"))).alias("h"))
    groups = hashed.groupBy("h").agg(
        F.min("doc_id").alias("canonical_id"),
        F.count(F.lit(1)).alias("group_size"),
    )
    return (
        hashed.join(groups, "h")
        .filter(F.col("group_size") > 1)
        .select("doc_id", "canonical_id", "group_size")
        .orderBy("doc_id")
    )


DEDUP_EXACT_NORM_ORACLE = """
SELECT doc_id, canonical_id, group_size
FROM (
  SELECT doc_id,
         min(doc_id) OVER (PARTITION BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))) AS canonical_id,
         count(*)  OVER (PARTITION BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))) AS group_size
  FROM documents
)
WHERE group_size > 1
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
def _word_shingles(tokens_col, n: int = 3):
    """Distinct word n-grams via sequence+transform (pure column expr).

    Guarded: sequence(0, size-n) would run DESCENDING when size < n
    (Spark's sequence auto-negates the step), so short docs get [].
    """
    return F.when(
        F.size(tokens_col) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(tokens_col) - n),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(tokens_col, i + j + 1) for j in range(n)]
                ),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by word-3-gram Jaccard >= 0.5 (inverted-index join)."""
    d = table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), "\\s+")
    shingled = d.select(
        "doc_id", F.explode(_word_shingles(toks, 3)).alias("shingle")
    ).filter(F.col("shingle") != "")
    sizes = shingled.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    a = shingled.alias("a")
    b = shingled.alias("b")
    pair_common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("nb"))
    return (
        pair_common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.col("na") + F.col("nb") - F.col("n_common")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= 0.5)
        .select("doc_a", "doc_b", "n_common", "jaccard")
        .orderBy("doc_a", "doc_b")
    )


DEDUP_NGRAM_JACCARD_ORACLE = """
WITH shingled AS (
  SELECT DISTINCT doc_id, shingle
  FROM (
    SELECT doc_id,
           unnest(list_transform(
             generate_series(1, greatest(len(toks) - 2, 0)),
             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
           )) AS shingle
    FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
          FROM documents)
  )
  WHERE shingle <> ''
),
sizes AS (
  SELECT doc_id, count(*) AS n_shingles FROM shingled GROUP BY doc_id
),
pair_common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM shingled a JOIN shingled b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, n_common,
       round(n_common / (sa.n_shingles + sb.n_shingles - n_common), 4) AS jaccard
FROM pair_common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE round(n_common / (sa.n_shingles + sb.n_shingles - n_common), 4) >= 0.5
ORDER BY doc_a, doc_b
"""


QUERIES = [
    QuerySpec("dedup_exact", dedup_exact, DEDUP_EXACT_ORACLE,
              "exact dedup: hash-groupBy, canonical id + group size"),
    QuerySpec("dedup_exact_normalized", dedup_exact_normalized,
              DEDUP_EXACT_NORM_ORACLE, "exact dedup on normalized text"),
    QuerySpec("dedup_ngram_jaccard", dedup_ngram_jaccard,
              DEDUP_NGRAM_JACCARD_ORACLE,
              "near-dup pairs: word-3-gram Jaccard via inverted-index join"),
]
