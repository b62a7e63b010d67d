"""Similarity search over `embeddings` (north-star surface).

  cosine_topk_bruteforce  exact cosine top-k for a query set (the baseline)
  embedding_neardup_pairs cosine >= threshold near-duplicate pairs
  LSH-bucketed ANN        later milestone (random-hyperplane buckets →
                          candidate join → exact re-rank)

Scale notes (100 TB):
  - Brute force is O(|Q|·|C|): fine when the query set is small (here 10)
    and the candidate side streams — the crossJoin is a broadcast of the
    QUERY side (tiny), so candidates never shuffle. At billion-vector
    scale the LSH/IVF variant prunes candidates by bucket first.
  - Dot products are pure column expressions (zip_with + aggregate) in
    doubles — JVM-side, no Python. An Arrow pandas-UDF matmul variant
    is the fallback for very wide vectors (numpy BLAS beats per-element
    codegen); at dim=64 the column expression wins on serialization cost.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..plans.registry import QuerySpec
from ..tables import table


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<double> columns, sequential left fold."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    # float32 → double BEFORE any arithmetic: both engines then do identical
    # IEEE-double accumulation in array order.
    return table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb"), "label"
    )


# --------------------------------------------------------------------------
def cosine_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 cosine neighbors for query vectors (vec_id < 10)."""
    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qe")
    )
    c = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("emb").alias("ne"))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", cosine(F.col("qe"), F.col("ne")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("query_id", "neighbor_id", "rank", F.round("sim", 6).alias("sim"))
        .orderBy("query_id", "rank")
    )


COSINE_TOPK_ORACLE = """
SELECT query_id, neighbor_id, rank, round(sim, 6) AS sim
FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_cosine_similarity(q.emb, c.emb) AS sim,
         row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY list_cosine_similarity(q.emb, c.emb) DESC, c.vec_id ASC
         ) AS rank
  FROM      (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings WHERE vec_id < 10) q
  CROSS JOIN (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings) c
  WHERE q.vec_id <> c.vec_id
)
WHERE rank <= 5
ORDER BY query_id, rank
"""


# --------------------------------------------------------------------------
def embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cosine >= 0.9, a < b)."""
    emb = _emb(spark, sf_dir)
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("emb").alias("ea"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("emb").alias("eb"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .withColumn("sim", cosine(F.col("ea"), F.col("eb")))
        .filter(F.col("sim") >= 0.9)
        .select("vec_a", "vec_b", F.round("sim", 6).alias("sim"))
        .orderBy("vec_a", "vec_b")
    )


EMB_NEARDUP_ORACLE = """
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])), 6) AS sim
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) >= 0.9
ORDER BY vec_a, vec_b
"""


# --------------------------------------------------------------------------
def label_centroid_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean intra-label cosine to the label centroid (clustering quality)."""
    emb = _emb(spark, sf_dir)
    # centroid = element-wise mean: explode with position, avg, re-assemble.
    exploded = emb.select("vec_id", "label", F.posexplode("emb").alias("pos", "x"))
    centroid = (
        exploded.groupBy("label", "pos")
        .agg(F.avg("x").alias("cx"))
        .groupBy("label")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "cx"))),
                lambda s: s["cx"],
            ).alias("centroid")
        )
    )
    return (
        emb.join(F.broadcast(centroid), "label")
        .withColumn("sim", cosine(F.col("emb"), F.col("centroid")))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(F.avg("sim"), 6).alias("avg_centroid_sim"),
        )
        .orderBy("label")
    )


LABEL_CENTROID_ORACLE = """
WITH exploded AS (
  SELECT vec_id, label, u.x, u.pos
  FROM embeddings,
       LATERAL (SELECT unnest(CAST(embedding AS DOUBLE[])) AS x,
                       generate_subscripts(embedding, 1) AS pos) u
),
centroid AS (
  SELECT label, pos, avg(x) AS cx FROM exploded GROUP BY label, pos
),
sims AS (
  SELECT e.vec_id, e.label,
         sum(e.x * c.cx) / (sqrt(sum(e.x * e.x)) * sqrt(sum(c.cx * c.cx))) AS sim
  FROM exploded e JOIN centroid c ON e.label = c.label AND e.pos = c.pos
  GROUP BY e.vec_id, e.label
)
SELECT label, count(*) AS n_vectors, round(avg(sim), 6) AS avg_centroid_sim
FROM sims GROUP BY label ORDER BY label
"""


QUERIES = [
    QuerySpec("cosine_topk_bruteforce", cosine_topk_bruteforce, COSINE_TOPK_ORACLE,
              "exact cosine top-k, broadcast query side"),
    QuerySpec("embedding_neardup_pairs", embedding_neardup_pairs, EMB_NEARDUP_ORACLE,
              "embedding-cosine near-dup pairs"),
]
