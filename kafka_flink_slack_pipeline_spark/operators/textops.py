"""Text-analysis operators over the `documents` table (north-star surface).

Implements the text-analysis family the brief calls out for LLM training-data
pipelines: token counting (whitespace + BPE-ish regex), quality scoring
(length / stopword / word-shape ratios), language-ID (marker-word heuristic),
and document fingerprinting (normalizing content hash).

All four are pure column expressions (JVM-side, whole-stage codegen) — no
Python UDFs in the hot path. At 100 TB these are embarrassingly parallel
narrow ops; the only shuffles are the final small aggregations.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf resolves string type hints here
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import QuerySpec
from ..tables import table

# BPE-ish token pattern: runs of letters, runs of digits, or single
# non-alphanumeric-non-space chars (same regex both engines).
TOKEN_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"

# Marker words per language for the n-gram/marker language-ID heuristic.
LANG_MARKERS = {
    "en": ("the", "a", "is", "of"),
    "es": ("el", "la", "de", "es"),
    "fr": ("le", "la", "de", "est"),
    "de": ("der", "die", "das", "ist"),
}


def tokens_col(text: str = "text") -> Column:
    """Whitespace tokenization of a trimmed text column."""
    return F.split(F.trim(F.col(text)), "\\s+")


def _marker_count(tokens: Column, markers: tuple[str, ...]) -> Column:
    in_list = ", ".join(f"'{m}'" for m in markers)
    return F.size(F.filter(tokens, lambda t: t.isin(*markers)))  # noqa: B023


# --------------------------------------------------------------------------
# Token counting: whitespace tokens + BPE-ish regex tokens, per-language stats.
def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    toks = tokens_col()
    return (
        d.select(
            "lang",
            F.size(toks).alias("n_tokens"),
            F.size(F.regexp_extract_all("text", F.lit(TOKEN_PATTERN), 0)).alias(
                "n_bpe_tokens"
            ),
            F.length("text").alias("len_chars"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("n_bpe_tokens").alias("total_bpe_tokens"),
            F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
            F.round(F.avg("len_chars"), 4).alias("avg_chars"),
        )
        .orderBy("lang")
    )


DOC_TOKEN_STATS_ORACLE = """
SELECT lang,
       count(*)                        AS n_docs,
       sum(n_tokens)::BIGINT           AS total_tokens,
       sum(n_bpe_tokens)::BIGINT       AS total_bpe_tokens,
       round(avg(n_tokens), 4)         AS avg_tokens,
       round(avg(len_chars), 4)        AS avg_chars
FROM (
  SELECT lang,
         len(regexp_split_to_array(trim(text), '\\s+'))               AS n_tokens,
         len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS n_bpe_tokens,
         length(text)                                                 AS len_chars
  FROM documents
)
GROUP BY lang
ORDER BY lang
"""


# --------------------------------------------------------------------------
# Quality scoring: per-doc length / stopword-ratio / mean-word-length score.
def doc_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    toks = tokens_col()
    n_tokens = F.size(toks)
    stop = _marker_count(toks, ("the", "a", "of", "is", "and"))
    mean_word_len = (F.length(F.regexp_replace("text", "\\s+", "")) / n_tokens)
    stop_ratio = stop / n_tokens
    # quality: in-range token count, healthy stopword ratio, sane word length
    score = (
        F.when((n_tokens >= 20) & (n_tokens <= 1000), F.lit(0.4)).otherwise(F.lit(0.0))
        + F.when((stop_ratio >= 0.01) & (stop_ratio <= 0.5), F.lit(0.3)).otherwise(
            F.lit(0.0)
        )
        + F.when((mean_word_len >= 2.0) & (mean_word_len <= 12.0), F.lit(0.3)).otherwise(
            F.lit(0.0)
        )
    )
    return d.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(mean_word_len, 4).alias("mean_word_len"),
        F.round(score, 1).alias("quality_score"),
    ).orderBy("doc_id")


DOC_QUALITY_ORACLE = """
SELECT doc_id,
       n_tokens,
       round(stop / n_tokens, 4)      AS stopword_ratio,
       round(squashed / n_tokens, 4)  AS mean_word_len,
       round(
         (CASE WHEN n_tokens BETWEEN 20 AND 1000 THEN 0.4 ELSE 0.0 END)
       + (CASE WHEN stop / n_tokens BETWEEN 0.01 AND 0.5 THEN 0.3 ELSE 0.0 END)
       + (CASE WHEN squashed / n_tokens BETWEEN 2.0 AND 12.0 THEN 0.3 ELSE 0.0 END)
       , 1)                           AS quality_score
FROM (
  SELECT doc_id,
         len(regexp_split_to_array(trim(text), '\\s+'))                  AS n_tokens,
         len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
             t -> t IN ('the','a','of','is','and')))::DOUBLE             AS stop,
         length(regexp_replace(text, '\\s+', '', 'g'))::DOUBLE           AS squashed
  FROM documents
)
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# Language ID: marker-word voting with fixed priority tie-break; output is
# the actual-vs-predicted confusion matrix.
def doc_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    toks = tokens_col()
    scored = d.select(
        "lang",
        *[
            _marker_count(toks, markers).alias(f"s_{code}")
            for code, markers in LANG_MARKERS.items()
        ],
    )
    s = {c: F.col(f"s_{c}") for c in LANG_MARKERS}
    predicted = (
        F.when(
            (s["en"] >= s["es"]) & (s["en"] >= s["fr"]) & (s["en"] >= s["de"]), "en"
        )
        .when((s["es"] >= s["fr"]) & (s["es"] >= s["de"]), "es")
        .when(s["fr"] >= s["de"], "fr")
        .otherwise("de")
    )
    return (
        scored.withColumn("predicted_lang", predicted)
        .groupBy("lang", "predicted_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang", "predicted_lang")
    )


DOC_LANGID_ORACLE = """
SELECT lang, predicted_lang, count(*) AS n_docs
FROM (
  SELECT lang,
         CASE WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_de THEN 'en'
              WHEN s_es >= s_fr AND s_es >= s_de THEN 'es'
              WHEN s_fr >= s_de THEN 'fr'
              ELSE 'de' END AS predicted_lang
  FROM (
    SELECT lang,
           len(list_filter(toks, t -> t IN ('the','a','is','of')))   AS s_en,
           len(list_filter(toks, t -> t IN ('el','la','de','es')))   AS s_es,
           len(list_filter(toks, t -> t IN ('le','la','de','est')))  AS s_fr,
           len(list_filter(toks, t -> t IN ('der','die','das','ist'))) AS s_de
    FROM (SELECT lang, regexp_split_to_array(trim(text), '\\s+') AS toks
          FROM documents)
  )
)
GROUP BY lang, predicted_lang
ORDER BY lang, predicted_lang
"""


# --------------------------------------------------------------------------
# Document fingerprinting: content hash of normalized text (lowercase,
# whitespace-collapsed). MD5 hex is identical across engines.
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    normalized = F.regexp_replace(F.lower(F.trim(F.col("text"))), "\\s+", " ")
    return d.select(
        "doc_id",
        F.md5(normalized).alias("fingerprint"),
        "source",
    ).orderBy("doc_id")


DOC_FINGERPRINT_ORACLE = """
SELECT doc_id,
       md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint,
       source
FROM documents
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# UDAF surface: a pandas GROUPED_AGG UDF (numpy-backed median over Arrow
# batches). Median of integer token counts is exact interpolation — the
# same number DuckDB's quantile_cont produces — so even the UDAF path is
# oracle-verified, not just smoke-tested.
_UDAFS: dict = {}


def _median_udaf():
    if "median" not in _UDAFS:
        import numpy as np

        @F.pandas_udf("double")
        def _median(v: pd.Series) -> float:
            return float(np.median(v.to_numpy(dtype="float64")))

        _UDAFS["median"] = _median
    return _UDAFS["median"]


def doc_median_tokens_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language median token count via a pandas grouped-agg UDF."""
    d = table(spark, sf_dir, "documents")
    counted = d.select("lang", F.size(tokens_col()).alias("n_tokens"))
    # a GROUPED_AGG pandas UDF cannot share an agg with JVM aggregates
    # (INVALID_PANDAS_UDF_PLACEMENT) — counts come from a separate agg + join
    medians = counted.groupBy("lang").agg(
        _median_udaf()(F.col("n_tokens").cast("double")).alias("median_tokens")
    )
    counts = counted.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        medians.join(counts, "lang")
        .select("lang", "median_tokens", "n_docs")
        .orderBy("lang")
    )


DOC_MEDIAN_TOKENS_ORACLE = """
SELECT lang,
       quantile_cont(n_tokens, 0.5) AS median_tokens,
       count(*)::BIGINT AS n_docs
FROM (
  SELECT lang,
         len(regexp_split_to_array(trim(text), '\\s+'))::DOUBLE AS n_tokens
  FROM documents
)
GROUP BY lang
ORDER BY lang
"""


QUERIES = [
    QuerySpec("doc_token_stats", doc_token_stats, DOC_TOKEN_STATS_ORACLE,
              "token counting: whitespace + BPE-ish regex"),
    QuerySpec("doc_quality_scores", doc_quality_scores, DOC_QUALITY_ORACLE,
              "per-doc quality scoring"),
    QuerySpec("doc_langid_confusion", doc_langid_confusion, DOC_LANGID_ORACLE,
              "marker-word language ID, confusion matrix"),
    QuerySpec("doc_fingerprints", doc_fingerprints, DOC_FINGERPRINT_ORACLE,
              "normalizing content fingerprint (md5)"),
    QuerySpec("doc_median_tokens_udaf", doc_median_tokens_udaf,
              DOC_MEDIAN_TOKENS_ORACLE,
              "pandas GROUPED_AGG UDAF (numpy median), oracle-verified"),
]
