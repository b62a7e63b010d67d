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


# --------------------------------------------------------------------------
# Dataset split assignment: deterministic hash-bucket train/val/test split,
# stratified report per language. The split is a pure function of doc_id
# (first 6 hex chars of md5 mod 100 → 90/5/5), so it is reproducible across
# engines, runs, and cluster sizes — the property a training pipeline needs
# from a split (no RNG, no sampling state). At 100 TB this is a narrow map
# + small agg; the assignment can also be used as a filter predicate that
# pushes into any downstream query.
def dataset_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    bucket = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10
    ).cast("long") % 100
    split = (
        F.when(bucket < 90, "train")
        .when(bucket < 95, "val")
        .otherwise("test")
    )
    return (
        d.select("lang", split.alias("split"))
        .groupBy("lang", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang", "split")
    )


DATASET_SPLIT_ORACLE = """
SELECT lang, split, count(*)::BIGINT AS n_docs
FROM (
  SELECT lang,
         CASE WHEN b < 90 THEN 'train'
              WHEN b < 95 THEN 'val'
              ELSE 'test' END AS split
  FROM (SELECT lang,
               ('0x' || substr(md5(doc_id::VARCHAR), 1, 6))::BIGINT % 100 AS b
        FROM documents)
)
GROUP BY lang, split
ORDER BY lang, split
"""


# --------------------------------------------------------------------------
# PII / URL scrubbing: count and redact emails, URLs, and phone-like
# number runs. The corpus is synthetic clean text, so PII is injected
# in-query for one doc in three (like dedup_exact_normalized does) to make
# the scrub non-vacuous. Patterns restricted to the regex dialect subset
# Java and RE2/DuckDB share.
PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PII_URL = "https?://[^\\s]+"
PII_PHONE = "\\+?[0-9][0-9()\\- ]{7,}[0-9]"


def doc_scrub_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    did = F.col("doc_id").cast("string")
    salted = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit(" contact user"), did, F.lit("@example.com or "),
                F.lit("https://t.example/"), did,
                F.lit(" call +1 (555) 010-"), F.lpad(did, 4, "0"),
            ),
        ).otherwise(F.lit("")),
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(salted, PII_EMAIL, "<EMAIL>"),
            PII_URL, "<URL>"),
        PII_PHONE, "<PHONE>")
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(salted, F.lit(PII_EMAIL), 0)).alias(
            "n_emails"
        ),
        F.size(F.regexp_extract_all(salted, F.lit(PII_URL), 0)).alias("n_urls"),
        F.size(F.regexp_extract_all(salted, F.lit(PII_PHONE), 0)).alias(
            "n_phones"
        ),
        F.length(scrubbed).alias("scrubbed_len"),
    ).orderBy("doc_id")


DOC_SCRUB_ORACLE = f"""
WITH salted AS (
  SELECT doc_id,
         text || CASE WHEN doc_id % 3 = 0
                      THEN ' contact user' || doc_id::VARCHAR
                           || '@example.com or https://t.example/'
                           || doc_id::VARCHAR || ' call +1 (555) 010-'
                           || lpad(doc_id::VARCHAR, 4, '0')
                      ELSE '' END AS s
  FROM documents WHERE doc_id < 300
)
SELECT doc_id,
       len(regexp_extract_all(s, '{PII_EMAIL}'))::BIGINT AS n_emails,
       len(regexp_extract_all(s, '{PII_URL}'))::BIGINT   AS n_urls,
       len(regexp_extract_all(s, '{PII_PHONE}'))::BIGINT AS n_phones,
       length(regexp_replace(regexp_replace(regexp_replace(s,
              '{PII_EMAIL}', '<EMAIL>', 'g'),
              '{PII_URL}', '<URL>', 'g'),
              '{PII_PHONE}', '<PHONE>', 'g'))::BIGINT    AS scrubbed_len
FROM salted
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# Vocabulary building: top terms per language by tf-rarity score.
# Determinism note: ln() is a transcendental whose last ulp may differ
# between JVM and DuckDB libm, which would break exact hashing — so the
# idf factor is the RATIONAL surrogate (N+1)/(df+1) (pure IEEE division,
# bit-identical cross-engine). Ranking is monotone in true idf, which is
# what a vocab/stopword builder needs.
# 100 TB: tf agg and df agg both shuffle on (lang, term) — one exchange
# reused; top-k per lang is a window over the small aggregated set.
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "lang", "doc_id", F.explode(tokens_col()).alias("term")
    ).filter(F.col("term") != "")
    per_term = toks.groupBy("lang", "term").agg(
        F.count(F.lit(1)).alias("tf"),
        F.countDistinct("doc_id").alias("df"),
    )
    n_docs = d.groupBy("lang").agg(F.countDistinct("doc_id").alias("n_docs"))
    scored = per_term.join(F.broadcast(n_docs), "lang").withColumn(
        "score",
        F.round(
            F.col("tf") * (F.col("n_docs") + 1) / (F.col("df") + 1), 6
        ),
    )
    w = Window.partitionBy("lang").orderBy(
        F.desc("score"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("lang", "rank", "term", "tf", "df", "score")
        .orderBy("lang", "rank")
    )


TFIDF_TOP_TERMS_ORACLE = """
WITH toks AS (
  SELECT lang, doc_id,
         unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
  FROM documents
),
per_term AS (
  SELECT lang, term, count(*)::BIGINT AS tf,
         count(DISTINCT doc_id)::BIGINT AS df
  FROM toks WHERE term <> '' GROUP BY lang, term
),
n AS (SELECT lang, count(DISTINCT doc_id)::BIGINT AS n_docs
      FROM documents GROUP BY lang),
scored AS (
  SELECT p.lang, term, tf, df,
         round(tf * (n_docs + 1) / (df + 1), 6) AS score
  FROM per_term p JOIN n ON p.lang = n.lang
)
SELECT lang, rank, term, tf, df, score
FROM (SELECT *, row_number() OVER (PARTITION BY lang
                                   ORDER BY score DESC, term) AS rank
      FROM scored)
WHERE rank <= 10
ORDER BY lang, rank
"""


# --------------------------------------------------------------------------
# Data-quality profiling: per-column null count, distinct count, min/max
# (stringified) over the documents table — the pre-flight check a training
# pipeline runs before ingesting a new shard. One aggregation pass
# computes every metric (Catalyst plans multi-distinct via expand), then
# stack() unpivots to one row per column.
_PROFILE_COLS = ("doc_id", "text", "lang", "source", "n_chars")


def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.min(F.col(c).cast("string")).alias(f"{c}__min"),
            F.max(F.col(c).cast("string")).alias(f"{c}__max"),
        ]
    wide = d.agg(F.count(F.lit(1)).alias("n_rows"), *aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__nulls, {c}__distinct, {c}__min, {c}__max"
        for c in _PROFILE_COLS
    )
    return (
        wide.selectExpr(
            "n_rows",
            f"stack({len(_PROFILE_COLS)}, {stack_args}) AS "
            "(col_name, n_nulls, n_distinct, min_val, max_val)",
        )
        .select("col_name", "n_rows", "n_nulls", "n_distinct",
                "min_val", "max_val")
        .orderBy("col_name")
    )


TABLE_PROFILE_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS col_name,
       (SELECT count(*) FROM documents) AS n_rows,
       sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_nulls,
       count(DISTINCT {c})::BIGINT AS n_distinct,
       min({c}::VARCHAR) AS min_val,
       max({c}::VARCHAR) AS max_val
FROM documents"""
    for c in _PROFILE_COLS
) + "\nORDER BY col_name"


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
    QuerySpec("dataset_split_assign", dataset_split_assign,
              DATASET_SPLIT_ORACLE,
              "deterministic hash-bucket train/val/test split, stratified"),
    QuerySpec("doc_scrub_pii", doc_scrub_pii, DOC_SCRUB_ORACLE,
              "PII/URL scrub: count + redact emails, urls, phone runs"),
    QuerySpec("tfidf_top_terms", tfidf_top_terms, TFIDF_TOP_TERMS_ORACLE,
              "vocab building: top terms per language by tf-rarity"),
    QuerySpec("table_profile", table_profile, TABLE_PROFILE_ORACLE,
              "per-column null/distinct/min/max profiling (one agg pass)"),
]
