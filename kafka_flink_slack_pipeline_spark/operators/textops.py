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

from pyspark.sql.window import Window

from ..plans.registry import QuerySpec
from ..tables import spread, table

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
# Gopher quality-filter rule set (Rae et al. 2021, "Scaling Language
# Models: Methods, Analysis & Insights from Training Gopher", Table A1)
# — the published heuristic battery most large-corpus curation stacks
# start from. Emitted as per-doc metrics + one 0/1 flag per rule + the
# composite keep flag, so downstream selection can drop or re-weight by
# individual rule. All thresholds are the paper's; every metric is a
# narrow JVM-side projection (zero shuffles before the output sort).
# Rules are evaluated on the ROUNDED (4dp) metrics — the same values
# the query outputs — so the flag is reproducible from the row itself
# and engine-identical under the repo's round-parity policy.
_GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")
_GOPHER_BULLETS = ("•", "-", "*")
_GOPHER_METRICS = (
    "n_words", "mean_word_len", "hash_word_ratio", "ellipsis_word_ratio",
    "bullet_line_frac", "ellipsis_line_frac", "alpha_word_frac",
    "n_stop_hits",
)
_GOPHER_RULES = (
    "r_word_count", "r_mean_word_len", "r_symbol_ratio", "r_bullet_lines",
    "r_ellipsis_lines", "r_alpha_words", "r_stop_words",
)


def with_gopher_flags(df: DataFrame, text: str = "text") -> DataFrame:
    """Append the Gopher metrics, per-rule 0/1 flags, and `gopher_keep`
    to ANY frame carrying a `text` column — a pure narrow projection, so
    it composes into batch queries and Structured Streams alike (the
    streaming admission gate in streaming/event_time.py uses it
    unchanged). Caller's columns pass through; the appended names
    (_GOPHER_METRICS/_GOPHER_RULES/gopher_keep) must not pre-exist."""
    toks = F.split(F.trim(F.col(text)), "\\s+")
    n_words = F.size(toks)
    n_hash = F.length(text) - F.length(
        F.replace(F.col(text), F.lit("#"), F.lit(""))
    )
    n_ellipsis = (
        F.length(text)
        - F.length(F.replace(F.col(text), F.lit("..."), F.lit("")))
    ) / 3
    lines = F.split(F.col(text), "\n")
    n_lines = F.size(lines)
    df = df.withColumns(
        {
            "n_words": n_words,
            "mean_word_len": F.round(
                F.length(F.regexp_replace(text, "\\s+", "")) / n_words, 4
            ),
            # Gopher tests the hash and ellipsis ratios SEPARATELY
            # ("symbol-to-word ratio greater than 0.1 for either the
            # hash symbol or the ellipsis") — not a combined sum.
            "hash_word_ratio": F.round(n_hash / n_words, 4),
            "ellipsis_word_ratio": F.round(n_ellipsis / n_words, 4),
            "bullet_line_frac": F.round(
                F.size(
                    F.filter(
                        lines,
                        lambda l: F.ltrim(l).startswith(_GOPHER_BULLETS[0])
                        | F.ltrim(l).startswith(_GOPHER_BULLETS[1])
                        | F.ltrim(l).startswith(_GOPHER_BULLETS[2]),
                    )
                )
                / n_lines,
                4,
            ),
            "ellipsis_line_frac": F.round(
                F.size(
                    F.filter(
                        lines,
                        lambda l: F.rtrim(l).endswith("...")
                        | F.rtrim(l).endswith("…"),
                    )
                )
                / n_lines,
                4,
            ),
            "alpha_word_frac": F.round(
                F.size(F.filter(toks, lambda t: t.rlike("[a-zA-Z]")))
                / n_words,
                4,
            ),
            "n_stop_hits": F.size(
                F.array_intersect(
                    F.array_distinct(toks),
                    F.array(*[F.lit(s) for s in _GOPHER_STOPS]),
                )
            ),
        }
    )
    df = df.withColumns(
        {
            "r_word_count": (
                (F.col("n_words") >= 50) & (F.col("n_words") <= 100000)
            ).cast("int"),
            "r_mean_word_len": (
                (F.col("mean_word_len") >= 3) & (F.col("mean_word_len") <= 10)
            ).cast("int"),
            "r_symbol_ratio": (
                (F.col("hash_word_ratio") <= 0.1)
                & (F.col("ellipsis_word_ratio") <= 0.1)
            ).cast("int"),
            "r_bullet_lines": (F.col("bullet_line_frac") <= 0.9).cast("int"),
            "r_ellipsis_lines": (
                F.col("ellipsis_line_frac") <= 0.3
            ).cast("int"),
            "r_alpha_words": (F.col("alpha_word_frac") >= 0.8).cast("int"),
            "r_stop_words": (F.col("n_stop_hits") >= 2).cast("int"),
        }
    )
    keep = None
    for c in _GOPHER_RULES:
        keep = F.col(c) if keep is None else keep * F.col(c)
    return df.withColumn("gopher_keep", keep.cast("int"))


def gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return (
        with_gopher_flags(d)
        .select(
            "doc_id",
            *_GOPHER_METRICS,
            *_GOPHER_RULES,
            F.col("gopher_keep").alias("keep"),
        )
        .orderBy("doc_id")
    )


# The metrics+flags CTE pair is shared verbatim with the distilled
# classifier's silver-label stage below (the funnel-composes-the-decon-
# oracle precedent: a rule change breaks both hashes together).
_GOPHER_CTES = """metrics AS (
  SELECT doc_id,
         len(toks) AS n_words,
         round(length(regexp_replace(text, '\\s+', '', 'g')) / len(toks), 4)
           AS mean_word_len,
         round((length(text) - length(replace(text, '#', '')))
               / len(toks), 4) AS hash_word_ratio,
         round(((length(text) - length(replace(text, '...', ''))) / 3)
               / len(toks), 4) AS ellipsis_word_ratio,
         round(len(list_filter(lines,
                 l -> starts_with(trim(l), '•') OR starts_with(trim(l), '-')
                   OR starts_with(trim(l), '*'))) / len(lines), 4)
           AS bullet_line_frac,
         round(len(list_filter(lines,
                 l -> ends_with(rtrim(l), '...') OR ends_with(rtrim(l), '…')))
               / len(lines), 4) AS ellipsis_line_frac,
         round(len(list_filter(toks, t -> regexp_matches(t, '[a-zA-Z]')))
               / len(toks), 4) AS alpha_word_frac,
         len(list_intersect(list_distinct(toks),
             ['the','be','to','of','and','that','have','with']))
           AS n_stop_hits
  FROM (
    SELECT doc_id, text,
           regexp_split_to_array(trim(text), '\\s+') AS toks,
           string_split(text, chr(10)) AS lines
    FROM documents
  )
),
flagged AS (
  SELECT *,
         (n_words BETWEEN 50 AND 100000)::INT              AS r_word_count,
         (mean_word_len BETWEEN 3 AND 10)::INT             AS r_mean_word_len,
         (hash_word_ratio <= 0.1 AND ellipsis_word_ratio <= 0.1)::INT
                                                           AS r_symbol_ratio,
         (bullet_line_frac <= 0.9)::INT                    AS r_bullet_lines,
         (ellipsis_line_frac <= 0.3)::INT                  AS r_ellipsis_lines,
         (alpha_word_frac >= 0.8)::INT                     AS r_alpha_words,
         (n_stop_hits >= 2)::INT                           AS r_stop_words
  FROM metrics
)"""

GOPHER_QUALITY_ORACLE = f"""
WITH {_GOPHER_CTES}
SELECT *,
       r_word_count * r_mean_word_len * r_symbol_ratio * r_bullet_lines
       * r_ellipsis_lines * r_alpha_words * r_stop_words AS keep
FROM flagged
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# Distilled quality classifier — the TRAINED member completing the
# quality-scoring trio (heuristic rule batteries: gopher/c4_quality_
# flags; LM perplexity: doc_bigram_lm_score/ccnet_perplexity_buckets;
# discriminative classifier: this). The standard production move
# (GPT-3's quality classifier, Brown et al. 2020 Appendix A; the
# fastText classifiers of Joulin et al. 2016 as used by CCNet-family
# pipelines) is to DISTILL an expensive or rule-based quality signal
# into a cheap token-level classifier and score the whole corpus with
# it. Silver labels here are the corpus' own stage-1 battery verdicts
# (quality_signals_of thresholds — the qk rule the curation funnel
# gates on; the Gopher battery is one-class on the test corpora, which
# would make the hash certify only smoothing arithmetic, while qk
# splits it ~90/10 and exercises real two-class counts). The
# composition is the point: the classifier learns to imitate the rule
# battery from token evidence alone, and corpus_curation_funnel
# composes THIS exact machinery as its stage 6 (classifier_kept) — the
# hash-green standalone op is that stage's unit certificate. The model
# is Bernoulli Naive Bayes over per-doc DISTINCT tokens with Laplace
# smoothing.
#
# Numeric policy (the doc_bigram_lm_score precedent): the NB log-odds
# sum is replaced by the ln-free rational surrogate — each token's
# smoothed likelihood ratio w_t = ((ck+1)(nd+2)) / ((cd+1)(nk+2)) is
# ONE correctly-rounded IEEE division of two exact integers, and the
# per-doc score is the MEAN of w_t over the doc's distinct tokens
# (DECIMAL(25,10)-accumulated, round 6) — monotone in the same
# direction as the NB posterior, engine-exact. pred_keep = score > 1
# (mean likelihood ratio favors the keep class) is a diagnostic
# threshold; downstream selection would sweep it.
#
# Scale notes (100 TB): the model is vocab-bounded (token -> two
# counts), built by one groupBy over the exploded corpus; scoring is
# one equi-join of the same exploded frame against it (postings shape,
# bm25's discipline) + a broadcast 1-row class-totals attach. Corpus
# scanned 3x (model pass, scoring pass, class totals — the
# doc_unigram_surprisal budget); silver_keep rides the exploded frame
# so no fourth label join-back.
def _nb_scored(d: DataFrame) -> DataFrame:
    """Shared scored frame of the distilled classifier: one row per doc
    with (doc_id, n_toks, n_terms, nb_score, silver_keep) — the
    classifier query below selects its report columns from it and the
    threshold-curve op sweeps its operating points over it, so the model
    and scoring math cannot drift between the two driver rows. n_toks
    (total whitespace tokens, the curve's kept-token weight) rides the
    groupBy keys — functionally dependent on doc_id, no extra shuffle."""
    # r14: all three corpus branches (scoring pass, model pass, class
    # totals) recompute the quality-signal battery — a regex-heavy
    # narrow map that ran single-task on the single-row-group scan
    # (measured 1.46/0.59/0.45 s single-task stages). Spread the input
    # once; every branch inherits the width.
    d = spread(d, "doc_id")
    labeled = quality_signals_of(d, with_toks=True).select(
        "doc_id",
        (
            (F.col("quality_score") >= _FILTER_MIN_QUALITY)
            & (F.col("dup_bigram_frac") <= _FILTER_MAX_DUP_BIGRAM)
        )
        .cast("int")
        .alias("silver_keep"),
        F.size("toks").cast("long").alias("n_toks"),
        F.array_distinct(F.col("toks")).alias("terms"),
    )
    toks = labeled.select(
        "doc_id", "silver_keep", "n_toks", F.explode("terms").alias("term")
    )
    classes = labeled.agg(
        F.sum("silver_keep").cast("long").alias("nk"),
        (F.count(F.lit(1)) - F.sum("silver_keep")).cast("long").alias("nd"),
    )
    model = toks.groupBy("term").agg(
        F.sum("silver_keep").cast("long").alias("ck"),
        (F.count(F.lit(1)) - F.sum("silver_keep")).cast("long").alias("cd"),
    )
    w = (
        ((F.col("ck") + 1) * (F.col("nd") + 2))
        / ((F.col("cd") + 1) * (F.col("nk") + 2))
    ).cast("double")
    return (
        toks.join(model, "term")  # every corpus term is in the model
        .crossJoin(F.broadcast(classes))
        .select("doc_id", "silver_keep", "n_toks", w.alias("w"))
        .groupBy("doc_id", "silver_keep", "n_toks")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.round(
                F.sum(F.col("w").cast("decimal(25,10)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("nb_score"),
        )
    )


def quality_classifier_distill(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _nb_scored(table(spark, sf_dir, "documents"))
        .select(
            "doc_id",
            "n_terms",
            "nb_score",
            "silver_keep",
            (F.col("nb_score") > 1.0).cast("int").alias("pred_keep"),
        )
        .orderBy("doc_id")
    )


# Assembled lazily (module bottom): QUALITY_SIG_SQL is defined below
# with the signal machinery it mirrors. The CTE body (everything up to
# `scored`) is SHARED between the classifier report's oracle and the
# threshold-curve oracle — one definition, two consumers, no drift.
_CLASSIFIER_SCORED_CTES_TMPL = """sig AS ({SIG}),
labels AS (
  SELECT doc_id,
         (quality_score >= {MINQ} AND dup_bigram_frac <= {MAXDB})::INT
           AS keep
  FROM sig
),
classes AS (
  SELECT sum(keep)::BIGINT AS nk, (count(*) - sum(keep))::BIGINT AS nd
  FROM labels
),
toks AS (
  SELECT d.doc_id, l.keep,
         len(regexp_split_to_array(trim(d.text), '\\s+'))::BIGINT AS n_toks,
         unnest(list_distinct(regexp_split_to_array(trim(d.text), '\\s+')))
           AS term
  FROM documents d JOIN labels l USING (doc_id)
),
model AS (
  SELECT term, sum(keep)::BIGINT AS ck, (count(*) - sum(keep))::BIGINT AS cd
  FROM toks GROUP BY term
),
scored AS (
  SELECT t.doc_id, t.keep AS silver_keep, t.n_toks,
         count(*)::BIGINT AS n_terms,
         round(sum(((((ck + 1) * (nd + 2))::DOUBLE
                     / ((cd + 1) * (nk + 2))))::DECIMAL(25,10))::DOUBLE
               / count(*), 6) AS nb_score
  FROM toks t JOIN model USING (term), classes
  GROUP BY t.doc_id, t.keep, t.n_toks
)"""

_QUALITY_CLASSIFIER_ORACLE_TMPL = """
WITH {CTES}
SELECT doc_id, n_terms, nb_score, silver_keep,
       (nb_score > 1.0)::INT AS pred_keep
FROM scored ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# Classifier operating-point table — the knob the deployment reads to
# pick the stage-7 cut (the tuning-curve precedent: ivf_nprobe_recall_
# curve, minhash_banding_tradeoff). quality_classifier_distill ships
# pred_keep = score > 1.0 as a stated diagnostic threshold; this table
# sweeps the threshold over a fixed literal grid and reports precision /
# recall / F1 against the stage-1 silver labels plus the kept-doc and
# kept-token fractions — the retention cost of each operating point.
# The grid brackets the rational-surrogate score's observed band
# (means of per-term likelihood ratios land in ~[1.5, 1.9] on these
# corpora; 1.0 is the deployed keep-everything-the-model-likes default)
# — the sweep is a LITERAL, like every knob table here, so the driver
# hash pins the whole curve.
#
# Exactness: tp/fp/fn are integer counts of (rounded score) > (literal)
# comparisons; each reported ratio is ONE double division of exact
# integers, rounded 6, with zero denominators guarded by CASE on both
# engines. Recall is monotone non-increasing in the threshold BY
# CONSTRUCTION (raising the cut only shrinks the predicted-keep set),
# which the test pins.
#
# 100 TB shape: one scored frame (the classifier's own bounded plan),
# then ONE narrow explode over an 8-literal array + a groupBy on the
# 8-value threshold key — bounded aggregate, no new shuffle shapes.
_CLS_THRESHOLDS = (1.0, 1.65, 1.7, 1.725, 1.75, 1.775, 1.8, 1.85)


def classifier_threshold_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = _nb_scored(table(spark, sf_dir, "documents"))
    sw = scored.select(
        "silver_keep",
        "n_toks",
        "nb_score",
        F.explode(
            F.array(*[F.lit(float(t)) for t in _CLS_THRESHOLDS])
        ).alias("threshold"),
    )
    pred = F.col("nb_score") > F.col("threshold")
    kept = F.col("silver_keep") == 1

    def n(cond):
        return F.coalesce(
            F.sum(F.when(cond, F.lit(1))), F.lit(0)
        ).cast("long")

    agg = sw.groupBy("threshold").agg(
        n(pred & kept).alias("tp"),
        n(pred & ~kept).alias("fp"),
        n(~pred & kept).alias("fn"),
        F.count(F.lit(1)).alias("n_docs"),
        F.coalesce(F.sum(F.when(pred, F.col("n_toks"))), F.lit(0))
        .cast("long")
        .alias("kept_tokens"),
        F.sum("n_toks").cast("long").alias("total_tokens"),
    )

    def ratio(num, den):
        return F.when(den > 0, F.round(num.cast("double") / den, 6))

    tp, fp, fn = F.col("tp"), F.col("fp"), F.col("fn")
    return agg.select(
        "threshold",
        "tp",
        "fp",
        "fn",
        ratio(tp, tp + fp).alias("precision"),
        ratio(tp, tp + fn).alias("recall"),
        ratio(2 * tp, 2 * tp + fp + fn).alias("f1"),
        ratio(tp + fp, F.col("n_docs")).alias("kept_doc_frac"),
        ratio(F.col("kept_tokens"), F.col("total_tokens")).alias(
            "kept_token_frac"
        ),
    ).orderBy("threshold")


_CLS_CURVE_ORACLE_TMPL = """
WITH {CTES},
sweep AS (
  SELECT s.silver_keep, s.n_toks, s.nb_score, u.threshold
  FROM scored s, unnest([{THRESHOLDS}]::DOUBLE[]) AS u(threshold)
),
agg AS (
  SELECT threshold,
         coalesce(sum((nb_score > threshold AND silver_keep = 1)::INT),
                  0)::BIGINT AS tp,
         coalesce(sum((nb_score > threshold AND silver_keep = 0)::INT),
                  0)::BIGINT AS fp,
         coalesce(sum((nb_score <= threshold AND silver_keep = 1)::INT),
                  0)::BIGINT AS fn,
         count(*)::BIGINT AS n_docs,
         coalesce(sum(CASE WHEN nb_score > threshold THEN n_toks END),
                  0)::BIGINT AS kept_tokens,
         sum(n_toks)::BIGINT AS total_tokens
  FROM sweep GROUP BY threshold
)
SELECT threshold, tp, fp, fn,
       CASE WHEN tp + fp > 0
            THEN round(tp::DOUBLE / (tp + fp), 6) END AS precision,
       CASE WHEN tp + fn > 0
            THEN round(tp::DOUBLE / (tp + fn), 6) END AS recall,
       CASE WHEN 2 * tp + fp + fn > 0
            THEN round((2 * tp)::DOUBLE / (2 * tp + fp + fn), 6) END AS f1,
       CASE WHEN n_docs > 0
            THEN round((tp + fp)::DOUBLE / n_docs, 6) END AS kept_doc_frac,
       CASE WHEN total_tokens > 0
            THEN round(kept_tokens::DOUBLE / total_tokens, 6) END
         AS kept_token_frac
FROM agg ORDER BY threshold
"""


# --------------------------------------------------------------------------
# C4 heuristic filter battery (Raffel et al. 2020, "Exploring the Limits
# of Transfer Learning...", §2.2) — the other canonical published
# curation rule set beside Gopher's. Line rules (terminal punctuation,
# >= 5 words, no "javascript") are evaluated per line and reported as
# the kept-line fraction; document rules (>= 3 sentences, no "lorem
# ipsum", no '{') gate the doc outright. Sentences are counted as
# maximal terminal-punctuation RUNS ('[.!?]+'), so an ellipsis is one
# sentence boundary, not three. The original's bad-words list is a
# policy artifact, not an algorithm — omitted here (callers inject
# their own list the same way the line rules compose). All-JVM narrow
# map, zero shuffles before the output sort.
_C4_MIN_LINE_WORDS = 5  # the paper's "at least 5 words" line rule
def with_c4_flags(df: DataFrame, text: str = "text") -> DataFrame:
    """Append the C4 metrics, per-rule 0/1 flags, and `c4_keep` to ANY
    frame carrying a `text` column — the streaming-composable twin of
    with_gopher_flags (same pure-narrow-projection contract)."""
    lines = F.split(F.col(text), "\n")
    n_lines = F.size(lines)
    line_ok = lambda l: (  # noqa: E731
        (
            F.rtrim(l).endswith(".")
            | F.rtrim(l).endswith("!")
            | F.rtrim(l).endswith("?")
            | F.rtrim(l).endswith('"')
        )
        & (F.size(F.split(F.trim(l), "\\s+")) >= _C4_MIN_LINE_WORDS)
        & ~F.lower(l).contains("javascript")
    )
    n_kept = F.size(F.filter(lines, line_ok))
    n_sentences = F.regexp_count(F.col(text), F.lit("[.!?]+"))
    df = df.withColumns(
        {
            "n_lines": n_lines,
            "n_kept_lines": n_kept,
            "kept_line_frac": F.round(n_kept / n_lines, 4),
            "n_sentences": n_sentences,
            "r_min_sentences": (n_sentences >= 3).cast("int"),
            "r_no_lorem": (
                ~F.lower(text).contains("lorem ipsum")
            ).cast("int"),
            "r_no_brace": (~F.col(text).contains("{")).cast("int"),
        }
    )
    return df.withColumn(
        "c4_keep",
        (
            F.col("r_min_sentences")
            * F.col("r_no_lorem")
            * F.col("r_no_brace")
            * (F.col("n_kept_lines") > 0).cast("int")
        ),
    )


def c4_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return (
        with_c4_flags(d)
        .select(
            "doc_id",
            "n_lines",
            "n_kept_lines",
            "kept_line_frac",
            "n_sentences",
            "r_min_sentences",
            "r_no_lorem",
            "r_no_brace",
            F.col("c4_keep").alias("keep"),
        )
        .orderBy("doc_id")
    )


C4_QUALITY_ORACLE = """
SELECT *,
       r_min_sentences * r_no_lorem * r_no_brace
         * (n_kept_lines > 0)::INT AS keep
FROM (
  SELECT doc_id,
         len(lines) AS n_lines,
         len(kept)  AS n_kept_lines,
         round(len(kept) / len(lines), 4) AS kept_line_frac,
         len(regexp_extract_all(text, '[.!?]+')) AS n_sentences,
         (len(regexp_extract_all(text, '[.!?]+')) >= 3)::INT
           AS r_min_sentences,
         (NOT contains(lower(text), 'lorem ipsum'))::INT AS r_no_lorem,
         (NOT contains(text, '{'))::INT                  AS r_no_brace
  FROM (
    SELECT doc_id, text, lines,
           list_filter(lines,
             l -> (ends_with(rtrim(l), '.') OR ends_with(rtrim(l), '!')
                OR ends_with(rtrim(l), '?') OR ends_with(rtrim(l), '"'))
              AND len(regexp_split_to_array(trim(l), '\\s+')) >= 5
              AND NOT contains(lower(l), 'javascript')) AS kept
    FROM (SELECT doc_id, text, string_split(text, chr(10)) AS lines
          FROM documents)
  )
)
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# RefinedWeb-style line-wise correction (Penedo et al. 2023, "The
# RefinedWeb Dataset for Falcon LLM", §3.3 "line-wise corrections"):
# boilerplate lines — navigation chrome, cookie banners, share buttons —
# repeat VERBATIM across many documents, so a line whose normalized form
# (lower + trim) appears in more than _BOILERPLATE_DF_CAP distinct
# documents is scrubbed from every document that carries it. Documents
# are reassembled in original line order.
#
# 100 TB shape: one groupBy shuffle for the line document-frequency
# table (line-key domain is corpus-scale — NOT broadcast), one
# equi-join back on the line key, one groupBy(doc_id) reassembly with a
# sort_array over (pos, line) structs. Three hash shuffles, no windows,
# no Python. Frequent EMPTY lines are scrubbed like any other repeated
# line — a blankness allowance would be a policy knob on top.
_BOILERPLATE_DF_CAP = 5


def boilerplate_line_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    lines = d.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), "\n")).alias("pos", "line"),
    ).withColumn("lkey", F.lower(F.trim("line")))
    ldf = lines.groupBy("lkey").agg(
        F.count_distinct("doc_id").alias("line_df")
    )
    joined = lines.join(ldf, "lkey")
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(
                (F.col("line_df") > _BOILERPLATE_DF_CAP).cast("bigint")
            ).alias("n_scrubbed"),
            F.concat_ws(
                "\n",
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.when(
                                F.col("line_df") <= _BOILERPLATE_DF_CAP,
                                F.struct("pos", "line"),
                            )
                        )
                    ),
                    lambda s: s["line"],
                ),
            ).alias("clean_text"),
        )
        .orderBy("doc_id")
    )


BOILERPLATE_SCRUB_ORACLE = f"""
WITH lines AS (
  SELECT doc_id, i AS pos, lines[i] AS line, lower(trim(lines[i])) AS lkey
  FROM (SELECT doc_id, string_split(text, chr(10)) AS lines
        FROM documents),
       unnest(generate_series(1, len(lines))) AS t(i)
),
ldf AS (
  SELECT lkey, count(DISTINCT doc_id) AS line_df FROM lines GROUP BY lkey
)
SELECT doc_id,
       count(*)::BIGINT AS n_lines,
       sum((line_df > {_BOILERPLATE_DF_CAP})::BIGINT)::BIGINT AS n_scrubbed,
       coalesce(string_agg(line, chr(10) ORDER BY pos)
                  FILTER (WHERE line_df <= {_BOILERPLATE_DF_CAP}),
                '') AS clean_text
FROM lines JOIN ldf USING (lkey)
GROUP BY doc_id
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
# Lang-balanced stratified sampling: draw toward a fixed per-language
# quota (rate = min(1, target/n_lang)), deterministically via a salted
# md5 of doc_id — no RNG, so the sample is reproducible at any scale and
# independent of the train/val/test hash (different salt). Each kept row
# carries sample_weight = 1/rate for unbiased reweighting downstream.
#
# Scale notes (100 TB): per-lang counts are a tiny aggregate (map-side
# partial -> a handful of rows) BROADCAST back onto the corpus — the
# corpus itself never shuffles (a count-window over lang would instead
# hash-partition 100 TB by a low-cardinality skewed key). Filter and
# weight are then row-local.
_SAMPLE_TARGET = 60  # per-language quota


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    rates = (
        d.groupBy("lang")
        .agg(F.count(F.lit(1)).cast("double").alias("n"))
        .select(
            "lang",
            F.least(F.lit(1.0), F.lit(float(_SAMPLE_TARGET)) / F.col("n"))
            .alias("rate"),
        )
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("samp:"), F.col("doc_id").cast("string"))),
                1, 6,
            ),
            16, 10,
        ).cast("double")
        / F.lit(16777216.0)
    )
    return (
        d.join(F.broadcast(rates), "lang")
        .filter(u < F.col("rate"))
        .select(
            "doc_id", "lang",
            F.round(F.lit(1.0) / F.col("rate"), 4).alias("sample_weight"),
        )
        .orderBy("doc_id")
    )


STRATIFIED_SAMPLE_ORACLE = f"""
WITH rates AS (
  SELECT lang, least(1.0, {_SAMPLE_TARGET} / count(*)::DOUBLE) AS rate
  FROM documents GROUP BY lang
)
SELECT d.doc_id, d.lang, round(1.0 / r.rate, 4) AS sample_weight
FROM documents d JOIN rates r USING (lang)
WHERE ('0x' || substr(md5('samp:' || d.doc_id::VARCHAR), 1, 6))::BIGINT
      / 16777216.0 < r.rate
ORDER BY d.doc_id
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
    # r14: a spread of this head was tried and REVERTED (measured 0.60 s
    # -> 1.08 s): the unfiltered full-vocab explode feeds a countDistinct
    # groupBy whose partial aggregation collapses far better from one
    # partition than from sixteen.
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


# --------------------------------------------------------------------------
# Benchmark decontamination: flag training documents sharing a word-5-gram
# with an eval-benchmark set. The benchmark here is derived in-query (an
# excerpt — tokens 5..25 — of every 17th document, simulating an eval set
# quoting corpus text), which guarantees non-vacuous signal: each excerpt's
# source document must be flagged, plus any near-duplicates of it.
#
# Scale notes (100 TB): eval benchmarks are small and bounded (thousands of
# rows), so the benchmark shingle postings are BROADCAST — the corpus-side
# shingle explosion never shuffles for the join; the only shuffle is the
# final per-doc aggregation. This is the standard n-gram-overlap
# decontamination pass an LLM training pipeline runs before training.
_DECON_EVERY = 17       # every k-th doc seeds the in-query benchmark set
_DECON_NGRAM = 5        # word-n-gram overlap unit
_DECON_SLICE = (5, 21)  # benchmark excerpt: tokens 5..25 (start, length)


def benchmark_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import _word_shingles

    d = table(spark, sf_dir, "documents")
    toked = d.select("doc_id", tokens_col().alias("toks"))
    bench = toked.filter(F.col("doc_id") % _DECON_EVERY == 0).select(
        F.col("doc_id").alias("bench_id"),
        F.slice(F.col("toks"), *_DECON_SLICE).alias("toks"),
    )
    bench_sh = bench.select(
        "bench_id",
        F.explode(_word_shingles(F.col("toks"), _DECON_NGRAM)).alias("shingle"),
    ).filter(F.col("shingle") != "")
    # r14: the corpus-side shingle explode spread off the single-task
    # scan (the bench side keeps the direct scan + doc_id pushdown).
    corpus_sh = spread(d.select("doc_id", "text"), "doc_id").select(
        "doc_id", tokens_col().alias("toks")
    ).select(
        "doc_id",
        F.explode(_word_shingles(F.col("toks"), _DECON_NGRAM)).alias("shingle"),
    ).filter(F.col("shingle") != "")
    return (
        corpus_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("bench_id").alias("n_bench_docs"),
            F.countDistinct("shingle").alias("n_shared_shingles"),
        )
        .orderBy("doc_id")
    )


_DECON_SHINGLE_SQL = """
  SELECT DISTINCT {id_col}, shingle FROM (
    SELECT {id_col},
           unnest(list_transform(
             generate_series(1, greatest(len(toks) - 4, 0)),
             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                  || ' ' || toks[i+3] || ' ' || toks[i+4]
           )) AS shingle
    FROM {src})
  WHERE shingle <> ''
"""

BENCHMARK_DECON_ORACLE = f"""
WITH toked AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
  FROM documents
),
bench AS (
  SELECT doc_id AS bench_id, list_slice(toks, 5, 25) AS toks
  FROM toked WHERE doc_id % {_DECON_EVERY} = 0
),
bench_sh AS ({_DECON_SHINGLE_SQL.format(id_col="bench_id", src="bench")}),
corpus_sh AS ({_DECON_SHINGLE_SQL.format(id_col="doc_id", src="toked")})
SELECT doc_id,
       count(DISTINCT bench_id) AS n_bench_docs,
       count(DISTINCT shingle) AS n_shared_shingles
FROM corpus_sh JOIN bench_sh USING (shingle)
GROUP BY doc_id
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# Repetition metrics (Gopher/MassiveText-style quality filters): per-doc
# duplicate-word fraction, duplicate-bigram fraction, and the fraction of
# bigrams taken by the single most frequent bigram. Documents dominated by
# repeated n-grams are boilerplate/spam candidates.
#
# Scale notes (100 TB): every metric — including the per-doc mode — is a
# pure array expression (size/array_distinct/nested transform+filter), so
# the whole query is a narrow map with ZERO shuffles; cost is O(distinct
# bigrams × bigrams) per row, bounded by doc length. The nested HOF does
# not whole-stage-codegen, but it stays JVM-side and embarrassingly
# parallel, which is the property that matters at scale.
_REP_FLAG_DUP_BIGRAM = 0.2  # dup_bigram_frac above this → repetitive


def doc_repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    toks = tokens_col()
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 2),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i + 1), F.element_at(toks, i + 2)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    base = d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_words"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_words"),
        bigrams.alias("bigrams"),
    ).filter(F.col("n_words") >= 2)
    # per-doc mode without a shuffle: count each distinct bigram in place
    top_cnt = F.array_max(
        F.transform(
            F.array_distinct(F.col("bigrams")),
            lambda b: F.size(F.filter(F.col("bigrams"), lambda x: x == b)),
        )
    ).cast("long")
    return (
        base.select(
            "doc_id",
            "n_words",
            F.round(1 - F.col("n_distinct_words") / F.col("n_words"), 4)
            .alias("dup_word_frac"),
            F.round(
                1 - F.size(F.array_distinct("bigrams"))
                / (F.col("n_words") - 1), 4
            ).alias("dup_bigram_frac"),
            F.round(top_cnt / (F.col("n_words") - 1), 4)
            .alias("top_bigram_frac"),
        )
        .withColumn(
            "repetitive",
            (F.col("dup_bigram_frac") > _REP_FLAG_DUP_BIGRAM).cast("int"),
        )
        .orderBy("doc_id")
    )


DOC_REPETITION_ORACLE = f"""
WITH base AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_words,
         CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct_words,
         list_transform(
           generate_series(1, greatest(len(toks) - 1, 0)),
           i -> toks[i] || ' ' || toks[i+1]
         ) AS bigrams
  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
        FROM documents)
  WHERE len(toks) >= 2
)
SELECT doc_id, n_words,
       round(1 - n_distinct_words / n_words, 4) AS dup_word_frac,
       round(1 - len(list_distinct(bigrams)) / (n_words - 1), 4)
         AS dup_bigram_frac,
       round(CAST(list_max(list_transform(
               list_distinct(bigrams),
               b -> len(list_filter(bigrams, x -> x = b))
             )) AS BIGINT) / (n_words - 1), 4) AS top_bigram_frac,
       CAST(round(1 - len(list_distinct(bigrams)) / (n_words - 1), 4)
            > {_REP_FLAG_DUP_BIGRAM} AS INTEGER) AS repetitive
FROM base
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# Sequence packing: greedily pack documents into fixed token-budget
# sequences (the batching step of an LLM training pipeline). Documents are
# hash-sharded by (lang, doc_id % N_SHARDS); within each shard they are
# packed in doc_id order — first-fit-in-order, a document that would
# overflow the budget starts a new sequence (oversized docs get their own).
#
# Scale notes (100 TB): packing is inherently sequential WITHIN a
# sequence, so parallelism comes from sharding. The shard count is NOT a
# constant: it is DERIVED from the corpus size (ceil(n_docs / target),
# floored at a minimum) so the packing stage's parallelism grows with
# the data — a fixed count would bound the whole stage to a handful of
# Arrow tasks at 10^10 docs, with multi-GB groups. Each group carries
# only (doc_id, n_tokens) metadata, so the target keeps groups at
# ~16 MB of Arrow buffer. The derivation is a pure function of the
# TOTAL documents count — deterministic, partitioning-independent, and
# reproducible in the oracle as the same GREATEST/ceil expression over
# count(*) — and because the order inside a group is (doc_id), the
# assignment is fully deterministic regardless of cluster layout.
# applyInPandas streams groups through Arrow; no state, no driver
# collect (the count() that sizes the derivation is parquet metadata).
_PACK_CAPACITY = 128
_PACK_MIN_SHARDS = 4
_PACK_TARGET_DOCS_PER_SHARD = 1_000_000


def _pack_shards_for(n_docs: int) -> int:
    """ceil(n_docs / target), floored at _PACK_MIN_SHARDS."""
    return max(
        _PACK_MIN_SHARDS,
        -(-int(n_docs) // _PACK_TARGET_DOCS_PER_SHARD),
    )


# The same derivation as a DuckDB CTE (cross-join `ns` and use `ns.n`):
# `//` is DuckDB integer division, so this is the exact ceil the Python
# side computes — no float rounding to drift on.
_PACK_SHARDS_CTE = (
    f"ns AS (SELECT GREATEST({_PACK_MIN_SHARDS}, "
    f"(count(*) + {_PACK_TARGET_DOCS_PER_SHARD} - 1) // "
    f"{_PACK_TARGET_DOCS_PER_SHARD})::BIGINT AS n FROM documents)"
)


def _sized_docs(d: DataFrame, n_shards: int) -> DataFrame:
    """Project (lang, shard, doc_id, n_tokens) for the packer."""
    return d.select(
        "lang",
        (F.col("doc_id") % n_shards).cast("int").alias("shard"),
        "doc_id",
        F.size(tokens_col()).cast("long").alias("n_tokens"),
    )


def _apply_pack(sized: DataFrame) -> DataFrame:
    """First-fit-in-doc_id-order packing per (lang, shard) via Arrow."""

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        seq_ids, offsets = [], []
        seq, fill = 0, 0
        for i, tok in enumerate(pdf["n_tokens"]):
            if i > 0 and fill + tok > _PACK_CAPACITY:
                seq += 1
                fill = 0
            seq_ids.append(seq)
            offsets.append(fill)
            fill += tok
        pdf["seq_id"] = pd.Series(seq_ids, dtype="int64")
        pdf["seq_offset"] = pd.Series(offsets, dtype="int64")
        return pdf[["lang", "shard", "seq_id", "seq_offset",
                    "doc_id", "n_tokens"]]

    return sized.groupBy("lang", "shard").applyInPandas(
        pack,
        "lang string, shard int, seq_id long, seq_offset long, "
        "doc_id long, n_tokens long",
    )


def sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    n_shards = _pack_shards_for(d.count())
    return _apply_pack(_sized_docs(d, n_shards)).orderBy(
        "lang", "shard", "seq_id", "seq_offset", "doc_id"
    )


SEQUENCE_PACK_ORACLE = f"""
WITH RECURSIVE {_PACK_SHARDS_CTE},
ordered AS (
  SELECT lang,
         CAST(doc_id % ns.n AS INTEGER) AS shard,
         doc_id,
         CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
           AS n_tokens,
         row_number() OVER (
           PARTITION BY lang, doc_id % ns.n ORDER BY doc_id
         ) AS rn
  FROM documents, ns
),
packed AS (
  SELECT lang, shard, doc_id, n_tokens, rn,
         CAST(0 AS BIGINT) AS seq_id, CAST(0 AS BIGINT) AS seq_offset
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT o.lang, o.shard, o.doc_id, o.n_tokens, o.rn,
         CASE WHEN p.seq_offset + p.n_tokens + o.n_tokens > {_PACK_CAPACITY}
              THEN p.seq_id + 1 ELSE p.seq_id END,
         CASE WHEN p.seq_offset + p.n_tokens + o.n_tokens > {_PACK_CAPACITY}
              THEN CAST(0 AS BIGINT)
              ELSE p.seq_offset + p.n_tokens END
  FROM packed p
  JOIN ordered o ON o.lang = p.lang AND o.shard = p.shard
                AND o.rn = p.rn + 1
)
SELECT lang, shard, seq_id, seq_offset, doc_id, n_tokens
FROM packed
ORDER BY lang, shard, seq_id, seq_offset, doc_id
"""


# --------------------------------------------------------------------------
# Composite corpus filter: the keep/drop decision a C4/FineWeb-style
# cleaning pipeline ships, composing three signal families with a fixed
# priority — near-duplicate (df-capped jaccard pairs, drop the higher
# doc_id of each pair) > repetitive (dup-bigram fraction) > low quality
# (the doc_quality_scores formula). One row per document with every
# signal and the first-matching drop reason (NULL = kept).
#
# Scale notes (100 TB): the row-local signals (quality, repetition) are
# ONE narrow pass over the scan — no shuffle; the only exchanges are the
# bounded-fan-out candidate join inside capped_jaccard_pairs and the
# final doc_id equi-join of victims against the corpus (victims are not
# assumed broadcastable — near-dup rates of 30%+ are normal in web-scale
# corpora).
_FILTER_MIN_QUALITY = 0.7
_FILTER_MAX_DUP_BIGRAM = 0.1


def quality_signal_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-local per-doc quality signals: ONE narrow pass over the scan.

    Columns: doc_id, lang, h (md5 content hash, for exact-dedup stages),
    n_tokens, quality_score, dup_bigram_frac. Shared by the filter
    report / export manifest here and by curation.corpus_curation_funnel;
    the matching SQL fragment is QUALITY_SIG_SQL. Unused columns (e.g. h
    when the consumer never dedups) are pruned by Catalyst.
    """
    # Project tokens ONCE into a column (same lesson as dedup_ngram_jaccard):
    # downstream consumers filter on the keep/drop_reason CASE chain, and
    # Spark's codegen subexpression elimination does NOT reach inside
    # lazily-evaluated CaseWhen branches — with the raw split() expression
    # inlined, every element_at in the bigram lambda re-splits the text
    # (measured: a keep==1 filter over this report went 0.7 s -> 5 s at
    # sf0.1 before this projection).
    # r14: spread the single-row-group scan — the signal battery
    # (bigram transform per doc) otherwise runs single-task.
    return quality_signals_of(
        spread(table(spark, sf_dir, "documents"), "doc_id")
    )


def quality_signals_of(
    docs: DataFrame, keep: tuple[str, ...] = (), with_toks: bool = False
) -> DataFrame:
    """Frame-based core of quality_signal_frame: same signals over any
    (doc_id, text, lang) frame — batch table or micro-batch (the
    streaming curation funnel applies the IDENTICAL expressions, which
    is what makes its stage-1 counts hash-comparable to the batch
    funnel's). `keep` names extra input columns to carry through (the
    stream keeps text + event time). A keep column that is ALSO a base
    column (the funnel passes keep=('text', ...)) must not be selected
    twice in the intermediate frame — the double projection only
    resolves while both share one exprId, which aliasing or joins would
    break — so base columns are filtered out here and re-selected once
    at the end. `with_toks=True` appends the projected token array to
    the OUTPUT (the funnel's classifier stage explodes distinct terms
    off the same subtree instead of re-scanning and re-splitting the
    corpus; consumers that ignore it get it pruned by Catalyst)."""
    extras = [c for c in keep if c not in ("doc_id", "text", "lang")]
    d = docs.select(
        "doc_id", "text", "lang", tokens_col().alias("toks"), *extras
    )
    toks = F.col("toks")
    n_tokens = F.size(toks)
    stop = _marker_count(toks, ("the", "a", "of", "is", "and"))
    mean_word_len = F.length(F.regexp_replace("text", "\\s+", "")) / n_tokens
    quality = (
        F.when((n_tokens >= 20) & (n_tokens <= 1000), F.lit(0.4))
        .otherwise(F.lit(0.0))
        + F.when((stop / n_tokens >= 0.01) & (stop / n_tokens <= 0.5),
                 F.lit(0.3)).otherwise(F.lit(0.0))
        + F.when((mean_word_len >= 2.0) & (mean_word_len <= 12.0),
                 F.lit(0.3)).otherwise(F.lit(0.0))
    )
    bigrams = F.when(
        n_tokens >= 2,
        F.transform(
            F.sequence(F.lit(0), n_tokens - 2),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i + 1), F.element_at(toks, i + 2)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    dup_bigram = F.when(
        n_tokens >= 2,
        F.round(1 - F.size(F.array_distinct(bigrams)) / (n_tokens - 1), 4),
    ).otherwise(F.lit(0.0))
    return d.select(
        "doc_id",
        "lang",
        F.md5(F.col("text")).alias("h"),
        n_tokens.cast("long").alias("n_tokens"),
        F.round(quality, 1).alias("quality_score"),
        dup_bigram.alias("dup_bigram_frac"),
        *keep,
        *(["toks"] if with_toks else []),
    )


def _corpus_filter_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full per-doc signal frame shared by the report and the manifest.

    Carries lang + n_tokens through so downstream consumers (the export
    manifest) never re-scan or re-tokenize documents — the survivors'
    packing inputs fall straight out of this frame.
    """
    from .dedup import capped_jaccard_pairs

    sig = quality_signal_frame(spark, sf_dir).drop("h")
    victims = (
        capped_jaccard_pairs(spark, sf_dir)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
        .withColumn("near_dup", F.lit(1))
    )
    joined = sig.join(victims, "doc_id", "left").withColumn(
        "near_dup", F.coalesce(F.col("near_dup"), F.lit(0)).cast("int")
    )
    reason = (
        F.when(F.col("near_dup") == 1, F.lit("near_duplicate"))
        .when(F.col("dup_bigram_frac") > _FILTER_MAX_DUP_BIGRAM,
              F.lit("repetitive"))
        .when(F.col("quality_score") < _FILTER_MIN_QUALITY,
              F.lit("low_quality"))
    )
    return joined.withColumn("drop_reason", reason).withColumn(
        "keep", F.col("drop_reason").isNull().cast("int")
    )


def corpus_filter_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _corpus_filter_signals(spark, sf_dir)
        .select("doc_id", "quality_score", "dup_bigram_frac", "near_dup",
                "keep", "drop_reason")
        .orderBy("doc_id")
    )


# SQL twin of quality_signal_frame (same columns, same rounding) —
# composed into _corpus_filter_oracle here and into the curation-funnel
# oracle, so the signal definition cannot drift between consumers.
QUALITY_SIG_SQL = """
  SELECT doc_id, lang, h, n::BIGINT AS n_tokens,
         round(
           (CASE WHEN n BETWEEN 20 AND 1000 THEN 0.4 ELSE 0.0 END)
         + (CASE WHEN stop / n BETWEEN 0.01 AND 0.5 THEN 0.3 ELSE 0.0 END)
         + (CASE WHEN sq / n BETWEEN 2.0 AND 12.0 THEN 0.3 ELSE 0.0 END)
         , 1) AS quality_score,
         CASE WHEN n >= 2 THEN
           round(1 - len(list_distinct(list_transform(
             generate_series(1, greatest(len(toks) - 1, 0)),
             i -> toks[i] || ' ' || toks[i+1]))) / (n - 1), 4)
         ELSE 0.0 END AS dup_bigram_frac
  FROM (
    SELECT doc_id, lang, toks, md5(text) AS h, len(toks) AS n,
           len(list_filter(toks,
               t -> t IN ('the','a','of','is','and')))::DOUBLE AS stop,
           length(regexp_replace(text, '\\s+', '', 'g'))::DOUBLE AS sq
    FROM (SELECT doc_id, lang, text,
                 regexp_split_to_array(trim(text), '\\s+') AS toks
          FROM documents)
  )
"""


# Assembled here because it composes QUALITY_SIG_SQL (the classifier's
# silver labels are the stage-1 battery verdicts — the same sig CTE the
# funnel oracle shares, so the rule cannot drift between consumers).
_CLASSIFIER_SCORED_CTES = _CLASSIFIER_SCORED_CTES_TMPL.format(
    SIG=QUALITY_SIG_SQL,
    MINQ=_FILTER_MIN_QUALITY,
    MAXDB=_FILTER_MAX_DUP_BIGRAM,
)
QUALITY_CLASSIFIER_ORACLE = _QUALITY_CLASSIFIER_ORACLE_TMPL.format(
    CTES=_CLASSIFIER_SCORED_CTES
)
CLS_THRESHOLD_CURVE_ORACLE = _CLS_CURVE_ORACLE_TMPL.format(
    CTES=_CLASSIFIER_SCORED_CTES,
    THRESHOLDS=", ".join(str(t) for t in _CLS_THRESHOLDS),
)


def _corpus_filter_oracle() -> str:
    from .dedup import DEDUP_NGRAM_CAPPED_ORACLE

    return f"""
WITH pairs AS ({DEDUP_NGRAM_CAPPED_ORACLE}),
victims AS (SELECT DISTINCT doc_b AS doc_id FROM pairs),
sig AS ({QUALITY_SIG_SQL})
SELECT s.doc_id, s.quality_score, s.dup_bigram_frac,
       CASE WHEN v.doc_id IS NOT NULL THEN 1 ELSE 0 END AS near_dup,
       CASE WHEN v.doc_id IS NULL
                 AND NOT s.dup_bigram_frac > {_FILTER_MAX_DUP_BIGRAM}
                 AND NOT s.quality_score < {_FILTER_MIN_QUALITY}
            THEN 1 ELSE 0 END AS keep,
       CASE WHEN v.doc_id IS NOT NULL THEN 'near_duplicate'
            WHEN s.dup_bigram_frac > {_FILTER_MAX_DUP_BIGRAM}
              THEN 'repetitive'
            WHEN s.quality_score < {_FILTER_MIN_QUALITY}
              THEN 'low_quality'
       END AS drop_reason
FROM sig s LEFT JOIN victims v USING (doc_id)
ORDER BY s.doc_id
"""


# --------------------------------------------------------------------------
# Corpus export manifest: the END-TO-END shape of a pre-training data
# pipeline as ONE Catalyst plan — composite filter (near-dup > repetitive >
# low-quality) -> greedy sequence packing of the SURVIVORS -> per-(lang,
# shard) export manifest (sequences, docs, tokens, fill ratio). This is
# what a training job reads to schedule shard downloads.
#
# Composes corpus_filter_report and the shared _apply_pack; the oracle
# composes their oracles (filter CTE feeds the recursive pack CTE), so the
# manifest can never drift from the stages it summarizes. Scale shape =
# the union of its parts: narrow row-local signals, one bounded candidate
# join, one doc_id semi-join, Arrow packing per shard, tiny final agg.
# fill_ratio can exceed 1.0 when an oversized doc (> capacity) gets its
# own sequence — expected, the packer never splits documents.


def corpus_export_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Survivors carry (lang, n_tokens) straight out of the signal frame —
    # no second documents scan, semi-join, or re-tokenization (measured
    # ~0.9 s of the old plan's execution at sf0.1). The shard count
    # derives from the TOTAL documents count (metadata-only count job),
    # not the survivor count — same constant the oracle's ns CTE computes.
    n_shards = _pack_shards_for(table(spark, sf_dir, "documents").count())
    survivors = (
        _corpus_filter_signals(spark, sf_dir)
        .filter(F.col("keep") == 1)
        .select(
            "lang",
            (F.col("doc_id") % n_shards).cast("int").alias("shard"),
            "doc_id",
            "n_tokens",
        )
    )
    packed = _apply_pack(survivors)
    n_seqs = F.max("seq_id") + 1
    return (
        packed.groupBy("lang", "shard")
        .agg(
            n_seqs.alias("n_seqs"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.round(
                F.sum("n_tokens").cast("double")
                / ((F.max("seq_id") + 1) * _PACK_CAPACITY),
                4,
            ).alias("fill_ratio"),
        )
        .orderBy("lang", "shard")
    )


def _export_manifest_oracle() -> str:
    return f"""
WITH RECURSIVE filter_r AS ({_corpus_filter_oracle()}),
kept AS (SELECT doc_id FROM filter_r WHERE keep = 1),
{_PACK_SHARDS_CTE},
ordered AS (
  SELECT d.lang,
         CAST(d.doc_id % ns.n AS INTEGER) AS shard,
         d.doc_id,
         CAST(len(regexp_split_to_array(trim(d.text), '\\s+')) AS BIGINT)
           AS n_tokens,
         row_number() OVER (
           PARTITION BY d.lang, d.doc_id % ns.n ORDER BY d.doc_id
         ) AS rn
  FROM documents d JOIN kept k USING (doc_id), ns
),
packed AS (
  SELECT lang, shard, doc_id, n_tokens, rn,
         CAST(0 AS BIGINT) AS seq_id, CAST(0 AS BIGINT) AS seq_offset
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT o.lang, o.shard, o.doc_id, o.n_tokens, o.rn,
         CASE WHEN p.seq_offset + p.n_tokens + o.n_tokens > {_PACK_CAPACITY}
              THEN p.seq_id + 1 ELSE p.seq_id END,
         CASE WHEN p.seq_offset + p.n_tokens + o.n_tokens > {_PACK_CAPACITY}
              THEN CAST(0 AS BIGINT)
              ELSE p.seq_offset + p.n_tokens END
  FROM packed p
  JOIN ordered o ON o.lang = p.lang AND o.shard = p.shard
                AND o.rn = p.rn + 1
)
SELECT lang, shard,
       (max(seq_id) + 1)::BIGINT AS n_seqs,
       count(*)::BIGINT          AS n_docs,
       sum(n_tokens)::BIGINT     AS n_tokens,
       round(sum(n_tokens)::DOUBLE
             / ((max(seq_id) + 1) * {_PACK_CAPACITY}), 4) AS fill_ratio
FROM packed
GROUP BY lang, shard
ORDER BY lang, shard
"""


# --------------------------------------------------------------------------
# Data-mixture weights: temperature-based sampling weights per (lang,
# source) domain — the mC4/T5 recipe (alpha-scaled domain probabilities,
# p_g ∝ c_g^alpha) that balances a multilingual/multi-source corpus before
# training. alpha is fixed at 0.5 because x^0.5 == sqrt(x), and IEEE-754
# sqrt is CORRECTLY ROUNDED in both engines — a general pow(x, 0.3) is
# last-ulp unsafe cross-engine, same reason tfidf uses a rational idf
# surrogate (see functions/numeric.py). The denominator accumulates in
# DECIMAL per the repo numeric policy: group count (#langs x #sources) is
# tiny, so the unpartitioned window sum is a ~15-row frame — free at any
# corpus scale, because the heavy lifting (per-doc token counts) happened
# in the partial-aggregating groupBy below it.
#
# repeat_factor = p_g * total_tokens / c_g is the per-domain epoch
# multiplier a sampler applies (>1: upsample, <1: downsample).


def mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-sampled (alpha=0.5) domain mixture over (lang, source)."""
    docs = table(spark, sf_dir, "documents")
    by_domain = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tokens_col())).alias("n_tokens"),
    )
    w_all = Window.partitionBy()
    scaled = F.sqrt(F.col("n_tokens").cast("double"))
    weighted = by_domain.withColumn(
        "denom",
        F.sum(scaled.cast("decimal(25,15)")).over(w_all).cast("double"),
    ).withColumn("total_tokens", F.sum("n_tokens").over(w_all))
    p = scaled / F.col("denom")
    return weighted.select(
        "lang",
        "source",
        "n_docs",
        "n_tokens",
        F.round(p, 6).alias("weight"),
        F.round(
            p * F.col("total_tokens").cast("double") / F.col("n_tokens"), 4
        ).alias("repeat_factor"),
    ).orderBy("lang", "source")


MIXTURE_WEIGHTS_ORACLE = """
WITH by_domain AS (
  SELECT lang, source, count(*) AS n_docs,
         sum(len(regexp_split_to_array(trim(text), '\\s+')))::BIGINT
           AS n_tokens
  FROM documents GROUP BY lang, source
),
win AS (
  SELECT lang, source, n_docs, n_tokens,
         sum(sqrt(n_tokens::DOUBLE)::DECIMAL(25,15)) OVER ()::DOUBLE
           AS denom,
         sum(n_tokens) OVER ()::BIGINT AS total_tokens
  FROM by_domain
)
SELECT lang, source, n_docs, n_tokens,
       round(sqrt(n_tokens::DOUBLE) / denom, 6) AS weight,
       round(sqrt(n_tokens::DOUBLE) / denom * total_tokens::DOUBLE
             / n_tokens, 4) AS repeat_factor
FROM win ORDER BY lang, source
"""


# --------------------------------------------------------------------------
# TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank over the
# term co-occurrence graph — the graph-centrality member of the keyword
# family beside tf-idf's frequency statistics. Edges are adjacent-token
# pairs aggregated to (term, term, weight); the random-walk update
#     pr'(v) = 0.15 + 0.85 * sum_u w(u,v)/wdeg(u) * pr(u)
# runs _TR_ITERS unrolled iterations. Everything is rational: per-edge
# contributions are single IEEE ops, neighbor sums accumulate in DECIMAL
# (order-free), so both engines produce identical doubles at every
# iteration and the oracle (iterations unrolled as CTE stages — the
# kmeans precedent) hash-matches without tolerance.
#
# Scale notes (100 TB): the edge aggregate is one corpus pass onto
# VOCAB^2-bounded (a, b) keys (adjacency only — not all co-occurrence
# pairs); the edge table is localCheckpoint-ed once (it feeds every
# iteration — Spark 4.1 AQE would otherwise recompute the corpus pass
# per iteration) and each iteration is a vocab-scale join + aggregate.
# Top-k via orderBy+limit (TakeOrderedAndProject — no global window).
_TR_ITERS = 3
_TR_DAMP = 0.85
_TR_TOPK = 20


def term_textrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    toked = d.select(tokens_col().alias("toks"))
    pairs = toked.select(
        F.explode(
            F.when(
                F.size("toks") >= 2,
                F.zip_with(
                    F.slice("toks", 1, F.size("toks") - 1),
                    F.slice("toks", 2, F.size("toks") - 1),
                    lambda a, b: F.struct(a.alias("x"), b.alias("y")),
                ),
            ).otherwise(F.array().cast("array<struct<x:string,y:string>>"))
        ).alias("p")
    ).filter((F.col("p.x") != "") & (F.col("p.y") != ""))
    # undirected: materialize both directions, drop self-loops
    directed = pairs.select(
        F.col("p.x").alias("src"), F.col("p.y").alias("dst")
    ).unionByName(
        pairs.select(F.col("p.y").alias("src"), F.col("p.x").alias("dst"))
    ).filter(F.col("src") != F.col("dst"))
    edges = directed.groupBy("src", "dst").agg(
        F.count(F.lit(1)).alias("w")
    )
    wdeg = edges.groupBy("src").agg(F.sum("w").alias("wdeg"))
    edges = (
        edges.join(wdeg, "src")
        .select("src", "dst", "w", "wdeg")
        .localCheckpoint(eager=True)  # vocab^2-bounded; feeds every iter
    )
    pr = edges.select("src").distinct().select(
        F.col("src").alias("term"), F.lit(1.0).alias("pr")
    )
    for _ in range(_TR_ITERS):
        contrib = edges.join(
            pr, edges["src"] == pr["term"]
        ).select(
            F.col("dst"),
            (F.col("w") * F.col("pr") / F.col("wdeg")).alias("c"),
        )
        pr = contrib.groupBy("dst").agg(
            (
                F.lit(1 - _TR_DAMP)
                + F.lit(_TR_DAMP)
                * F.sum(F.col("c").cast("decimal(25,15)")).cast("double")
            ).alias("pr")
        ).select(F.col("dst").alias("term"), "pr")
    return (
        pr.select("term", F.round("pr", 6).alias("textrank"))
        .orderBy(F.desc("textrank"), F.asc("term"))
        .limit(_TR_TOPK)
    )


def _textrank_oracle() -> str:
    stages = []
    prev = "pr0"
    for t in range(1, _TR_ITERS + 1):
        stages.append(f"""
pr{t} AS (
  SELECT e.dst AS term,
         {1 - _TR_DAMP} + {_TR_DAMP} * sum(
           CAST(e.w * p.pr / e.wdeg AS DECIMAL(25,15))
         )::DOUBLE AS pr
  FROM edges e JOIN {prev} p ON p.term = e.src
  GROUP BY e.dst
)""")
        prev = f"pr{t}"
    return f"""
WITH toked AS (
  SELECT regexp_split_to_array(trim(text), '\\s+') AS toks FROM documents
),
directed AS (
  SELECT p[1] AS src, p[2] AS dst FROM (
    SELECT unnest(list_transform(
      generate_series(1, greatest(len(toks) - 1, 0)),
      i -> [toks[i], toks[i+1]]
    )) AS p FROM toked
  ) WHERE p[1] <> '' AND p[2] <> ''
  UNION ALL
  SELECT p[2] AS src, p[1] AS dst FROM (
    SELECT unnest(list_transform(
      generate_series(1, greatest(len(toks) - 1, 0)),
      i -> [toks[i], toks[i+1]]
    )) AS p FROM toked
  ) WHERE p[1] <> '' AND p[2] <> ''
),
edges AS (
  SELECT src, dst, count(*)::BIGINT AS w,
         sum(count(*)) OVER (PARTITION BY src)::BIGINT AS wdeg
  FROM directed WHERE src <> dst GROUP BY src, dst
),
pr0 AS (
  SELECT DISTINCT src AS term, 1.0::DOUBLE AS pr FROM edges
),{",".join(stages).lstrip(",")}
SELECT term, round(pr, 6) AS textrank
FROM pr{_TR_ITERS}
ORDER BY textrank DESC, term
LIMIT {_TR_TOPK}
"""


QUERIES = [
    QuerySpec("doc_token_stats", doc_token_stats, DOC_TOKEN_STATS_ORACLE,
              "token counting: whitespace + BPE-ish regex"),
    QuerySpec("doc_quality_scores", doc_quality_scores, DOC_QUALITY_ORACLE,
              "per-doc quality scoring"),
    QuerySpec("gopher_quality_flags", gopher_quality_flags,
              GOPHER_QUALITY_ORACLE,
              "the published Gopher (Rae et al. 2021) quality-filter "
              "rule battery: per-doc metrics + per-rule 0/1 flags + keep"),
    QuerySpec("c4_quality_flags", c4_quality_flags, C4_QUALITY_ORACLE,
              "the C4 (Raffel et al. 2020 §2.2) heuristic battery: "
              "kept-line fraction + sentence/lorem/brace doc gates"),
    QuerySpec("quality_classifier_distill", quality_classifier_distill,
              QUALITY_CLASSIFIER_ORACLE,
              "distilled quality classifier (the GPT-3/fastText "
              "production move): Bernoulli NB over distinct tokens, "
              "stage-1 battery verdicts as silver labels, ln-free rational "
              "likelihood-ratio scoring"),
    QuerySpec("classifier_threshold_curve", classifier_threshold_curve,
              CLS_THRESHOLD_CURVE_ORACLE,
              "classifier operating-point table: precision/recall/F1 + "
              "kept-doc/kept-token fractions per threshold over the NB "
              "score, against the stage-1 silver labels"),
    QuerySpec("boilerplate_line_scrub", boilerplate_line_scrub,
              BOILERPLATE_SCRUB_ORACLE,
              "RefinedWeb line-wise correction: corpus-frequent "
              "normalized lines scrubbed, order-preserving reassembly"),
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
    QuerySpec("term_textrank", term_textrank, _textrank_oracle(),
              "TextRank keyword centrality (unrolled PageRank over the "
              "term co-occurrence graph)"),
    QuerySpec("table_profile", table_profile, TABLE_PROFILE_ORACLE,
              "per-column null/distinct/min/max profiling (one agg pass)"),
    QuerySpec("benchmark_decontaminate", benchmark_decontaminate,
              BENCHMARK_DECON_ORACLE,
              "eval-set 5-gram decontamination via broadcast overlap join"),
    QuerySpec("doc_repetition_metrics", doc_repetition_metrics,
              DOC_REPETITION_ORACLE,
              "Gopher-style dup-word/dup-bigram/top-bigram fractions"),
    QuerySpec("sequence_pack", sequence_pack, SEQUENCE_PACK_ORACLE,
              "greedy token-budget sequence packing per (lang, shard)"),
    QuerySpec("corpus_filter_report", corpus_filter_report,
              _corpus_filter_oracle(),
              "composite keep/drop: near-dup > repetitive > low-quality"),
    QuerySpec("stratified_sample", stratified_sample,
              STRATIFIED_SAMPLE_ORACLE,
              "lang-balanced deterministic sampling with inverse weights"),
    QuerySpec("mixture_weights", mixture_weights, MIXTURE_WEIGHTS_ORACLE,
              "temperature (alpha=0.5) domain mixture weights per lang/source"),
    QuerySpec("corpus_export_manifest", corpus_export_manifest,
              _export_manifest_oracle(),
              "end-to-end: composite filter -> pack survivors -> manifest"),
]
