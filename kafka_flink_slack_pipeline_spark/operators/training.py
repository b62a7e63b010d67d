"""Training-data selection & tokenizer operators (round-4 north-star surface).

The reference pipeline (Producer/kafkaProducer.js, Consumer/kafkaConsumer.js)
moves documents; a production training-data pipeline must also *select* and
*tokenize* them. These four operators complete that story beyond the round-3
curation surface (SURVEY.md §2.11), each with a DuckDB oracle:

  - dsir_importance_weights: DSIR (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling") — hashed-ngram bag-of-words
    importance weights log p_target(x)/p_raw(x) against a target domain.
  - bpe_learn_merges: distributed BPE vocabulary learning (Sennrich et al.
    2016) — iterative most-frequent-pair merges over the corpus word-count
    table, the shape every production tokenizer trainer uses at scale.
  - doc_bigram_lm_score: CCNet-style LM quality filter — train an add-one
    bigram model on an in-domain slice, score every document by mean
    inverse conditional probability (rational, ln-free per repo policy).
  - embedding_random_projection: Johnson–Lindenstrauss sign-matrix
    projection 64→16 dims — the cheap dimensionality-reduction front-end
    for ANN sharding (the ±1 AMS/Achlioptas construction).

Scale design notes are per-operator below; the shared principles:
  - model state (bucket log-ratios, merge table, bigram counts, sign
    matrix) is O(model), never O(corpus) — collected/checkpointed once and
    re-entered as literals or broadcast joins (the kmeans/PQ-codebook
    precedent in operators/curation.py);
  - no Python in the hot path: every per-row computation is a JVM column
    expression; the only driver materializations are model-sized;
  - every corpus relation is scanned a bounded number of times per plan
    (Spark 4.1 AQE plans no ReusedExchange across branches — the round-4
    lesson baked into tools/plan_audit.py's _SCAN_BUDGET).
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..plans.registry import QuerySpec
from ..tables import spread, table
from .textops import tokens_col

# --------------------------------------------------------------------------
# DSIR importance weights.
#
# Public recipe (Xie et al. 2023): featurize each document as a bag of
# hashed word uni+bigrams in B buckets, fit multinomial bucket
# distributions p_target (in-domain slice; here lang='en') and p_raw (the
# full candidate pool), and weight each document by
#   log w(x) = sum_f count_f(x) * [log p_t(f) - log p_r(f)]
# with +0.5 Laplace smoothing. Docs with log w > 0 look more in-domain
# than raw and survive `keep`.
#
# Scale notes (100 TB): the model is O(B)=256 bucket counts — ONE
# conditional aggregation over the hashed-feature explosion, collected to
# the driver (bounded by B, not the corpus; the kmeans-centroid
# precedent), where the two ln() terms are computed once per bucket and
# rounded to 6 (cross-engine: driver libm vs DuckDB libm agree; rounding
# makes the literal exact). Scoring re-enters the model as a 256-double
# LITERAL array and folds each doc's features against it in-row — a
# ZERO-shuffle narrow map (no feature explode, no join, no groupBy).
# Corpus scanned twice total (fit pass, score pass), exactly the two
# passes the DSIR paper's fit-then-apply structure requires. The
# md5-prefix bucket hash is the repo's standard cross-engine hash
# (operators/dedup.py:223).
_DSIR_BUCKETS = 256
_DSIR_TARGET_LANG = "en"


def _hash_bucket(col: F.Column, buckets: int) -> F.Column:
    return F.conv(F.substring(F.md5(col), 1, 7), 16, 10).cast("long") % buckets


def _uni_bigrams(t: F.Column) -> F.Column:
    """Word unigrams ++ space-joined bigrams of a token-array column."""
    bigrams = F.transform(
        F.slice(F.sequence(F.lit(1), F.size(t)), 1, F.size(t) - 1),
        lambda i: F.concat_ws(
            " ", F.element_at(t, i), F.element_at(t, i + F.lit(1))
        ),
    )
    return F.concat(t, bigrams)


def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    # tokens projected ONCE before the higher-order lambdas (the
    # interdoc_span_dedup lesson: CSE does not reach inside lambda
    # functions, so an inlined split() re-splits the text per element_at —
    # measured 8.6 s -> ~1 s at sf0.1 for this query)
    toked = d.select(
        "doc_id",
        (F.col("lang") == _DSIR_TARGET_LANG).alias("is_t"),
        tokens_col().alias("t"),
    )
    feats = (
        toked.select(
            "doc_id",
            "is_t",
            F.explode(_uni_bigrams(F.col("t"))).alias("f"),
        )
        .filter(F.col("f") != "")
        .select(
            "doc_id", "is_t", _hash_bucket(F.col("f"), _DSIR_BUCKETS).alias("bucket")
        )
    )
    # Fit: one corpus pass -> O(B) rows on the driver (model state).
    model = (
        feats.groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("is_t"), 1).otherwise(0)).alias("ct"),
            F.count(F.lit(1)).alias("cr"),
        )
        .collect()
    )
    tt = float(sum(r.ct for r in model))
    tr = float(sum(r.cr for r in model))
    smooth = 0.5 * _DSIR_BUCKETS
    lr_by_bucket = [0.0] * _DSIR_BUCKETS  # unhit buckets can stay 0: every
    # scoring feature comes from the same corpus the model was fit on
    for r in model:
        lr_by_bucket[int(r.bucket)] = round(
            math.log((r.ct + 0.5) / (tt + smooth))
            - math.log((r.cr + 0.5) / (tr + smooth)),
            6,
        )
    # Apply: ZERO-shuffle narrow map — the 256 log-ratios enter as one
    # literal array and each doc folds its own features against it
    # (decimal accumulation = order-free, matching the oracle's GROUP BY
    # sum). At 100 TB this is the difference between a full (doc,feature)
    # explode shuffle and a map pipelined straight off the parquet scan.
    lr_arr = F.array(*[F.lit(v) for v in lr_by_bucket])
    fs = F.filter(_uni_bigrams(F.col("t")), lambda f: f != "")
    score = F.aggregate(
        F.transform(
            F.col("fs"),
            lambda f: F.element_at(
                lr_arr, (_hash_bucket(f, _DSIR_BUCKETS) + 1).cast("int")
            ),
        ),
        F.lit(0).cast("decimal(25,10)"),
        # decimal + widens precision by 1; cast back (same scale — exact,
        # the values are |lr| <= ~13 so precision 25 never overflows)
        lambda acc, x: (acc + x.cast("decimal(25,10)")).cast("decimal(25,10)"),
    )
    return (
        toked.withColumn("fs", fs)
        .select(
            "doc_id",
            F.size("fs").cast("long").alias("n_feats"),
            F.round(score.cast("double"), 6).alias("log_weight"),
        )
        .select(
            "doc_id",
            "n_feats",
            "log_weight",
            (F.col("log_weight") > 0).alias("keep"),
        )
        .orderBy("doc_id")
    )


DSIR_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, lang, regexp_split_to_array(trim(text), '\\s+') AS t
  FROM documents
),
feats AS (
  SELECT doc_id, lang, f FROM (
    SELECT doc_id, lang,
           unnest(list_concat(
             t, list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
           )) AS f
    FROM toks)
  WHERE f <> ''
),
fb AS (
  SELECT doc_id, lang,
         ('0x' || substr(md5(f), 1, 7))::BIGINT % {_DSIR_BUCKETS} AS bucket
  FROM feats
),
model AS (
  SELECT bucket,
         sum(CASE WHEN lang = '{_DSIR_TARGET_LANG}' THEN 1 ELSE 0 END) AS ct,
         count(*) AS cr
  FROM fb GROUP BY bucket
),
tot AS (SELECT sum(ct)::DOUBLE AS tt, sum(cr)::DOUBLE AS tr FROM model),
lr AS (
  SELECT bucket,
         round(ln((ct + 0.5) / (tt + 0.5 * {_DSIR_BUCKETS}))
             - ln((cr + 0.5) / (tr + 0.5 * {_DSIR_BUCKETS})), 6) AS lr
  FROM model, tot
),
scored AS (
  SELECT doc_id, count(*)::BIGINT AS n_feats,
         round(sum(lr::DECIMAL(25,10))::DOUBLE, 6) AS log_weight
  FROM fb JOIN lr USING (bucket)
  GROUP BY doc_id
)
SELECT doc_id, n_feats, log_weight, (log_weight > 0) AS keep
FROM scored ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# BPE merge learning.
#
# Sennrich et al. 2016: repeatedly merge the most frequent adjacent symbol
# pair. The scale split (what SentencePiece/HF trainers do): pair counting
# runs over the WORD-COUNT table (vocab-scale, weighted by word
# frequency), never the raw corpus — one corpus pass builds the word
# counts, and the merge loop is MODEL FITTING over that table, not a
# distributed query per merge.
#
# Symbol sequences ride as pipe-wrapped strings ('abc' -> '|a||b||c|'):
# applying merge (L,R) is then the literal replace '|L||R|' -> '|LR|',
# whose left-to-right non-overlapping semantics exactly matches the
# greedy BPE scan on BOTH engines ('|' never occurs in the corpus —
# asserted by the '(.)' wrap producing it only as separator), which is
# what makes the oracle an exact unrolled-CTE mirror. Ties break
# deterministically by (count DESC, left ASC, right ASC) — identical
# under Spark UTF8String byte order, DuckDB binary collation, and
# Python codepoint order (UTF-8 byte order preserves codepoints).
#
# TWO learners share that contract, split by where the merge loop runs:
#
#  - `_learn_merges` (the production path, used by the registered
#    queries): ONE distributed corpus pass builds the word-count table,
#    which is then COLLECTED — it is vocab-scale model input, not
#    corpus-scale data (web-scale whitespace vocab ~1e7-1e8 rows of
#    (short string, count); prune `HAVING count >= k` first if even
#    that is too fat, exactly as SentencePiece/HF trainers do) — and
#    the merge loop runs driver-side with INCREMENTAL pair-count deltas
#    (only words containing the chosen pair are rescanned). That is the
#    32k-merge regime: no per-merge cluster jobs, no 32k-deep lineage.
#  - `_learn_merges_distributed`: the fully-distributed loop kept for
#    the huge-vocab regime (vocab too large to collect). CEILING,
#    stated honestly: it launches one vocab-scale Spark job PER MERGE
#    and chains one literal `replace` of lineage per merge on the
#    checkpointed word table — fine for hundreds of merges, unusable at
#    32k (32k sequential jobs). An equivalence test pins it against
#    the driver-held learner merge-for-merge.
_BPE_MERGES = 64


def _bpe_pairs(words: DataFrame) -> DataFrame:
    """(w, c) word-count frame -> (l, r, cnt) adjacent-pair counts."""
    syms = F.split(F.expr("substring(w, 2, length(w) - 2)"), "\\|\\|")
    pair_idx = F.slice(F.sequence(F.lit(1), F.size(syms)), 1, F.size(syms) - 1)
    return (
        words.select(
            F.col("c"),
            F.col("w"),
            syms.alias("syms"),
        )
        .select(
            "c",
            F.explode(
                F.transform(
                    pair_idx,
                    lambda i: F.struct(
                        F.element_at(F.col("syms"), i).alias("l"),
                        F.element_at(F.col("syms"), i + F.lit(1)).alias("r"),
                    ),
                )
            ).alias("pr"),
        )
        .groupBy(F.col("pr.l").alias("l"), F.col("pr.r").alias("r"))
        .agg(F.sum("c").alias("cnt"))
    )


def _word_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one corpus pass: (word, count) — everything after is
    vocab-scale."""
    d = table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(tokens_col()).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def _learn_merges_local(
    word_counts: list[tuple[str, int]], n_merges: int
) -> list[tuple[int, str, str, str, int]]:
    """Driver-side BPE merge loop with incremental pair-count deltas.

    The classic algorithm (Sennrich 2016 reference impl / HF trainers):
    maintain pair -> weighted count and pair -> set of word ids
    containing it; each merge rescans ONLY the words that contain the
    chosen pair, so total work is O(total_symbols + merges * touched),
    which is what makes 32k merges tractable. The left-to-right
    non-overlapping symbol scan is exactly the '|L||R|' -> '|LR|'
    literal-replace semantics of the distributed variant and the
    unrolled-CTE oracle."""
    from collections import defaultdict

    words: list[list[str]] = [list(w) for w, _ in word_counts]
    counts: list[int] = [c for _, c in word_counts]
    pair_counts: dict[tuple[str, str], int] = defaultdict(int)
    pair_words: dict[tuple[str, str], set[int]] = defaultdict(set)
    for wi, syms in enumerate(words):
        c = counts[wi]
        for pr in zip(syms, syms[1:]):
            pair_counts[pr] += c
            pair_words[pr].add(wi)
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        live = {p: n for p, n in pair_counts.items() if n > 0}
        if not live:
            raise ValueError(
                f"corpus exhausted after {rank - 1} merges "
                f"(requested {n_merges})"
            )
        (left, right), cnt = min(
            live.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merged = left + right
        merges.append((rank, left, right, merged, cnt))
        for wi in sorted(pair_words[(left, right)]):
            syms, c = words[wi], counts[wi]
            for pr in zip(syms, syms[1:]):  # retract old contributions
                pair_counts[pr] -= c
                pair_words[pr].discard(wi)
            out: list[str] = []
            i = 0
            while i < len(syms):  # left-to-right non-overlapping scan
                if (
                    i + 1 < len(syms)
                    and syms[i] == left
                    and syms[i + 1] == right
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[wi] = out
            for pr in zip(out, out[1:]):  # add new contributions
                pair_counts[pr] += c
                pair_words[pr].add(wi)
    return merges


def _learn_merges(
    spark: SparkSession, sf_dir: str, n_merges: int = _BPE_MERGES
) -> list[tuple[int, str, str, str, int]]:
    """Production learner: one corpus pass -> vocab-scale collect ->
    driver-held incremental merge loop (see module comment for the
    regime split vs `_learn_merges_distributed`)."""
    rows = _word_counts(spark, sf_dir).orderBy("word").collect()
    return _learn_merges_local([(r.word, int(r.c)) for r in rows], n_merges)


def _learn_merges_distributed(
    spark: SparkSession, sf_dir: str, n_merges: int = _BPE_MERGES
) -> list[tuple[int, str, str, str, int]]:
    """Huge-vocab fallback: one vocab-scale Spark job per merge (ceiling
    documented in the module comment — hundreds of merges, not 32k)."""
    words = (
        _word_counts(spark, sf_dir)
        .select(F.regexp_replace("word", "(.)", "|$1|").alias("w"), "c")
        .localCheckpoint()  # vocab-scale; iterations never re-scan the corpus
    )
    merges: list[tuple[int, str, str, str, int]] = []
    cur = words
    for rank in range(1, n_merges + 1):
        best = (
            _bpe_pairs(cur)
            .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()[0]
        )
        merges.append((rank, best.l, best.r, best.l + best.r, int(best.cnt)))
        cur = cur.select(
            F.replace(
                F.col("w"),
                F.lit(f"|{best.l}||{best.r}|"),
                F.lit(f"|{best.l}{best.r}|"),
            ).alias("w"),
            "c",
        )
    return merges


def bpe_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.createDataFrame(
        _learn_merges(spark, sf_dir),
        "rank int, lhs string, rhs string, merged string, pair_count bigint",
    ).orderBy("rank")


def _bpe_stage_ctes() -> str:
    """Shared WITH-prefix: word counts + the unrolled merge stages.

    The stage CTEs are AS MATERIALIZED: each w_k references w_{k-1} and
    b_k several times, and DuckDB's default CTE inlining re-expands the
    whole chain per reference (~3^k copies of the corpus word-split —
    measured 41 s at sf0.01; materialized: <1 s). The Spark side gets
    the same guarantee from the words localCheckpoint.
    """
    parts = [
        """
WITH wc AS (
  SELECT word, count(*)::BIGINT AS c FROM (
    SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
    FROM documents)
  WHERE word <> '' GROUP BY word
),
w0 AS MATERIALIZED (
  SELECT regexp_replace(word, '(.)', '|\\1|', 'g') AS w, c FROM wc)"""
    ]
    for k in range(1, _BPE_MERGES + 1):
        p, b, wprev, wnext = f"p{k}", f"b{k}", f"w{k-1}", f"w{k}"
        parts.append(
            f""",
{p} AS (
  SELECT pr.l AS l, pr.r AS r, sum(c)::BIGINT AS cnt FROM (
    SELECT c, unnest(list_transform(range(1, len(syms)),
                     i -> {{'l': syms[i], 'r': syms[i+1]}})) AS pr
    FROM (SELECT string_split(substr(w, 2, length(w) - 2), '||') AS syms, c
          FROM {wprev}))
  GROUP BY 1, 2
),
{b} AS MATERIALIZED (SELECT l, r, cnt FROM {p} ORDER BY cnt DESC, l, r LIMIT 1),
{wnext} AS MATERIALIZED (
  SELECT replace(w,
                 '|' || (SELECT l FROM {b}) || '||' || (SELECT r FROM {b}) || '|',
                 '|' || (SELECT l || r FROM {b}) || '|') AS w, c
  FROM {wprev}
)"""
        )
    return "".join(parts)


def _bpe_oracle() -> str:
    union = "\nUNION ALL\n".join(
        f"SELECT {k}::INT AS rank, l AS lhs, r AS rhs, l || r AS merged, "
        f"cnt AS pair_count FROM b{k}"
        for k in range(1, _BPE_MERGES + 1)
    )
    return _bpe_stage_ctes() + f"\nSELECT * FROM (\n{union}\n) ORDER BY rank"


BPE_ORACLE = _bpe_oracle()


# --------------------------------------------------------------------------
# Bigram-LM quality score (CCNet's KenLM filter, re-expressed relationally).
#
# CCNet scores every crawled doc by the perplexity of an in-domain LM and
# keeps the low-perplexity head. Here the in-domain slice is lang='en';
# the model is an add-one-smoothed bigram table; the per-doc score is the
# MEAN INVERSE conditional probability (c1_prev + V) / (c2 + 1) — the
# rational, ln-free surrogate for perplexity (the repo numeric policy:
# doc_unigram_surprisal, bm25 idf), monotone in the same direction.
# OOV contexts/continuations fall back to counts of 0 (pure-smoothing
# mass). Docs shorter than 2 tokens have no bigrams and drop out.
#
# Scale notes (100 TB): the bigram model is vocab²-bounded — model-scale,
# not corpus-scale. It is localCheckpoint-ed once (kmeans-model
# precedent), because three consumers derive from it (score join, context
# totals, vocab size) and Spark 4.1 AQE would otherwise re-run the
# training scan per consumer. Scoring is ONE pass over the corpus with
# two broadcast model joins; context totals come from a window over the
# checkpointed model, never a second corpus scan. Corpus scanned twice
# total: train slice (lang pushdown to parquet), score pass.
_LM_TRAIN_LANG = "en"
_LM_KEEP_BELOW = 32.0


def _doc_bigrams(d: DataFrame) -> DataFrame:
    # tokens projected once — an inlined split() would re-split per
    # element_at inside the lambda (CSE does not reach into lambdas)
    t = F.col("t")
    pair_idx = F.slice(F.sequence(F.lit(1), F.size(t)), 1, F.size(t) - 1)
    return d.select("doc_id", tokens_col().alias("t")).select(
        "doc_id",
        F.explode(
            F.transform(
                pair_idx,
                lambda i: F.struct(
                    F.element_at(t, i).alias("prev"),
                    F.element_at(t, i + F.lit(1)).alias("cur"),
                ),
            )
        ).alias("pr"),
    ).select("doc_id", "pr.prev", "pr.cur")


def doc_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    train = d.filter(F.col("lang") == _LM_TRAIN_LANG)
    c2 = (
        _doc_bigrams(train)
        .groupBy("prev", "cur")
        .agg(F.count(F.lit(1)).alias("c2"))
        .localCheckpoint()  # model-scale; 3 consumers below
    )
    c1 = c2.groupBy("prev").agg(F.sum("c2").alias("c1"))
    voc = c2.select(
        F.explode(F.array("prev", "cur")).alias("s")
    ).agg(F.countDistinct("s").cast("double").alias("v"))
    inv_p = (
        (F.coalesce(F.col("c1"), F.lit(0)) + F.col("v"))
        / (F.coalesce(F.col("c2"), F.lit(0)) + 1)
    ).cast("double")
    # r14: the scoring pass's bigram explode spread off the single-
    # task scan (the c2/c1/voc model is frame-build state already).
    return (
        _doc_bigrams(spread(d, "doc_id"))
        .join(F.broadcast(c2), ["prev", "cur"], "left")
        .join(F.broadcast(c1), ["prev"], "left")
        .crossJoin(F.broadcast(voc))
        .select("doc_id", inv_p.alias("s"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.sum(F.col("s").cast("decimal(25,10)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_inv_prob"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "avg_inv_prob",
            (F.col("avg_inv_prob") < _LM_KEEP_BELOW).alias("keep"),
        )
        .orderBy("doc_id")
    )


BIGRAM_LM_ORACLE = f"""
WITH trb AS (
  SELECT t[i] AS prev, t[i+1] AS cur FROM (
    SELECT regexp_split_to_array(trim(text), '\\s+') AS t
    FROM documents WHERE lang = '{_LM_TRAIN_LANG}'), unnest(range(1, len(t))) AS u(i)
),
c2 AS (SELECT prev, cur, count(*)::BIGINT AS c2 FROM trb GROUP BY 1, 2),
c1 AS (SELECT prev, sum(c2)::BIGINT AS c1 FROM c2 GROUP BY 1),
voc AS (SELECT count(DISTINCT s)::DOUBLE AS v
        FROM (SELECT unnest([prev, cur]) AS s FROM c2)),
db AS (
  SELECT doc_id, t[i] AS prev, t[i+1] AS cur FROM (
    SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
    FROM documents), unnest(range(1, len(t))) AS u(i)
),
sc AS (
  SELECT doc_id,
         ((coalesce(c1.c1, 0) + v) / (coalesce(c2.c2, 0) + 1))::DOUBLE AS s
  FROM db LEFT JOIN c2 USING (prev, cur) LEFT JOIN c1 USING (prev), voc
),
agg AS (
  SELECT doc_id, count(*)::BIGINT AS n_bigrams,
         round(sum(s::DECIMAL(25,10))::DOUBLE / count(*), 6) AS avg_inv_prob
  FROM sc GROUP BY doc_id
)
SELECT doc_id, n_bigrams, avg_inv_prob,
       (avg_inv_prob < {_LM_KEEP_BELOW}) AS keep
FROM agg ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# Johnson–Lindenstrauss random projection 64 -> 16 dims.
#
# The Achlioptas ±1 sign-matrix construction: out_j = (1/sqrt(k)) *
# sum_i v_i * s_ij with s_ij in {±1} derived from md5("rp:i:j") parity —
# deterministic, regenerable on any engine, and 1/sqrt(16) = 1/4 exactly
# (no irrational scale factor to disagree on). The projection is the
# standard front-end for ANN at scale: 4x less memory bandwidth per
# distance computation, distances preserved to (1±eps).
#
# Scale notes (100 TB): the sign matrix is O(d*k) driver model state
# entering the plan as 16 literal arrays (the kmeans-centroid /
# LSH-hyperplane precedent); the operator itself is a NARROW map — zero
# shuffles, zero joins, pipelined straight from the parquet scan. Each
# output dim is a sequential double fold over zip_with(emb, signs);
# the oracle mirrors the same fold order with list_reduce, so the
# doubles match bit-for-bit before the final round(6).
_RP_IN_DIM = 64
_RP_OUT_DIM = 16


def _rp_sign(i: int, j: int) -> float:
    h = int(hashlib.md5(f"rp:{i}:{j}".encode()).hexdigest()[:7], 16)
    return 1.0 if h % 2 == 0 else -1.0


def embedding_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    cols = [F.col("vec_id")]
    for j in range(_RP_OUT_DIM):
        signs = F.array(
            *[F.lit(_rp_sign(i, j)) for i in range(_RP_IN_DIM)]
        )
        fold = F.aggregate(
            F.zip_with(F.col("embedding"), signs, lambda x, s: x.cast("double") * s),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        cols.append(F.round(fold / 4.0, 6).alias(f"p{j:02d}"))
    return e.select(*cols).orderBy("vec_id")


def _rp_oracle() -> str:
    outs = []
    for j in range(_RP_OUT_DIM):
        outs.append(
            f"round(list_reduce(list_transform(range(0, {_RP_IN_DIM}), "
            f"i -> embedding[i+1]::DOUBLE * (CASE WHEN "
            f"('0x' || substr(md5('rp:' || i || ':{j}'), 1, 7))::BIGINT % 2 = 0 "
            f"THEN 1.0 ELSE -1.0 END)), (a, b) -> a + b) / 4.0, 6) AS p{j:02d}"
        )
    return (
        "SELECT vec_id, " + ", ".join(outs) + " FROM embeddings ORDER BY vec_id"
    )


RP_ORACLE = _rp_oracle()


# --------------------------------------------------------------------------
# BPE tokenizer application: encode the corpus with the learned merges and
# report per-language compression (chars per emitted token) — the number a
# tokenizer team actually watches (fertility/compression), and the apply
# half of the BPE story (bpe_learn_merges is the fit half).
#
# Scale notes (100 TB): the merge table is O(merges) driver model state
# (learned eagerly at frame-build, the ANN index-build precedent);
# applying it is a chain of LITERAL string replaces over the (lang, word)
# count table — vocab-scale, not corpus-scale, exactly how production
# tokenizers amortize encoding (encode each distinct word once, weight by
# count). The executed plan scans the corpus ONCE (the lang-word agg);
# everything after is narrow vocab-scale work inside whole-stage codegen.
def bpe_apply_compression(spark: SparkSession, sf_dir: str) -> DataFrame:
    merges = _learn_merges(spark, sf_dir)
    d = table(spark, sf_dir, "documents")
    wl = (
        d.select("lang", F.explode(tokens_col()).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("lang", "word")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = F.regexp_replace("word", "(.)", "|$1|")
    for _, lhs, rhs, merged, _cnt in merges:
        w = F.replace(w, F.lit(f"|{lhs}||{rhs}|"), F.lit(f"|{merged}|"))
    n_syms = F.size(
        F.split(F.expr("substring(enc, 2, length(enc) - 2)"), "\\|\\|")
    )
    return (
        wl.withColumn("enc", w)
        .select(
            "lang",
            "c",
            F.length("word").alias("n_chars"),
            n_syms.alias("n_syms"),
        )
        .groupBy("lang")
        .agg(
            F.sum("c").alias("n_words"),
            F.sum(F.col("c") * F.col("n_chars")).alias("total_chars"),
            F.sum(F.col("c") * F.col("n_syms")).alias("total_tokens"),
            F.round(
                F.sum(F.col("c") * F.col("n_chars")).cast("double")
                / F.sum(F.col("c") * F.col("n_syms")),
                6,
            ).alias("chars_per_token"),
        )
        .orderBy("lang")
    )


def _bpe_apply_oracle() -> str:
    apply_ctes = [
        """,
wl AS (
  SELECT lang, word, count(*)::BIGINT AS c FROM (
    SELECT lang, unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
    FROM documents)
  WHERE word <> '' GROUP BY lang, word
),
a0 AS MATERIALIZED (
  SELECT lang, word, c, regexp_replace(word, '(.)', '|\\1|', 'g') AS enc
  FROM wl)"""
    ]
    for k in range(1, _BPE_MERGES + 1):
        b, aprev, anext = f"b{k}", f"a{k-1}", f"a{k}"
        apply_ctes.append(
            f""",
{anext} AS MATERIALIZED (
  SELECT lang, word, c,
         replace(enc,
                 '|' || (SELECT l FROM {b}) || '||' || (SELECT r FROM {b}) || '|',
                 '|' || (SELECT l || r FROM {b}) || '|') AS enc
  FROM {aprev}
)"""
        )
    final = f"""
SELECT lang, sum(c)::BIGINT AS n_words,
       sum(c * length(word))::BIGINT AS total_chars,
       sum(c * len(string_split(substr(enc, 2, length(enc) - 2), '||')))::BIGINT
         AS total_tokens,
       round(sum(c * length(word))::DOUBLE
             / sum(c * len(string_split(substr(enc, 2, length(enc) - 2), '||'))),
             6) AS chars_per_token
FROM a{_BPE_MERGES}
GROUP BY lang ORDER BY lang"""
    return _bpe_stage_ctes() + "".join(apply_ctes) + final


BPE_APPLY_ORACLE = _bpe_apply_oracle()


# --------------------------------------------------------------------------
# KMV (k-minimum-values) distinct-count sketch — the deterministic sketch
# representative (Bar-Yossef et al. 2002; the estimator behind
# Datasketches' ThetaSketch). Each distinct term maps to a uniform (0,1]
# via the repo's 28-bit md5 hash; the estimate from the K smallest hash
# values is (K-1) / h_(K). The report computes the sketch estimate AND
# the exact distinct count per language, with the relative error — the
# accuracy evidence a consumer needs before trusting the sketch at scale.
#
# Scale notes (100 TB): hash values are dyadic rationals (28-bit int /
# 2^28) so both engines compare and divide exactly. The plan is one
# distinct shuffle on (lang, term) followed by ONE window pass computing
# the rank and the per-lang exact count together (no second corpus
# branch). In production the exact column would be dropped and the
# min-K kept per partition by the partial TakeOrderedAndProject combine —
# the sketch exists precisely so the full distinct shuffle isn't needed;
# here the exact side IS the point (it grades the estimator).
_KMV_K = 16


def term_cardinality_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = table(spark, sf_dir, "documents")
    dt = (
        d.select("lang", F.explode(tokens_col()).alias("term"))
        .filter(F.col("term") != "")
        .select("lang", "term")
        .distinct()
        .withColumn(
            "h",
            F.conv(F.substring(F.md5("term"), 1, 7), 16, 10)
            .cast("double")
            / F.lit(float(1 << 28)),
        )
    )
    win = Window.partitionBy("lang")
    ranked = dt.select(
        "lang",
        "h",
        F.row_number().over(win.orderBy("h", "term")).alias("rn"),
        F.count(F.lit(1)).over(win).alias("nd"),
    )
    est = F.when(
        F.col("nd") <= _KMV_K, F.col("nd").cast("double")
    ).otherwise((_KMV_K - 1) / F.col("h"))
    return (
        ranked.filter(F.col("rn") == F.least(F.lit(_KMV_K), F.col("nd")))
        .select(
            "lang",
            F.col("nd").alias("n_distinct_exact"),
            F.lit(_KMV_K).alias("kmv_k"),
            F.round(est, 6).alias("kmv_estimate"),
            F.round(
                F.abs(est - F.col("nd")) / F.col("nd"), 6
            ).alias("rel_error"),
        )
        .orderBy("lang")
    )


KMV_ORACLE = f"""
WITH dt AS (
  SELECT DISTINCT lang, term FROM (
    SELECT lang, unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
    FROM documents)
  WHERE term <> ''
),
h AS (
  SELECT lang, term,
         ('0x' || substr(md5(term), 1, 7))::BIGINT / {float(1 << 28)} AS h
  FROM dt
),
ranked AS (
  SELECT lang, h,
         row_number() OVER (PARTITION BY lang ORDER BY h, term) AS rn,
         count(*) OVER (PARTITION BY lang) AS nd
  FROM h
),
est AS (
  SELECT lang, nd,
         CASE WHEN nd <= {_KMV_K} THEN nd::DOUBLE
              ELSE ({_KMV_K} - 1) / h END AS e
  FROM ranked
  WHERE rn = least({_KMV_K}, nd)
)
SELECT lang, nd::BIGINT AS n_distinct_exact, {_KMV_K} AS kmv_k,
       round(e, 6) AS kmv_estimate,
       round(abs(e - nd) / nd, 6) AS rel_error
FROM est ORDER BY lang
"""


# --------------------------------------------------------------------------
# Bloom-filter membership sketch (Bloom 1970; the pre-join/pre-lookup
# filter every large pipeline ships — Spark itself injects runtime bloom
# filters for join pruning). m=_BLOOM_M bits, k=_BLOOM_K md5-seeded
# universal hashes over the corpus' distinct terms; the report probes a
# deterministic mix of PRESENT terms (28-bit term hash ≡ 0 mod
# _BLOOM_PROBE_MOD) and _BLOOM_ABSENT ABSENT synthetic terms, recording
# ground truth next to the sketch's answer — the no-false-negative
# guarantee and the measured false-positive rate are the two numbers a
# consumer needs before trusting the filter at scale. m is sized DOWN
# to the test vocabulary so the false-positive phenomenon is MEASURABLE
# — the CMS visible-overestimate precedent; a production filter sizes
# m at ~10 bits per expected key (the 1%-FPR point) and the math is
# identical.
#
# Cross-engine exactness: bit positions are ((A_i*h + B_i) mod P) mod m
# over the 28-bit md5 term hash (pure int64; A_i < 2^28 keeps products
# < 2^59 — the _minhash_coeffs policy). A probe hits iff ALL k of its
# positions are set, counted through an equi-join against the bit
# table.
#
# 100 TB shape: O(m)=_BLOOM_M-row state at any corpus size (the definition
# of a sketch); building it is one distinct-term pass + a bounded
# explode; probes join BROADCAST against the bit table. In production
# the bit table compiles to a bitmask pushed into scans; here the
# table form keeps the oracle exact.
_BLOOM_M = 128
_BLOOM_K = 4
_BLOOM_P = (1 << 31) - 1
_BLOOM_PROBE_MOD = 3
_BLOOM_ABSENT = 50


def _bloom_coeffs() -> list[tuple[int, int]]:
    import hashlib

    out = []
    for i in range(_BLOOM_K):
        a = int(hashlib.md5(f"bloom:a:{i}".encode()).hexdigest()[:7], 16)
        b = int(hashlib.md5(f"bloom:b:{i}".encode()).hexdigest()[:7], 16)
        out.append((a % (_BLOOM_P - 1) + 1, b % _BLOOM_P))
    return out


def bloom_membership_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    h28 = F.conv(F.substring(F.md5("term"), 1, 7), 16, 10).cast("long")
    positions = F.array(
        *[
            ((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(_BLOOM_P))
            % F.lit(_BLOOM_M)
            for a, b in _bloom_coeffs()
        ]
    )
    d = table(spark, sf_dir, "documents")
    # vocab-scale, bounded state; THREE consumers (bit build, present
    # probes, ground-truth join) — checkpoint so the corpus scans once
    # (the vocab_typo_pairs shared-consumer pattern)
    terms = (
        d.select(F.explode(tokens_col()).alias("term"))
        .filter(F.col("term") != "")
        .distinct()
        .withColumn("h", h28)
        .localCheckpoint(eager=False)
    )
    bits = (
        terms.select(F.explode(positions).alias("pos")).distinct()
    )
    present_probes = terms.filter(
        F.col("h") % _BLOOM_PROBE_MOD == 0
    ).select("term")
    absent_probes = spark.range(_BLOOM_ABSENT).select(
        F.concat(F.lit("zzabsent"), F.col("id").cast("string")).alias("term")
    )
    probes = (
        present_probes.unionByName(absent_probes)
        .withColumn("h", h28)
        # ground truth computed, not assumed: a synthetic probe that
        # happened to exist in the corpus would be labeled present
        .join(
            terms.select(F.col("term"), F.lit(1).alias("present")),
            ["term"],
            "left",
        )
        .withColumn("present", F.coalesce(F.col("present"), F.lit(0)))
    )
    hits = (
        probes.select("term", "present", F.explode(positions).alias("pos"))
        .join(F.broadcast(bits.withColumn("set", F.lit(1))), "pos", "left")
        .groupBy("term", "present")
        .agg(F.sum(F.coalesce(F.col("set"), F.lit(0))).alias("n_set"))
    )
    return (
        hits.select(
            "term",
            "present",
            (F.col("n_set") == _BLOOM_K).cast("int").alias("bloom_hit"),
        )
        .orderBy("term")
    )


def _bloom_oracle() -> str:
    pos_exprs = ", ".join(
        f"(({a} * h + {b}) % {_BLOOM_P}) % {_BLOOM_M}"
        for a, b in _bloom_coeffs()
    )
    return f"""
WITH terms AS (
  SELECT term, ('0x' || substr(md5(term), 1, 7))::BIGINT AS h FROM (
    SELECT DISTINCT unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
    FROM documents)
  WHERE term <> ''
),
bits AS (
  SELECT DISTINCT unnest([{pos_exprs}]) AS pos FROM terms
),
probes0 AS (
  SELECT term FROM terms WHERE h % {_BLOOM_PROBE_MOD} = 0
  UNION ALL
  SELECT 'zzabsent' || i::VARCHAR FROM range({_BLOOM_ABSENT}) t(i)
),
probes AS (
  SELECT p.term,
         ('0x' || substr(md5(p.term), 1, 7))::BIGINT AS h,
         CASE WHEN t.term IS NOT NULL THEN 1 ELSE 0 END AS present
  FROM probes0 p LEFT JOIN terms t ON t.term = p.term
),
hits AS (
  SELECT term, present,
         sum(CASE WHEN b.pos IS NOT NULL THEN 1 ELSE 0 END) AS n_set
  FROM (SELECT term, present, unnest([{pos_exprs}]) AS pos FROM probes) pp
  LEFT JOIN bits b USING (pos)
  GROUP BY term, present
)
SELECT term, present,
       CASE WHEN n_set = {_BLOOM_K} THEN 1 ELSE 0 END AS bloom_hit
FROM hits ORDER BY term
"""


BLOOM_ORACLE = _bloom_oracle()


# --------------------------------------------------------------------------
# Sliding-window token chunking — context-window preparation for
# retrieval/embedding pipelines (the RAG complement to sequence_pack's
# training-sequence packing): fixed-size token windows with overlap so no
# span longer than the stride is ever split across chunk boundaries
# without also appearing whole in some chunk.
#
# Chunk starts are 0, STRIDE, 2*STRIDE, ... while start < n_tokens; the
# final chunk is allowed to be short (simple deterministic rule, stated
# here so the oracle mirrors it exactly). Scale notes (100 TB): a narrow
# explode with bounded ~n/STRIDE amplification, pipelined from the scan —
# no shuffle but the result sort. Tokens are projected once before the
# lambdas (the module rule).
_CHUNK_TOKENS = 64
_CHUNK_STRIDE = 48


def doc_chunk_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    t = F.col("t")
    # stepped sequence stops at the last multiple of STRIDE <= n-1, i.e.
    # exactly the chunk starts < n
    starts = F.sequence(F.lit(0), F.size(t) - 1, F.lit(_CHUNK_STRIDE))
    return (
        d.select("doc_id", tokens_col().alias("t"))
        .select(
            "doc_id",
            F.posexplode(
                F.transform(
                    starts,
                    lambda s: F.slice(t, s + 1, _CHUNK_TOKENS),
                )
            ).alias("chunk_id", "chunk_toks"),
        )
        .select(
            "doc_id",
            "chunk_id",
            F.size("chunk_toks").cast("long").alias("n_tokens"),
            F.concat_ws(" ", "chunk_toks").alias("chunk_text"),
        )
        .orderBy("doc_id", "chunk_id")
    )


CHUNK_SLIDING_ORACLE = f"""
WITH toked AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
  FROM documents
),
chunks AS (
  SELECT doc_id, i AS chunk_id,
         t[i * {_CHUNK_STRIDE} + 1 : i * {_CHUNK_STRIDE} + {_CHUNK_TOKENS}]
           AS chunk_toks
  FROM toked,
       unnest(range(0, 1 + (len(t) - 1) // {_CHUNK_STRIDE})) AS u(i)
)
SELECT doc_id, chunk_id::INT AS chunk_id,
       len(chunk_toks)::BIGINT AS n_tokens,
       array_to_string(chunk_toks, ' ') AS chunk_text
FROM chunks
ORDER BY doc_id, chunk_id
"""


# --------------------------------------------------------------------------
# CountMin-sketch heavy hitters — the frequency-estimation sketch
# (Cormode & Muthukrishnan 2005) beside KMV's cardinality sketch. D=4
# hash rows x W=64 counters; a term's estimate is the MIN over its D
# cells, which can only OVERestimate (every cell adds nonnegative
# collision mass) — the report shows exact vs estimate for the top-10
# terms so the overestimate is visible and the property is testable.
#
# All arithmetic is integer — cross-engine exact, no rounding needed.
#
# Scale notes (100 TB): the sketch cells aggregate from the VOCAB-scale
# term-count table, not the raw token stream (sum of term counts per
# (row, bucket) ≡ streaming increments, but one shuffle smaller); the
# term-count table is localCheckpoint-ed because two consumers derive
# from it (cells + top-k) and Spark 4.1 AQE would otherwise rerun the
# corpus scan per consumer. The sketch itself is O(D*W)=256 counters —
# the point of a sketch: at any corpus size the memory is constant.
_CMS_D = 4
_CMS_W = 64
_CMS_TOPK = 10


def term_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    tc = (
        d.select(F.explode(tokens_col()).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint()  # vocab-scale; 2 consumers below
    )

    def _bucket(r: int) -> F.Column:
        return _hash_bucket(F.concat(F.lit(f"cms:{r}:"), F.col("term")), _CMS_W)

    cells = (
        tc.select(
            "c",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(r).alias("r"), _bucket(r).alias("b")
                        )
                        for r in range(_CMS_D)
                    ]
                )
            ).alias("rb"),
        )
        .groupBy(F.col("rb.r").alias("r"), F.col("rb.b").alias("b"))
        .agg(F.sum("c").alias("cell"))
    )
    top = tc.orderBy(F.desc("c"), F.asc("term")).limit(_CMS_TOPK)
    probes = top.select(
        "term",
        F.col("c").alias("exact_count"),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(r).alias("r"), _bucket(r).alias("b"))
                    for r in range(_CMS_D)
                ]
            )
        ).alias("rb"),
    ).select("term", "exact_count", "rb.r", "rb.b")
    return (
        probes.join(F.broadcast(cells), ["r", "b"])
        .groupBy("term", "exact_count")
        .agg(F.min("cell").alias("cms_estimate"))
        .select(
            "term",
            "exact_count",
            "cms_estimate",
            (F.col("cms_estimate") - F.col("exact_count")).alias("overestimate"),
        )
        .orderBy(F.desc("exact_count"), F.asc("term"))
    )


CMS_ORACLE = f"""
WITH tc AS (
  SELECT term, count(*)::BIGINT AS c FROM (
    SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
    FROM documents)
  WHERE term <> '' GROUP BY term
),
cells AS (
  SELECT r, ('0x' || substr(md5('cms:' || r || ':' || term), 1, 7))::BIGINT
             % {_CMS_W} AS b,
         sum(c)::BIGINT AS cell
  FROM tc, unnest(range(0, {_CMS_D})) AS u(r)
  GROUP BY 1, 2
),
top AS (SELECT term, c FROM tc ORDER BY c DESC, term LIMIT {_CMS_TOPK}),
probes AS (
  SELECT term, c AS exact_count, r,
         ('0x' || substr(md5('cms:' || r || ':' || term), 1, 7))::BIGINT
           % {_CMS_W} AS b
  FROM top, unnest(range(0, {_CMS_D})) AS u(r)
)
SELECT term, exact_count, min(cell)::BIGINT AS cms_estimate,
       (min(cell) - exact_count)::BIGINT AS overestimate
FROM probes JOIN cells USING (r, b)
GROUP BY term, exact_count
ORDER BY exact_count DESC, term
"""


# --------------------------------------------------------------------------
# Mergeable histogram quantile sketch — the third member of the sketch
# family (KMV = cardinality, CountMin = frequency, this = quantiles; the
# trio a corpus-profiling service actually ships). Equi-width histograms
# are the simplest MERGEABLE quantile summary: per-partition bin counts
# add, so the sketch state is _QH_BINS integers at any corpus size —
# the same telescoping CountMin's counters rely on. Estimates use the
# classic within-bin linear interpolation; the report shows estimate vs
# exact rank-value so the approximation error is visible (like the KMV
# and CMS reports).
#
# Determinism: bin width (mx-mn+1)/32 is a division by a power of two —
# exact in binary — and every other quantity is an integer until the
# final single-rounded interpolation, so both engines produce identical
# doubles. Exact quantile = value at rank ceil(p*N) (the discrete
# lower-value definition, stated here so the oracle mirrors it).
#
# Scale notes (100 TB): one narrow pass to per-length counts (groupBy on
# n_tokens — bounded by the max document length, vocab-scale), then ONE
# single-row collect_list aggregate over that bounded frame; all bin
# math, cumulative scans, and per-p searches are in-row array folds on
# the one-row frame (no windows, no joins, no second corpus pass). The
# oracle uses plain relational windows — same math, different physical
# strategy (the chunker/recursive-CTE precedent).
_QH_BINS = 32
_QH_PS = (0.25, 0.5, 0.75, 0.9, 0.99)


def token_quantile_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").select(
        F.size(tokens_col()).cast("long").alias("n")
    )
    vals = d.groupBy("n").agg(F.count(F.lit(1)).alias("c"))
    one = vals.agg(
        F.sort_array(F.collect_list(F.struct("n", "c"))).alias("vc")
    )
    vc = F.col("vc")
    zero_l = F.lit(0).cast("long")
    base = one.select(
        "vc",
        vc[0]["n"].alias("mn"),
        F.element_at(vc, -1)["n"].alias("mx"),
        F.aggregate(vc, zero_l, lambda a, x: a + x["c"]).alias("nn"),
    ).select(
        "vc",
        "mn",
        "nn",
        ((F.col("mx") - F.col("mn") + 1) / F.lit(float(_QH_BINS))).alias(
            "width"
        ),
        # per-bucket counts: O(BINS * |vals|) in-row work on ONE row
        F.transform(
            F.sequence(F.lit(0), F.lit(_QH_BINS - 1)),
            lambda b: F.aggregate(
                F.col("vc"),
                zero_l,
                lambda a, x: a
                + F.when(
                    F.least(
                        F.lit(_QH_BINS - 1).cast("long"),
                        F.floor(
                            ((x["n"] - F.col("mn")) * _QH_BINS)
                            / (F.col("mx") - F.col("mn") + 1)
                        ),
                    )
                    == b.cast("long"),
                    x["c"],
                ).otherwise(zero_l),
            ),
        ).alias("bc"),
    )

    def _per_p(p: float):
        r = F.ceil(F.lit(p) * F.col("nn")).cast("long")
        # first bucket whose cumulative count reaches rank r
        chosen = F.aggregate(
            F.sequence(F.lit(0), F.lit(_QH_BINS - 1)),
            F.struct(
                zero_l.alias("cum"),
                F.lit(-1).cast("long").alias("b"),
                zero_l.alias("cumb"),
                zero_l.alias("cb"),
            ),
            lambda acc, b: F.struct(
                (acc["cum"] + F.element_at(F.col("bc"), b + 1)).alias("cum"),
                F.when(
                    (acc["b"] == -1)
                    & (acc["cum"] + F.element_at(F.col("bc"), b + 1) >= r),
                    b.cast("long"),
                )
                .otherwise(acc["b"])
                .alias("b"),
                F.when(
                    (acc["b"] == -1)
                    & (acc["cum"] + F.element_at(F.col("bc"), b + 1) >= r),
                    acc["cum"],
                )
                .otherwise(acc["cumb"])
                .alias("cumb"),
                F.when(
                    (acc["b"] == -1)
                    & (acc["cum"] + F.element_at(F.col("bc"), b + 1) >= r),
                    F.element_at(F.col("bc"), b + 1),
                )
                .otherwise(acc["cb"])
                .alias("cb"),
            ),
        )
        exact = F.aggregate(
            F.col("vc"),
            F.struct(zero_l.alias("cum"), F.lit(-1).cast("long").alias("q")),
            lambda acc, x: F.struct(
                (acc["cum"] + x["c"]).alias("cum"),
                F.when(
                    (acc["q"] == -1) & (acc["cum"] + x["c"] >= r), x["n"]
                )
                .otherwise(acc["q"])
                .alias("q"),
            ),
        )["q"]
        est = F.round(
            F.col("mn")
            + chosen["b"] * F.col("width")
            + F.col("width") * (r - chosen["cumb"]) / chosen["cb"],
            6,
        )
        return F.struct(
            F.lit(p).alias("p"),
            est.alias("est_q"),
            exact.alias("exact_q"),
            F.round(F.abs(est - exact) / exact, 6).alias("rel_err"),
        )

    rows = F.explode(F.array(*[_per_p(p) for p in _QH_PS]))
    return base.select(rows.alias("r")).select("r.*").orderBy("p")


QH_ORACLE = f"""
WITH vals AS (
  SELECT n, count(*)::BIGINT AS c FROM (
    SELECT len(regexp_split_to_array(trim(text), '\\s+'))::BIGINT AS n
    FROM documents)
  GROUP BY n
),
stats AS (
  SELECT min(n) AS mn, max(n) AS mx, sum(c)::BIGINT AS nn,
         (max(n) - min(n) + 1) / {float(_QH_BINS)} AS width
  FROM vals
),
binned AS (
  SELECT least({_QH_BINS - 1},
               floor(((n - mn) * {_QH_BINS}) / (mx - mn + 1)))::BIGINT AS b,
         c
  FROM vals, stats
),
hist AS (
  SELECT b, sum(c)::BIGINT AS cb,
         sum(sum(c)) OVER (ORDER BY b)::BIGINT AS cum,
         coalesce(sum(sum(c)) OVER (
           ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0)::BIGINT AS cumb
  FROM binned GROUP BY b
),
vcum AS (
  SELECT n, sum(c) OVER (ORDER BY n)::BIGINT AS cum FROM vals
),
pr AS (
  SELECT p, ceil(p * (SELECT nn FROM stats))::BIGINT AS r
  FROM (SELECT unnest([{", ".join(f"{p}::DOUBLE" for p in _QH_PS)}]) AS p)
),
chosen AS (
  SELECT pr.p, pr.r, min(hist.b) AS b
  FROM pr JOIN hist ON hist.cum >= pr.r GROUP BY pr.p, pr.r
),
est AS (
  SELECT c.p, c.r,
         round(s.mn + c.b * s.width
               + s.width * (c.r - h.cumb) / h.cb, 6) AS est_q
  FROM chosen c JOIN hist h ON h.b = c.b, stats s
),
exact AS (
  SELECT pr.p, min(vcum.n) AS exact_q
  FROM pr JOIN vcum ON vcum.cum >= pr.r GROUP BY pr.p
)
SELECT e.p, e.est_q, x.exact_q,
       round(abs(e.est_q - x.exact_q) / x.exact_q, 6) AS rel_err
FROM est e JOIN exact x ON x.p = e.p
ORDER BY e.p
"""


# --------------------------------------------------------------------------
# Temperature-based mixture resampling (the mT5/XLM-R alpha-sampling
# rule): upsample low-resource languages by sampling language l with
# probability proportional to p_l^alpha instead of p_l. mixture_weights
# (textops) REPORTS the target mixture; this op APPLIES it — the
# deterministic "sampler" every reproducible data pipeline actually
# ships (hash-rank selection, not RNG).
#
# alpha is fixed at 0.5 so the power is sqrt — correctly rounded in
# IEEE-754, hence identical in both engines (the repo's
# transcendental-free policy: pow(x, 0.3) has no such guarantee).
# The sqrt-share denominator accumulates in DECIMAL; per-lang targets
# are floor(q_l * budget) on identical doubles. Selection ranks docs
# within each language by md5(doc_id) — a deterministic pseudo-random
# permutation both engines agree on byte-for-byte.
#
# Scale notes (100 TB): language counts are a bounded aggregate (driver
# model state would also be fine, but the 1-row-per-lang frame
# broadcasts); selection is one per-lang window over a hash column —
# equi-partitioned, no global ordering anywhere.
_RESAMPLE_BUDGET = 200


def temperature_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").select("doc_id", "lang")
    # lang-scale (|langs| rows); feeds total/shares/denom/targets — four
    # consumers that would each recompute the corpus count under Spark
    # 4.1 AQE (caught by plan_audit: 5 document scans -> 1)
    counts = (
        d.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    total = counts.agg(F.sum("n").alias("nn"))
    shares = counts.crossJoin(F.broadcast(total)).select(
        "lang",
        "n",
        F.sqrt(F.col("n") / F.col("nn")).alias("s"),
    )
    denom = shares.agg(
        F.sum(F.col("s").cast("decimal(25,15)"))
        .cast("double")
        .alias("z")
    )
    targets = shares.crossJoin(F.broadcast(denom)).select(
        "lang",
        "n",
        F.floor(F.col("s") / F.col("z") * _RESAMPLE_BUDGET)
        .cast("long")
        .alias("target"),
    )
    ranked = d.select(
        "doc_id",
        "lang",
        F.row_number()
        .over(
            Window.partitionBy("lang").orderBy(
                F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
            )
        )
        .alias("pick_rank"),
    )
    return (
        ranked.join(F.broadcast(targets), "lang")
        .filter(F.col("pick_rank") <= F.col("target"))
        .select("lang", "pick_rank", "doc_id", "target", "n")
        .orderBy("lang", "pick_rank")
    )


TEMPERATURE_RESAMPLE_ORACLE = f"""
WITH counts AS (
  SELECT lang, count(*)::BIGINT AS n FROM documents GROUP BY lang
),
total AS (SELECT sum(n)::BIGINT AS nn FROM counts),
shares AS (
  SELECT lang, n, sqrt(n / nn) AS s FROM counts, total
),
denom AS (
  SELECT sum(CAST(s AS DECIMAL(25,15)))::DOUBLE AS z FROM shares
),
targets AS (
  SELECT lang, n,
         floor(s / z * {_RESAMPLE_BUDGET})::BIGINT AS target
  FROM shares, denom
),
ranked AS (
  SELECT doc_id, lang,
         row_number() OVER (
           PARTITION BY lang ORDER BY md5(doc_id::VARCHAR), doc_id
         ) AS pick_rank
  FROM documents
)
SELECT r.lang, r.pick_rank, r.doc_id, t.target, t.n
FROM ranked r JOIN targets t USING (lang)
WHERE r.pick_rank <= t.target
ORDER BY r.lang, r.pick_rank
"""


# --------------------------------------------------------------------------
# Unigram-LM tokenizer (Kudo 2018, "Subword Regularization"; the
# SentencePiece `--model_type=unigram` trainer) — the second production
# tokenizer family beside BPE (r5 verdict item 4): Llama/T5-lineage
# pipelines train unigram, not BPE. The public algorithm: seed a large
# candidate vocabulary from corpus substrings, then alternate
#   E-step: Viterbi-segment every word under the current piece
#           log-probabilities,
#   M-step: re-estimate piece probabilities from the segmentation
#           counts and PRUNE the lowest-value pieces (single characters
#           are never pruned — they guarantee every word segments).
#
# Determinism / cross-engine policy (how an EM full of logs and argmaxes
# earns an exact DuckDB hash):
#   - piece scores are INTEGER MICRO log-probs: round(ln(p), 6) * 1e6 as
#     BIGINT, with p = (count + 1) / (total + |vocab|) (Laplace, so
#     never-chosen pieces stay finite). round-6 makes driver libm and
#     DuckDB libm agree (the DSIR precedent), and the micro scaling
#     makes every Viterbi sum EXACT INTEGER arithmetic — no float adds
#     anywhere in the DP, on either engine.
#   - Viterbi ties break to the SHORTEST last piece: the Spark/Python
#     side scans k ascending keeping strict improvements; the SQL side
#     takes list_max over {v, -k} structs (max v, then max -k = min k).
#   - pruning ranks multi-char pieces by (count DESC, piece ASC); all
#     single-char pieces survive unconditionally.
#
# The scale split mirrors bpe_learn_merges exactly: ONE corpus pass
# builds the word-count table (vocab-scale model input), the EM loop is
# driver-side model fitting over it (SentencePiece's own structure), and
# the APPLY pass re-enters the learned vocabulary as an O(vocab) literal
# map inside a JVM in-row Viterbi fold — a zero-shuffle narrow map over
# the (lang, word) count table, corpus scanned once. The DuckDB oracle
# unrolls each EM iteration as recursive-CTE Viterbi stages (forward DP,
# then a walk-back recursion — DuckDB 1.0's list_reduce mangles struct
# accumulators, so both passes are recursions) — the bpe_learn_merges
# unrolled-stage trick applied to dynamic programming.
_UG_MAX_PIECE = 4     # max piece length (chars); bounds the DP window
_UG_SEED_MULTI = 32   # multi-char seed candidates (top by count, piece)
_UG_KEEP = (24, 16)   # multi-char keep sizes after EM iterations 1, 2
_UG_MISS = -(10**15)  # micro-score sentinel for out-of-vocab pieces


def _ug_score_micro(cnt: int, total: int, v: int) -> int:
    """round(ln((cnt+1)/(total+v)), 6) in exact integer micros."""
    return int(round(round(math.log((cnt + 1) / (total + v)), 6) * 1e6))


def _ug_viterbi(word: str, scores: dict[str, int]) -> list[str]:
    """Max-score segmentation under integer micro scores; ties at each
    position break to the shortest last piece (k ascending, strict >).
    Returned pieces are in WALK-BACK order (last piece first) — the SQL
    walk recursion emits the same order; counts are order-free."""
    n = len(word)
    best = [0] + [None] * n
    bp = [0] * (n + 1)
    for i in range(1, n + 1):
        bv = None
        for k in range(1, min(_UG_MAX_PIECE, i) + 1):
            sc = scores.get(word[i - k : i], _UG_MISS)
            cand = best[i - k] + sc
            if bv is None or cand > bv:
                bv, bp[i] = cand, k
        best[i] = bv
    pcs: list[str] = []
    pos = n
    while pos > 0:
        k = bp[pos]
        pcs.append(word[pos - k : pos])
        pos -= k
    return pcs


def _unigram_em(
    word_counts: list[tuple[str, int]]
) -> list[tuple[str, int, int, float]]:
    """Seed + EM + prune over the collected word-count table (driver
    model fitting, the _learn_merges_local precedent). Returns the final
    vocabulary as (piece, is_char, seg_count, score) rows where score is
    the final M-step round-6 log-prob."""
    from collections import Counter

    subs: Counter[str] = Counter()
    for w, c in word_counts:
        for length in range(1, _UG_MAX_PIECE + 1):
            for s in range(0, len(w) - length + 1):
                subs[w[s : s + length]] += c
    chars = sorted(p for p in subs if len(p) == 1)
    multi = sorted(
        (p for p in subs if len(p) > 1), key=lambda p: (-subs[p], p)
    )[:_UG_SEED_MULTI]
    vocab = {p: subs[p] for p in chars + multi}
    total, v = sum(vocab.values()), len(vocab)
    scores = {p: _ug_score_micro(c, total, v) for p, c in vocab.items()}
    for keep in _UG_KEEP:
        cnts: Counter[str] = Counter()
        for w, c in word_counts:  # E-step
            for p in _ug_viterbi(w, scores):
                cnts[p] += c
        cur_chars = sorted(p for p in scores if len(p) == 1)
        kept_multi = sorted(
            (p for p in scores if len(p) > 1),
            key=lambda p: (-cnts.get(p, 0), p),
        )[:keep]
        vocab = {p: cnts.get(p, 0) for p in cur_chars + kept_multi}
        total, v = sum(vocab.values()), len(vocab)  # M-step
        scores = {p: _ug_score_micro(c, total, v) for p, c in vocab.items()}
    return [
        (p, int(len(p) == 1), cnt, round(math.log((cnt + 1) / (total + v)), 6))
        for p, cnt in sorted(vocab.items())
    ]


def _unigram_model(
    spark: SparkSession, sf_dir: str
) -> list[tuple[str, int, int, float]]:
    rows = _word_counts(spark, sf_dir).orderBy("word").collect()
    return _unigram_em([(r.word, int(r.c)) for r in rows])


def unigram_learn_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.createDataFrame(
        _unigram_model(spark, sf_dir),
        "piece string, is_char int, seg_count bigint, score double",
    ).orderBy("piece")


def _ug_stage_ctes() -> str:
    """Shared WITH RECURSIVE prefix: word counts -> substring seed ->
    unrolled EM stages (forward-Viterbi recursion + walk-back recursion
    + count/prune/rescore per iteration). m{j} tables hold integer
    micro scores so every DP addition is exact on both engines."""
    parts = [
        f"""
WITH RECURSIVE wc AS (
  SELECT word, count(*)::BIGINT AS c FROM (
    SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
    FROM documents)
  WHERE word <> '' GROUP BY word
),
scnt AS (
  SELECT substr(word, s, l) AS piece, sum(c)::BIGINT AS cnt
  FROM wc,
       unnest(range(1, {_UG_MAX_PIECE} + 1)) AS L(l),
       unnest(range(1, length(word) - l + 2)) AS S(s)
  GROUP BY piece
),
seed AS MATERIALIZED (
  SELECT piece, cnt FROM (
    SELECT piece, cnt, (length(piece) = 1) AS is_char,
           row_number() OVER (PARTITION BY (length(piece) = 1)
                              ORDER BY cnt DESC, piece) AS rk
    FROM scnt)
  WHERE is_char OR rk <= {_UG_SEED_MULTI}
),
tv0 AS (SELECT sum(cnt)::BIGINT AS t, count(*)::BIGINT AS v FROM seed),
m0 AS MATERIALIZED (
  SELECT piece,
         CAST(round(ln((cnt + 1.0) / (t + v)), 6) * 1000000 AS BIGINT)
           AS sc
  FROM seed, tv0)"""
    ]
    for j, keep in enumerate(_UG_KEEP, start=1):
        prev = f"m{j-1}"
        parts.append(
            f""",
vit{j} AS (
  SELECT word, c, 0 AS i, [CAST(0 AS BIGINT)] AS best, []::INT[] AS bp,
         (SELECT map(list(piece), list(sc)) FROM {prev}) AS mp
  FROM wc
  UNION ALL
  SELECT word, c, i + 1,
         list_append(best, cand['v']),
         list_append(bp, (-cand['negk'])::INT),
         mp
  FROM (
    SELECT *, list_max(list_transform(
        range(1, least({_UG_MAX_PIECE}, i + 1) + 1),
        k -> {{'v': best[i - k + 2]
                 + coalesce(mp[substr(word, i - k + 2, k)][1]::BIGINT,
                            {_UG_MISS}),
              'negk': -k}})) AS cand
    FROM vit{j} WHERE i < length(word))
),
walk{j} AS (
  SELECT word, c, bp, length(word) AS pos, []::VARCHAR[] AS pcs
  FROM vit{j} WHERE i = length(word)
  UNION ALL
  SELECT word, c, bp, pos - bp[pos],
         list_append(pcs, substr(word, pos - bp[pos] + 1, bp[pos]))
  FROM walk{j} WHERE pos > 0
),
cnt{j} AS MATERIALIZED (
  SELECT piece, sum(c)::BIGINT AS cnt
  FROM (SELECT c, pcs FROM walk{j} WHERE pos = 0), unnest(pcs) AS t(piece)
  GROUP BY piece
),
keep{j} AS MATERIALIZED (
  SELECT piece, cnt FROM (
    SELECT v.piece, coalesce(cn.cnt, 0)::BIGINT AS cnt,
           (length(v.piece) = 1) AS is_char,
           row_number() OVER (PARTITION BY (length(v.piece) = 1)
                              ORDER BY coalesce(cn.cnt, 0) DESC, v.piece)
             AS rk
    FROM (SELECT piece FROM {prev}) v LEFT JOIN cnt{j} cn USING (piece))
  WHERE is_char OR rk <= {keep}
),
tv{j} AS (SELECT sum(cnt)::BIGINT AS t, count(*)::BIGINT AS v
          FROM keep{j}),
m{j} AS MATERIALIZED (
  SELECT piece,
         CAST(round(ln((cnt + 1.0) / (t + v)), 6) * 1000000 AS BIGINT)
           AS sc
  FROM keep{j}, tv{j}
)"""
        )
    return "".join(parts)


_UG_LAST = len(_UG_KEEP)

UNIGRAM_LEARN_ORACLE = _ug_stage_ctes() + f"""
SELECT piece, (length(piece) = 1)::INT AS is_char, cnt AS seg_count,
       round(ln((cnt + 1.0) / (t + v)), 6) AS score
FROM keep{_UG_LAST}, tv{_UG_LAST}
ORDER BY piece
"""


def unigram_apply_compression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode the corpus with the learned unigram vocabulary and report
    per-language compression (chars per emitted token) — the apply half,
    mirroring bpe_apply_compression. The learned scores enter as an
    O(vocab) literal map; token counts come from an in-row JVM Viterbi
    fold (integer micro arithmetic, array-of-bests accumulator — the
    token_quantile_histogram fold pattern), so the executed plan is one
    corpus scan into a vocab-scale groupBy and a narrow map: zero Python,
    zero extra shuffles."""
    model = _unigram_model(spark, sf_dir)
    # rebuild the final micro scores exactly as the learner held them
    total = sum(cnt for _, _, cnt, _ in model)
    v = len(model)
    micro = {p: _ug_score_micro(cnt, total, v) for p, _, cnt, _ in model}
    lit_map = F.create_map(
        *[x for p, s in sorted(micro.items()) for x in (F.lit(p), F.lit(s))]
    )
    d = table(spark, sf_dir, "documents")
    wl = (
        d.select("lang", F.explode(tokens_col()).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("lang", "word")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    word = F.col("word")
    zero_b = F.lit(0).cast("bigint")

    def step(acc, i):
        cands = []
        for k in range(1, _UG_MAX_PIECE + 1):
            piece = word.substr(i - F.lit(k) + 1, F.lit(k))
            val = F.element_at(acc["best"], (i - k + 1).cast("int")) + (
                F.coalesce(
                    F.try_element_at(lit_map, piece).cast("bigint"),
                    F.lit(_UG_MISS).cast("bigint"),
                )
            )
            nt = F.element_at(acc["nt"], (i - k + 1).cast("int")) + 1
            cands.append(
                F.when(
                    F.lit(k) <= i,
                    F.struct(
                        val.alias("v"),
                        F.lit(-k).alias("negk"),
                        nt.alias("nt"),
                    ),
                ).otherwise(
                    F.struct(
                        F.lit(2 * _UG_MISS).cast("bigint").alias("v"),
                        F.lit(-(_UG_MAX_PIECE + 1)).alias("negk"),
                        F.lit(0).cast("bigint").alias("nt"),
                    )
                )
            )
        best = F.array_max(F.array(*cands))
        return F.struct(
            F.concat(acc["best"], F.array(best["v"])).alias("best"),
            F.concat(acc["nt"], F.array(best["nt"])).alias("nt"),
        )

    folded = F.aggregate(
        F.sequence(F.lit(1), F.length(word)),
        F.struct(
            F.array(zero_b).alias("best"),
            F.array(zero_b).alias("nt"),
        ),
        step,
    )
    return (
        wl.withColumn("nt", F.element_at(folded["nt"], -1))
        .groupBy("lang")
        .agg(
            F.sum("c").alias("n_words"),
            F.sum(F.col("c") * F.length("word")).alias("total_chars"),
            F.sum(F.col("c") * F.col("nt")).alias("total_tokens"),
            F.round(
                F.sum(F.col("c") * F.length("word")).cast("double")
                / F.sum(F.col("c") * F.col("nt")),
                6,
            ).alias("chars_per_token"),
        )
        .orderBy("lang")
    )


UNIGRAM_APPLY_ORACLE = _ug_stage_ctes() + f""",
wla AS (
  SELECT lang, word, count(*)::BIGINT AS c FROM (
    SELECT lang, unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
    FROM documents)
  WHERE word <> '' GROUP BY lang, word
),
vita AS (
  SELECT lang, word, c, 0 AS i, [CAST(0 AS BIGINT)] AS best, []::INT[] AS bp,
         (SELECT map(list(piece), list(sc)) FROM m{_UG_LAST}) AS mp
  FROM wla
  UNION ALL
  SELECT lang, word, c, i + 1,
         list_append(best, cand['v']),
         list_append(bp, (-cand['negk'])::INT),
         mp
  FROM (
    SELECT *, list_max(list_transform(
        range(1, least({_UG_MAX_PIECE}, i + 1) + 1),
        k -> {{'v': best[i - k + 2]
                 + coalesce(mp[substr(word, i - k + 2, k)][1]::BIGINT,
                            {_UG_MISS}),
              'negk': -k}})) AS cand
    FROM vita WHERE i < length(word))
),
walka AS (
  SELECT lang, word, c, bp, length(word) AS pos, 0::BIGINT AS nt
  FROM vita WHERE i = length(word)
  UNION ALL
  SELECT lang, word, c, bp, pos - bp[pos], nt + 1
  FROM walka WHERE pos > 0
)
SELECT lang, sum(c)::BIGINT AS n_words,
       sum(c * length(word))::BIGINT AS total_chars,
       sum(c * nt)::BIGINT AS total_tokens,
       round(sum(c * length(word))::DOUBLE / sum(c * nt), 6)
         AS chars_per_token
FROM walka WHERE pos = 0
GROUP BY lang ORDER BY lang
"""


QUERIES = [
    QuerySpec("dsir_importance_weights", dsir_importance_weights, DSIR_ORACLE,
              "DSIR hashed-ngram importance weights vs target domain"),
    QuerySpec("bpe_learn_merges", bpe_learn_merges, BPE_ORACLE,
              "distributed BPE merge learning (vocab-scale iterations)"),
    QuerySpec("doc_bigram_lm_score", doc_bigram_lm_score, BIGRAM_LM_ORACLE,
              "CCNet-style bigram-LM quality score (rational, ln-free)"),
    QuerySpec("embedding_random_projection", embedding_random_projection,
              RP_ORACLE,
              "Johnson-Lindenstrauss ±1 projection 64->16 (narrow map)"),
    QuerySpec("bpe_apply_compression", bpe_apply_compression,
              BPE_APPLY_ORACLE,
              "encode corpus with learned BPE merges; per-lang compression"),
    QuerySpec("term_cardinality_kmv", term_cardinality_kmv, KMV_ORACLE,
              "KMV distinct-count sketch vs exact, per language"),
    QuerySpec("bloom_membership_report", bloom_membership_report,
              BLOOM_ORACLE,
              "Bloom-filter membership sketch (m=128, k=4): probe set "
              "with ground truth — no false negatives + measured FPR"),
    QuerySpec("doc_chunk_sliding", doc_chunk_sliding, CHUNK_SLIDING_ORACLE,
              "sliding token-window chunking with overlap (RAG prep)"),
    QuerySpec("term_heavy_hitters_cms", term_heavy_hitters_cms, CMS_ORACLE,
              "CountMin-sketch top-k frequency estimates vs exact"),
    QuerySpec("token_quantile_histogram", token_quantile_histogram,
              QH_ORACLE,
              "mergeable equi-width-histogram quantile sketch vs exact"),
    QuerySpec("temperature_resample", temperature_resample,
              TEMPERATURE_RESAMPLE_ORACLE,
              "mT5-style alpha-sampling mixture application (sqrt "
              "temperature, deterministic hash-rank selection)"),
    QuerySpec("unigram_learn_vocab", unigram_learn_vocab,
              UNIGRAM_LEARN_ORACLE,
              "unigram-LM tokenizer EM (SentencePiece-style: substring "
              "seed -> Viterbi E-step -> prune/rescore M-step), integer "
              "micro log-probs vs unrolled recursive-CTE oracle"),
    QuerySpec("unigram_apply_compression", unigram_apply_compression,
              UNIGRAM_APPLY_ORACLE,
              "encode corpus with the learned unigram vocab (JVM in-row "
              "Viterbi fold); per-lang compression"),
]
