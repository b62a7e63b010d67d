"""Corpus-curation operators (round-3 north-star surface).

Training-data-pipeline operators that complete the curation story the
brief mandates beyond the reference's own surface (the reference —
Producer/kafkaProducer.js, Consumer/kafkaConsumer.js — has no corpus ops
at all; these extend SURVEY.md §2.11):

  - interdoc_span_dedup: C4/RefinedWeb-style inter-document
    duplicated-span measurement — the span-level complement to the
    doc-level pair dedup in operators/dedup.py.
  - token_budget_select / global_shuffle_shard: budget-prefix selection
    and the deterministic data-loader shuffle, both via two-phase
    bucketed global positions.
  - decontaminate_fuzzy: paraphrase-robust eval decontamination by
    3-gram containment (the exact-5-gram pass misses every perturbed
    bench item; this recovers all sources).
  - doc_unigram_surprisal: the LM-quality signal, ln-free.
  - embedding_quantize_int8 / bm25_keyword_search: int8 embedding
    compression and lexical top-k retrieval.
  - kmeans_lloyd_clusters: iterative Lloyd's — driver-held O(k*d) model,
    the one rows-only (non-SQL-expressible) member here.

All but k-means are pure DataFrame plans (no Python in the hot path)
with DuckDB oracles. The rank-style operators (budget select, global
shuffle) deliberately avoid the naive single-partition global window:
they compute global positions with the two-phase bucket pattern (tiny
bucket-offset aggregate broadcast back, then a per-bucket window), the
shape that survives 100 TB — an unpartitioned `Window.orderBy` would
funnel the whole corpus through one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..plans.registry import QuerySpec
from ..tables import spread, table
from .textops import tokens_col

# --------------------------------------------------------------------------
# Inter-document span dedup (C4-style): for each document, how much of it
# is built from word-3-gram spans that also occur in OTHER documents. C4's
# cleaning famously removed any three-sentence span occurring more than
# once in the corpus; on the synthetic corpus (short word-salad docs) the
# analogous unit is the word-3-gram. A doc whose shared-span fraction
# exceeds the threshold is a scrub candidate (mostly-boilerplate).
#
# Scale notes (100 TB): two shuffles on `span` (distinct doc-span pairs,
# then span -> n_docs) and one on doc_id — all equi-key, no fan-out joins:
# the span->doc join re-attaches ONE df number per (doc, span) row, never
# pairs docs with each other (contrast the k² blowup a pairwise design
# would hit on stop-spans). In production the span string would be
# xxhash64-ed to a fixed-width key before the shuffle (kept as text here
# so the DuckDB oracle is byte-identical).
_SPAN_N = 3
_SPAN_SCRUB_FRAC = 0.5


def interdoc_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import _word_shingles

    d = table(spark, sf_dir, "documents")
    # One pipeline, three equi-key shuffles, and the span explosion is
    # computed exactly once: dedup pairs via groupBy(span, doc_id), attach
    # the span's doc-frequency with a window over span (NOT an agg +
    # self-join — Spark 4.1 plans the self-join's two branches as two
    # separate explosions with no ReusedExchange; measured 8.0 s -> ~2 s
    # at sf0.1), then aggregate per doc.
    # tokens projected ONCE (dedup_ngram_jaccard's lesson): with the raw
    # split() inlined, every element_at inside the shingle lambda
    # re-splits the text — O(tokens^2) per doc, measured 7.4 s of the
    # 8 s at sf0.1.
    toked = d.select("doc_id", tokens_col().alias("toks"))
    pairs = (
        toked.select(
            "doc_id",
            F.explode(_word_shingles(F.col("toks"), _SPAN_N)).alias("span"),
        )
        .filter(F.col("span") != "")
        .groupBy("span", "doc_id")
        .agg(F.lit(1).alias("_one"))
    )
    with_df = pairs.withColumn(
        "span_docs", F.count(F.lit(1)).over(Window.partitionBy("span"))
    )
    per_doc = with_df.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum((F.col("span_docs") >= 2).cast("long")).alias(
            "n_shared_spans"
        ),
    )
    shared_frac = F.round(
        F.col("n_shared_spans") / F.col("n_spans"), 4
    )
    return per_doc.select(
        "doc_id",
        "n_spans",
        "n_shared_spans",
        shared_frac.alias("shared_span_frac"),
        (F.col("n_shared_spans") / F.col("n_spans") > _SPAN_SCRUB_FRAC)
        .cast("int")
        .alias("scrub"),
    ).orderBy("doc_id")


INTERDOC_SPAN_ORACLE = f"""
WITH spans AS (
  SELECT DISTINCT doc_id, span FROM (
    SELECT doc_id,
           unnest(list_transform(
             generate_series(1, greatest(len(toks) - {_SPAN_N - 1}, 0)),
             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
           )) AS span
    FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
          FROM documents))
  WHERE span <> ''
),
df AS (SELECT span, count(*) AS span_docs FROM spans GROUP BY span)
SELECT doc_id,
       count(*)::BIGINT AS n_spans,
       sum(CASE WHEN span_docs >= 2 THEN 1 ELSE 0 END)::BIGINT
         AS n_shared_spans,
       round(sum(CASE WHEN span_docs >= 2 THEN 1 ELSE 0 END)::DOUBLE
             / count(*), 4) AS shared_span_frac,
       (sum(CASE WHEN span_docs >= 2 THEN 1 ELSE 0 END)::DOUBLE
        / count(*) > {_SPAN_SCRUB_FRAC})::INTEGER AS scrub
FROM spans JOIN df USING (span)
GROUP BY doc_id
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# Maximal duplicated-run detection — the substring-dedup unit of Lee et
# al. 2022 ("Deduplicating Training Data Makes Language Models Better"),
# which removes MAXIMAL repeated substrings rather than counting fixed
# spans (interdoc_span_dedup's measurement). A position is "duplicated"
# when its word-5-gram also occurs in ANOTHER document; overlapping or
# adjacent duplicated 5-grams merge into one run (gaps-and-islands over
# the position sequence), and the report gives each doc's run count,
# duplicated-token total, longest run, and duplicated fraction — the
# inputs a scrubber needs to cut the runs out.
#
# Scale notes (100 TB): the span explosion happens ONCE; the cross-doc
# test is min(doc_id)!=max(doc_id) via a window over span — a window,
# not an agg + self-join (the module's r3 lesson), and crucially not a
# COUNT(DISTINCT) window, which neither engine supports over a
# partition. Everything after the span shuffle is windows and aggregates
# partitioned by doc_id — equi-key shuffles only, no fan-out joins.
_RUN_N = 5


def interdoc_dup_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    toked = d.select("doc_id", tokens_col().alias("toks"))
    spanpos = toked.select(
        "doc_id",
        F.size("toks").alias("n_toks"),
        F.posexplode(_word_shingles_keep_pos(F.col("toks"), _RUN_N)).alias(
            "p", "span"
        ),
    )
    w_span = Window.partitionBy("span")
    dup = (
        spanpos.withColumn("mn", F.min("doc_id").over(w_span))
        .withColumn("mx", F.max("doc_id").over(w_span))
        .filter(F.col("mn") != F.col("mx"))
    )
    w_doc = Window.partitionBy("doc_id").orderBy("p")
    w_run = Window.partitionBy("doc_id").orderBy("p").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    islands = dup.withColumn(
        "brk",
        (
            F.col("p") - F.lag("p", 1, -(_RUN_N + 1)).over(w_doc) > _RUN_N
        ).cast("long"),
    ).withColumn("run_id", F.sum("brk").over(w_run))
    runs = islands.groupBy("doc_id", "n_toks", "run_id").agg(
        (F.max("p") - F.min("p") + _RUN_N).alias("run_len")
    )
    return (
        runs.groupBy("doc_id", "n_toks")
        .agg(
            F.count(F.lit(1)).alias("n_runs"),
            F.sum("run_len").alias("dup_tokens"),
            F.max("run_len").cast("long").alias("longest_run"),
        )
        .select(
            "doc_id",
            "n_runs",
            "dup_tokens",
            "longest_run",
            F.round(F.col("dup_tokens") / F.col("n_toks"), 4).alias(
                "dup_frac"
            ),
        )
        .orderBy("doc_id")
    )


def _word_shingles_keep_pos(toks, n: int):
    """Positional word n-grams (no dedup, unlike dedup._word_shingles —
    runs need every position). Empty array for docs shorter than n."""
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j + 1) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


# --------------------------------------------------------------------------
# EXACT maximal shared-substring runs, per document PAIR — the
# suffix-array-fidelity upgrade of interdoc_dup_runs (r5 verdict item 5).
#
# interdoc_dup_runs approximates Lee et al. 2022's ExactSubstr with
# per-DOC positional-5-gram chaining, which deviates from the paper's
# semantics two ways its own docstring concedes:
#   (a) duplicated runs shorter than 5 tokens are invisible (no 5-gram
#       exists inside them), and
#   (b) chaining is content-blind across PARTNERS: two adjacent runs of
#       a doc that duplicate into two DIFFERENT documents merge into one
#       reported run even though that merged string occurs nowhere else
#       (and near-adjacent runs merge across <=5-token gaps).
# Lee et al. compute maximal substrings shared between concrete document
# pairs via a suffix array. The distributed-relational equivalent is the
# DSA-style sorted-k-mer-prefix pass: grouping suffixes by their k-token
# prefix IS an equi-join of positional k-grams (the suffix-array bucket
# boundary), and a shared substring of length L >= k between docs a and
# b appears as exactly the L-k+1 seed matches with constant DIAGONAL
# pa - pb and consecutive pa — so gaps-and-islands per (pair, diagonal)
# reconstructs every MAXIMAL shared run exactly (a run is maximal iff no
# seed extends the island on its diagonal). k = 3 with a >= 4-token
# report threshold makes runs of 4 tokens visible — the class (a) loses.
#
# Scale notes (100 TB): one positional-k-gram explosion; the seed join
# is the inverted-index equi-join with the module-standard document-
# frequency cap bounding per-gram fan-out (an over-cap gram is stop-gram
# boilerplate — the exact-dedup funnel's job upstream; the cap is
# mirrored in the oracle so parity holds by construction); everything
# after is windows/aggregates keyed by (doc_a, doc_b, diag) — equi-key
# shuffles only. Seeds per pair are bounded by min(len_a, len_b), and
# diagonals localize the work the per-doc approximation smeared.
_SEED_K = 3
_SEED_DF_CAP = 50
_MIN_RUN_EXACT = 4


def interdoc_dup_runs_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    toked = d.select("doc_id", tokens_col().alias("toks"))
    seeds = toked.select(
        "doc_id",
        F.posexplode(_word_shingles_keep_pos(F.col("toks"), _SEED_K)).alias(
            "p", "gram"
        ),
    )
    dfreq = Window.partitionBy("gram")
    capped = seeds.withColumn("df", F.count(F.lit(1)).over(dfreq)).filter(
        F.col("df") <= _SEED_DF_CAP
    )
    a, b = capped.alias("a"), capped.alias("b")
    # r15 (guide §2.3, project before the exchange): pb is NOT shuffled —
    # pb == pa - diag identically (diag is pa - pb by construction), so
    # start_b is recovered exactly as start_a - diag after the aggregate;
    # 8 bytes/row off the ~600k-row match shuffle. The gaps-and-islands
    # pair (lag -> brk, running sum -> run_id) is also collapsed to the
    # arithmetic island id pa - row_number(): within a maximal
    # consecutive-pa island both increase by 1 (constant id), across a
    # gap pa jumps by more than rn (id strictly increases), so the
    # grouping sets are identical — ONE window function over the same
    # sort instead of two. In-session A/B: results bit-identical
    # (39,019 rows), wall equal within noise (min 1.085 vs 1.080 s) —
    # kept for the narrower exchange and the shorter window chain.
    matches = a.join(
        b,
        (F.col("a.gram") == F.col("b.gram"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.col("a.p").alias("pa"),
        (F.col("a.p") - F.col("b.p")).alias("diag"),
    )
    w_diag = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pa")
    islands = matches.withColumn(
        "isl", F.col("pa") - F.row_number().over(w_diag)
    )
    return (
        islands.groupBy("doc_a", "doc_b", "diag", "isl")
        .agg(
            F.min("pa").alias("start_a"),
            (F.max("pa") - F.min("pa") + _SEED_K).cast("long").alias(
                "run_len"
            ),
        )
        .filter(F.col("run_len") >= _MIN_RUN_EXACT)
        .select(
            "doc_a",
            "doc_b",
            "start_a",
            (F.col("start_a") - F.col("diag")).alias("start_b"),
            "run_len",
        )
        .orderBy("doc_a", "doc_b", "start_a", "start_b")
    )


_SEED_GRAM = " || ' ' || ".join(f"toks[i+{j}]" for j in range(_SEED_K))
INTERDOC_RUNS_EXACT_ORACLE = f"""
WITH sp AS (
  SELECT doc_id, i - 1 AS p, {_SEED_GRAM} AS gram
  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
        FROM documents),
       unnest(generate_series(1, greatest(len(toks) - {_SEED_K - 1}, 0)))
         AS u(i)
),
capped AS (
  SELECT doc_id, p, gram FROM (
    SELECT doc_id, p, gram, count(*) OVER (PARTITION BY gram) AS df
    FROM sp)
  WHERE df <= {_SEED_DF_CAP}
),
matches AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.p AS pa, b.p AS pb,
         a.p - b.p AS diag
  FROM capped a JOIN capped b
    ON a.gram = b.gram AND a.doc_id < b.doc_id
),
lagged AS (
  SELECT *,
         CASE WHEN pa - coalesce(lag(pa) OVER (
                PARTITION BY doc_a, doc_b, diag ORDER BY pa), -2) > 1
              THEN 1 ELSE 0 END AS brk
  FROM matches
),
islands AS (
  SELECT *, sum(brk) OVER (PARTITION BY doc_a, doc_b, diag ORDER BY pa
                           ROWS UNBOUNDED PRECEDING) AS run_id
  FROM lagged
),
runs AS (
  SELECT doc_a, doc_b, min(pa) AS start_a, min(pb) AS start_b,
         (max(pa) - min(pa) + {_SEED_K})::BIGINT AS run_len
  FROM islands GROUP BY doc_a, doc_b, diag, run_id
)
SELECT doc_a, doc_b, start_a, start_b, run_len
FROM runs WHERE run_len >= {_MIN_RUN_EXACT}
ORDER BY doc_a, doc_b, start_a, start_b
"""


# --------------------------------------------------------------------------
# Per-document rollup of the exact pair runs — the scrubber input (how
# many of MY tokens are duplicated somewhere, and where), computed from
# interdoc_dup_runs_exact's per-pair maximal runs by unioning each doc's
# intervals across ALL partners (classic interval-union sweep: order by
# start, break where start exceeds the running max end). Directly
# comparable to interdoc_dup_runs' per-doc schema, with exact-pair
# semantics underneath: dup_tokens counts every token covered by some
# maximal shared run (>= _MIN_RUN_EXACT tokens, df-capped seeds), and
# touching-or-overlapping intervals merge into one covered REGION (so
# n_runs counts disjoint duplicated regions, not distinct partners).
#
# Scale notes (100 TB): intervals are output-sized (2 rows per pair
# run); the sweep is one window + one aggregate partitioned by doc_id —
# equi-key shuffles over the run set, never the corpus. The token-count
# attach is a narrow map over documents (third scan, budgeted).


def interdoc_dup_doc_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    runs = interdoc_dup_runs_exact(spark, sf_dir)
    # both sides' intervals come from ONE pass over the runs (a union of
    # two selects would recompute the whole seed-join pipeline per side
    # under Spark 4.1 AQE's no-reuse planning: measured 5 documents
    # scans -> 3)
    # DISTINCT is load-bearing beyond cost: duplicate identical
    # intervals (the same [s, e) shared with several partners) add
    # nothing to a union but would TIE the sweep window's (s, e) sort —
    # and a ROWS frame over tied rows is the one place an engine's
    # parallel window scheduling can pick different (equally "correct")
    # frames per run. Deduping makes (s, e) unique per doc, the order
    # total, and both engines' sweeps bit-stable (an intermittent
    # cross-engine flip on exactly such tied rows was observed under
    # CPU contention before this).
    ivals = runs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("doc_a").alias("doc_id"),
                    F.col("start_a").alias("s"),
                    (F.col("start_a") + F.col("run_len")).alias("e"),
                ),
                F.struct(
                    F.col("doc_b").alias("doc_id"),
                    F.col("start_b").alias("s"),
                    (F.col("start_b") + F.col("run_len")).alias("e"),
                ),
            )
        ).alias("iv")
    ).select("iv.doc_id", "iv.s", "iv.e").distinct()
    w = Window.partitionBy("doc_id").orderBy("s", "e")
    prev_max_e = F.max("e").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    islands = ivals.withColumn(
        "brk", (F.col("s") > F.coalesce(prev_max_e, F.lit(-1))).cast("long")
    ).withColumn("region_id", F.sum("brk").over(w_run))
    regions = islands.groupBy("doc_id", "region_id").agg(
        (F.max("e") - F.min("s")).alias("region_len")
    )
    d = table(spark, sf_dir, "documents")
    sizes = d.select("doc_id", F.size(tokens_col()).alias("n_toks"))
    return (
        regions.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_regions"),
            F.sum("region_len").alias("dup_tokens"),
            F.max("region_len").cast("long").alias("longest_region"),
        )
        .join(sizes, "doc_id")
        .select(
            "doc_id",
            "n_regions",
            "dup_tokens",
            "longest_region",
            F.round(F.col("dup_tokens") / F.col("n_toks"), 4).alias(
                "dup_frac"
            ),
        )
        .orderBy("doc_id")
    )


INTERDOC_DOC_REPORT_ORACLE = f"""
WITH runs AS ({INTERDOC_RUNS_EXACT_ORACLE}),
ivals AS (
  -- DISTINCT mirrors the Spark side: unique (s, e) per doc keeps the
  -- sweep window's ordering total (see the operator comment)
  SELECT DISTINCT doc_id, s, e FROM (
    SELECT doc_a AS doc_id, start_a AS s, start_a + run_len AS e FROM runs
    UNION ALL
    SELECT doc_b, start_b, start_b + run_len FROM runs
  )
),
lagged AS (
  SELECT doc_id, s, e,
         CASE WHEN s > coalesce(max(e) OVER (
                PARTITION BY doc_id ORDER BY s, e
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
              THEN 1 ELSE 0 END AS brk
  FROM ivals
),
islands AS (
  SELECT doc_id, s, e,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY s, e
                        ROWS UNBOUNDED PRECEDING) AS region_id
  FROM lagged
),
regions AS (
  SELECT doc_id, region_id, max(e) - min(s) AS region_len
  FROM islands GROUP BY doc_id, region_id
),
sizes AS (
  SELECT doc_id, len(regexp_split_to_array(trim(text), '\\s+')) AS n_toks
  FROM documents
)
SELECT r.doc_id, count(*)::BIGINT AS n_regions,
       sum(region_len)::BIGINT AS dup_tokens,
       max(region_len)::BIGINT AS longest_region,
       round(sum(region_len)::DOUBLE / n_toks, 4) AS dup_frac
FROM regions r JOIN sizes USING (doc_id)
GROUP BY r.doc_id, n_toks
ORDER BY r.doc_id
"""


# --------------------------------------------------------------------------
# Substring-scrub APPLY — the step that actually produces the
# deduplicated corpus (Lee et al. 2022 §4 remove the duplicated spans;
# the reports above only MEASURE them). Keep-first-occurrence policy:
# every exact pair run keeps its doc_a copy (pairs are emitted with
# doc_a < doc_b) and scrubs the doc_b-side interval, so exactly one
# occurrence of every duplicated string survives per pair chain. A
# document's scrub set is the union of its b-side intervals; tokens at
# covered positions are dropped and the survivors reassemble in
# position order. Fully-scrubbed docs come out with empty text rather
# than vanishing (the LEFT join from the corpus).
#
# Scale notes (100 TB): covered positions explode from the OUTPUT-sized
# run set (run_len rows per interval, bounded by doc length); the token
# explosion is one narrow posexplode of the corpus; the anti-join and
# the re-aggregation are doc_id/pos equi-key shuffles. No fan-out joins
# beyond the audited runs pipeline itself.


def interdoc_scrub_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    runs = interdoc_dup_runs_exact(spark, sf_dir)
    ivals = runs.select(
        F.col("doc_b").alias("doc_id"),
        F.col("start_b").alias("s"),
        (F.col("start_b") + F.col("run_len")).alias("e"),
    )
    cov = ivals.select(
        "doc_id",
        F.explode(F.sequence(F.col("s"), F.col("e") - 1)).alias("pos"),
    ).distinct()
    d = table(spark, sf_dir, "documents")
    tokpos = d.select(
        "doc_id", F.posexplode(tokens_col()).alias("pos", "tok")
    )
    kept = tokpos.join(cov, ["doc_id", "pos"], "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens_after"),
        F.concat_ws(
            " ",
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "tok"))),
                lambda x: x["tok"],
            ),
        ).alias("scrubbed_text"),
    )
    sizes = d.select("doc_id", F.size(tokens_col()).alias("n_tokens_before"))
    return (
        sizes.join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens_before",
            F.coalesce("n_tokens_after", F.lit(0)).alias("n_tokens_after"),
            (
                F.col("n_tokens_before")
                - F.coalesce("n_tokens_after", F.lit(0))
            ).alias("n_scrubbed"),
            F.coalesce("scrubbed_text", F.lit("")).alias("scrubbed_text"),
        )
        .orderBy("doc_id")
    )


INTERDOC_SCRUB_ORACLE = f"""
WITH runs AS ({INTERDOC_RUNS_EXACT_ORACLE}),
ivals AS (
  SELECT doc_b AS doc_id, start_b AS s, start_b + run_len AS e FROM runs
),
cov AS (
  SELECT DISTINCT doc_id, u.pos
  FROM ivals, unnest(generate_series(s, e - 1)) AS u(pos)
),
toks AS (
  SELECT doc_id, i - 1 AS pos, t[i] AS tok
  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
        FROM documents),
       unnest(generate_series(1, len(t))) AS u(i)
),
kept AS (
  SELECT t.doc_id, t.pos, t.tok
  FROM toks t ANTI JOIN cov c ON c.doc_id = t.doc_id AND c.pos = t.pos
),
rebuilt AS (
  SELECT doc_id, count(*)::BIGINT AS n_tokens_after,
         string_agg(tok, ' ' ORDER BY pos) AS scrubbed_text
  FROM kept GROUP BY doc_id
),
sizes AS (
  SELECT doc_id,
         len(regexp_split_to_array(trim(text), '\\s+'))::BIGINT
           AS n_tokens_before
  FROM documents
)
SELECT s.doc_id, s.n_tokens_before,
       coalesce(r.n_tokens_after, 0)::BIGINT AS n_tokens_after,
       (s.n_tokens_before - coalesce(r.n_tokens_after, 0))::BIGINT
         AS n_scrubbed,
       coalesce(r.scrubbed_text, '') AS scrubbed_text
FROM sizes s LEFT JOIN rebuilt r USING (doc_id)
ORDER BY s.doc_id
"""


_RUN_GRAM = " || ' ' || ".join(f"toks[i+{j}]" for j in range(_RUN_N))
INTERDOC_RUNS_ORACLE = f"""
WITH sp AS (
  SELECT doc_id, len(toks) AS n_toks, i - 1 AS p, {_RUN_GRAM} AS span
  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
        FROM documents),
       unnest(generate_series(1, greatest(len(toks) - {_RUN_N - 1}, 0)))
         AS u(i)
),
dup AS (
  SELECT doc_id, n_toks, p FROM (
    SELECT doc_id, n_toks, p,
           min(doc_id) OVER (PARTITION BY span) AS mn,
           max(doc_id) OVER (PARTITION BY span) AS mx
    FROM sp)
  WHERE mn <> mx
),
lagged AS (
  SELECT doc_id, n_toks, p,
         CASE WHEN p - coalesce(lag(p) OVER (PARTITION BY doc_id ORDER BY p),
                                -{_RUN_N + 1})
                   > {_RUN_N} THEN 1 ELSE 0 END AS brk
  FROM dup
),
islands AS (
  SELECT doc_id, n_toks, p,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY p
                        ROWS UNBOUNDED PRECEDING) AS run_id
  FROM lagged
),
runs AS (
  SELECT doc_id, n_toks, run_id,
         max(p) - min(p) + {_RUN_N} AS run_len
  FROM islands GROUP BY 1, 2, 3
)
SELECT doc_id, count(*)::BIGINT AS n_runs,
       sum(run_len)::BIGINT AS dup_tokens,
       max(run_len)::BIGINT AS longest_run,
       round(sum(run_len)::DOUBLE / n_toks, 4) AS dup_frac
FROM runs
GROUP BY doc_id, n_toks
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# Token-budget selection: order the corpus best-quality-first and keep
# documents while the running token total stays within a fixed budget —
# the "select the top-B tokens" step a pretraining pipeline runs after
# scoring. Selection is take-while (a doc that overflows the budget stops
# the prefix), so the result is a deterministic function of (score,
# doc_id) order.
#
# Scale notes (100 TB): the quality score is quantized (one decimal), so
# it doubles as a BUCKET key: per-bucket token totals are a tiny aggregate
# whose running offsets (computed on <=11 rows) are broadcast back, and
# the running sum inside each bucket is a per-bucket window — the corpus
# is never pulled through a single-partition global window, and the
# result is IDENTICAL to the naive global cumsum because the global order
# (score DESC, doc_id) sorts bucket-contiguously.
_BUDGET_TOKENS = 20_000


def _doc_quality(d: DataFrame) -> DataFrame:
    """Per-doc (doc_id, n_tokens, quality_score) — doc_quality_scores core."""
    # tokens projected once: the score's CaseWhen branches are outside
    # codegen subexpression elimination, so an inlined split() would
    # re-tokenize per branch (the corpus_filter_report lesson)
    d = d.select("doc_id", "text", tokens_col().alias("toks"))
    toks = F.col("toks")
    n_tokens = F.size(toks)
    stop = F.size(F.filter(toks, lambda t: t.isin("the", "a", "of", "is", "and")))
    mean_word_len = F.length(F.regexp_replace("text", "\\s+", "")) / n_tokens
    score = (
        F.when((n_tokens >= 20) & (n_tokens <= 1000), F.lit(0.4)).otherwise(F.lit(0.0))
        + F.when(
            (stop / n_tokens >= 0.01) & (stop / n_tokens <= 0.5), F.lit(0.3)
        ).otherwise(F.lit(0.0))
        + F.when(
            (mean_word_len >= 2.0) & (mean_word_len <= 12.0), F.lit(0.3)
        ).otherwise(F.lit(0.0))
    )
    return d.select(
        "doc_id",
        n_tokens.cast("long").alias("n_tokens"),
        F.round(score, 1).alias("quality_score"),
    )


def token_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r14: the quality battery ran single-task on the single-row-group
    # scan; spread the head (the bucket windows downstream are bounded).
    scored = _doc_quality(spread(table(spark, sf_dir, "documents"), "doc_id"))
    # Phase 1: per-score-bucket totals -> running offset of all BETTER
    # buckets (tiny frame: quality_score has <=11 distinct values).
    bucket_totals = scored.groupBy("quality_score").agg(
        F.sum("n_tokens").alias("bucket_tokens")
    )
    w_buckets = (
        Window.orderBy(F.desc("quality_score"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = bucket_totals.withColumn(
        "bucket_offset",
        F.coalesce(F.sum("bucket_tokens").over(w_buckets), F.lit(0)),
    ).select("quality_score", "bucket_offset")
    # Phase 2: within-bucket running sum + broadcast offset = global cumsum.
    w_in = (
        Window.partitionBy("quality_score")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = scored.join(F.broadcast(offsets), "quality_score").withColumn(
        "cum_tokens", F.col("bucket_offset") + F.sum("n_tokens").over(w_in)
    )
    return (
        cum.filter(F.col("cum_tokens") <= _BUDGET_TOKENS)
        .select("doc_id", "quality_score", "n_tokens", "cum_tokens")
        .orderBy(F.desc("quality_score"), "doc_id")
    )


TOKEN_BUDGET_ORACLE = f"""
WITH scored AS (
  SELECT doc_id,
         n::BIGINT AS n_tokens,
         round(
           (CASE WHEN n BETWEEN 20 AND 1000 THEN 0.4 ELSE 0.0 END)
         + (CASE WHEN stop / n BETWEEN 0.01 AND 0.5 THEN 0.3 ELSE 0.0 END)
         + (CASE WHEN sq / n BETWEEN 2.0 AND 12.0 THEN 0.3 ELSE 0.0 END)
         , 1) AS quality_score
  FROM (
    SELECT doc_id, len(toks) AS n,
           len(list_filter(toks,
               t -> t IN ('the','a','of','is','and')))::DOUBLE AS stop,
           length(regexp_replace(text, '\\s+', '', 'g'))::DOUBLE AS sq
    FROM (SELECT doc_id, text,
                 regexp_split_to_array(trim(text), '\\s+') AS toks
          FROM documents)
  )
)
SELECT doc_id, quality_score, n_tokens, cum_tokens
FROM (
  SELECT doc_id, quality_score, n_tokens,
         sum(n_tokens) OVER (
           ORDER BY quality_score DESC, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         )::BIGINT AS cum_tokens
  FROM scored
)
WHERE cum_tokens <= {_BUDGET_TOKENS}
ORDER BY quality_score DESC, doc_id
"""


# --------------------------------------------------------------------------
# Deterministic global shuffle + shard assignment: the training data-loader
# shuffle as a reproducible query. Order = md5('shuf:' || doc_id) — no RNG,
# so the permutation is identical across runs, engines, and cluster sizes —
# and shards are dealt round-robin so every shard sees a uniform slice of
# the permutation (what per-worker loaders want).
#
# Scale notes (100 TB): global_pos comes from the same two-phase shape as
# token_budget_select, with the FIRST BYTE of the hash as the bucket key:
# ordering by (bucket, key) == ordering by key because the bucket is a
# prefix of the key. 256 bucket counts -> running offsets (tiny, broadcast),
# then row_number per bucket. No single-partition window anywhere.
_SHUF_SHARDS = 8


def global_shuffle_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    keyed = d.select(
        "doc_id",
        F.md5(F.concat(F.lit("shuf:"), F.col("doc_id").cast("string"))).alias(
            "skey"
        ),
    ).withColumn("bucket", F.substring("skey", 1, 2))
    counts = keyed.groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))
    w_b = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "offset", F.coalesce(F.sum("n").over(w_b), F.lit(0))
    ).select("bucket", "offset")
    w_in = Window.partitionBy("bucket").orderBy("skey", "doc_id")
    pos = keyed.join(F.broadcast(offsets), "bucket").withColumn(
        "global_pos", F.col("offset") + F.row_number().over(w_in) - 1
    )
    return pos.select(
        "doc_id",
        "global_pos",
        (F.col("global_pos") % _SHUF_SHARDS).cast("int").alias("shard"),
        (F.col("global_pos") / _SHUF_SHARDS).cast("long").alias(
            "pos_in_shard"
        ),
    ).orderBy("global_pos")


GLOBAL_SHUFFLE_ORACLE = f"""
SELECT doc_id, global_pos,
       CAST(global_pos % {_SHUF_SHARDS} AS INTEGER) AS shard,
       CAST(global_pos // {_SHUF_SHARDS} AS BIGINT) AS pos_in_shard
FROM (
  SELECT doc_id,
         row_number() OVER (
           ORDER BY md5('shuf:' || doc_id::VARCHAR), doc_id
         ) - 1 AS global_pos
  FROM documents
)
ORDER BY global_pos
"""


# --------------------------------------------------------------------------
# Embedding int8 quantization: per-vector max-abs symmetric quantization
# (q_i = floor(v_i * 127 / scale + 0.5), the storage format embedding
# stores/ANN services ship) with exact reconstruction-error reporting.
# floor(x + 0.5) instead of round() because both engines' floor on DOUBLE
# is the same IEEE operation, while round()'s half-way convention is
# engine-specific; the error sums left-fold in index order on both sides
# (F.aggregate / list_reduce), so the doubles accumulate identically.
#
# Scale notes (100 TB): a pure narrow map over the embedding column — no
# shuffle at all (the ORDER BY is presentation-only); 4x storage
# compression decided per vector, no global statistics pass needed.
_QUANT_BITS_MAX = 127


def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    scale = F.array_max(F.transform(F.col("v"), F.abs))
    q = F.transform(
        F.col("v"),
        lambda x: F.floor(x * _QUANT_BITS_MAX / F.col("scale") + 0.5),
    )
    deq_err = F.zip_with(
        F.col("v"),
        F.col("q"),
        lambda x, qi: F.abs(x - qi * F.col("scale") / _QUANT_BITS_MAX),
    )
    mean_err = F.aggregate(
        F.col("err"), F.lit(0.0), lambda acc, x: acc + x
    ) / F.size(F.col("err"))
    return (
        e.select("vec_id", "label", v.alias("v"))
        .withColumn("scale", scale)
        .filter(F.col("scale") > 0)
        .withColumn("q", q)
        .withColumn("err", deq_err)
        .select(
            "vec_id",
            "label",
            F.round("scale", 7).alias("scale"),
            F.round(F.array_max("err"), 9).alias("max_abs_err"),
            F.round(mean_err, 9).alias("mean_abs_err"),
        )
        .orderBy("vec_id")
    )


EMBED_QUANT_ORACLE = f"""
WITH prepped AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> x::DOUBLE) AS v,
         list_max(list_transform(embedding, x -> abs(x::DOUBLE))) AS scale
  FROM embeddings
),
quant AS (
  SELECT vec_id, label, scale,
         list_transform(
           list_zip(v, list_transform(
             v, x -> floor(x * {_QUANT_BITS_MAX} / scale + 0.5))),
           p -> abs(p[1] - p[2] * scale / {_QUANT_BITS_MAX})
         ) AS err
  FROM prepped WHERE scale > 0
)
SELECT vec_id, label,
       round(scale, 7) AS scale,
       round(list_max(err), 9) AS max_abs_err,
       round(list_reduce(err, (acc, x) -> acc + x) / len(err), 9)
         AS mean_abs_err
FROM quant
ORDER BY vec_id
"""


# --------------------------------------------------------------------------
# Fuzzy eval-set decontamination by n-gram CONTAINMENT: the paraphrase-
# robust complement to textops.benchmark_decontaminate. That pass flags
# exact word-5-gram overlap; an eval item that lightly rewords corpus
# text (here: an excerpt with every 5th token replaced — simulated
# paraphrase) breaks almost all 5-grams and slips through. This pass
# matches on 3-gram containment |bench ∩ doc| / |bench| — asymmetric on
# purpose (the excerpt is a tiny subset of the doc, so symmetric Jaccard
# would sit near 0 for a true contamination hit). Measured at sf0.01:
# the exact-5-gram pass catches 0 of the 30 perturbed bench items; this
# pass recovers every source document (32 pairs).
#
# Scale notes (100 TB): eval benchmarks are bounded — the bench shingle
# postings and per-bench sizes are BROADCAST; the corpus side explodes
# once, joins map-side, and aggregates on the (doc, bench) pair key.
# Identical shuffle shape to benchmark_decontaminate, deliberately: the
# fuzzy upgrade costs nothing extra at scale.
_FUZZY_EVERY = 17        # every k-th doc seeds the bench set
_FUZZY_SLICE = (5, 21)   # excerpt: tokens 5..25
_FUZZY_PERTURB = 5       # every k-th excerpt token is rewritten
_FUZZY_N = 3             # matching n-gram size
_FUZZY_MIN_CONTAIN = 0.25


def decontaminate_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    toked = d.select("doc_id", tokens_col().alias("toks"))
    bench_sh, bench_sizes = fuzzy_bench_frames(toked)
    return fuzzy_contamination(toked, bench_sh, bench_sizes).orderBy(
        "doc_id", "bench_id"
    )


def fuzzy_bench_frames(toked: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(bench_sh, bench_sizes): the synthetic perturbed-excerpt benchmark
    set derived from a (doc_id, toks) frame — the STATIC side of fuzzy
    decontamination. Factored out so the streaming curation funnel can
    build it once (eval benchmarks are fixed inputs in production) and
    pass it to fuzzy_contamination per micro-batch."""
    from .dedup import _word_shingles

    excerpt = F.slice(F.col("toks"), *_FUZZY_SLICE)
    # guarded: sequence(1, 0) would run DESCENDING on an empty excerpt
    # (Spark auto-negates the step) where DuckDB's generate_series is empty
    perturbed = F.when(
        F.size(excerpt) > 0,
        F.zip_with(
            excerpt,
            F.sequence(F.lit(1), F.size(excerpt)),
            lambda t, i: F.when(
                i % _FUZZY_PERTURB == 0,
                F.concat(F.lit("zz"), F.col("doc_id").cast("string")),
            ).otherwise(t),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bench = toked.filter(F.col("doc_id") % _FUZZY_EVERY == 0).select(
        F.col("doc_id").alias("bench_id"), perturbed.alias("toks")
    )
    bench_sh = (
        bench.select(
            "bench_id",
            F.explode(_word_shingles(F.col("toks"), _FUZZY_N)).alias("shingle"),
        )
        .filter(F.col("shingle") != "")
        .distinct()
    )
    bench_sizes = bench_sh.groupBy("bench_id").agg(
        F.count(F.lit(1)).alias("n_bench")
    )
    return bench_sh, bench_sizes


def fuzzy_contamination(
    toked: DataFrame, bench_sh: DataFrame, bench_sizes: DataFrame
) -> DataFrame:
    """Per-doc fuzzy contamination hits of a (doc_id, toks) frame against
    a static benchmark shingle set (unordered; the batch query sorts).
    The decision is per-document — independent of every other corpus row
    — which is what lets the streaming funnel apply it per micro-batch
    with exact batch parity."""
    from .dedup import _word_shingles

    corpus_sh = (
        toked.select(
            "doc_id",
            F.explode(_word_shingles(F.col("toks"), _FUZZY_N)).alias("shingle"),
        )
        .filter(F.col("shingle") != "")
        .distinct()
    )
    return (
        corpus_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .join(F.broadcast(bench_sizes), "bench_id")
        .withColumn(
            "containment", F.round(F.col("n_shared") / F.col("n_bench"), 4)
        )
        .filter(F.col("n_shared") / F.col("n_bench") >= _FUZZY_MIN_CONTAIN)
        .select("doc_id", "bench_id", "n_shared", "containment")
    )


_FUZZY_SHINGLE_SQL = f"""
  SELECT DISTINCT {{id_col}}, shingle FROM (
    SELECT {{id_col}},
           unnest(list_transform(
             generate_series(1, greatest(len(toks) - {_FUZZY_N - 1}, 0)),
             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
           )) AS shingle
    FROM {{src}})
  WHERE shingle <> ''
"""

DECON_FUZZY_ORACLE = f"""
WITH toked AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
  FROM documents
),
bench AS (
  SELECT doc_id AS bench_id,
         list_transform(
           list_zip(list_slice(toks, {_FUZZY_SLICE[0]},
                               {_FUZZY_SLICE[0] + _FUZZY_SLICE[1] - 1}),
                    generate_series(1, len(list_slice(toks, {_FUZZY_SLICE[0]},
                               {_FUZZY_SLICE[0] + _FUZZY_SLICE[1] - 1})))),
           p -> CASE WHEN p[2] % {_FUZZY_PERTURB} = 0
                     THEN 'zz' || doc_id::VARCHAR ELSE p[1] END
         ) AS toks
  FROM toked WHERE doc_id % {_FUZZY_EVERY} = 0
),
bench_sh AS ({_FUZZY_SHINGLE_SQL.format(id_col="bench_id", src="bench")}),
bench_sizes AS (
  SELECT bench_id, count(*)::BIGINT AS n_bench FROM bench_sh GROUP BY bench_id
),
corpus_sh AS ({_FUZZY_SHINGLE_SQL.format(id_col="doc_id", src="toked")}),
shared AS (
  SELECT doc_id, bench_id, count(*)::BIGINT AS n_shared
  FROM corpus_sh JOIN bench_sh USING (shingle)
  GROUP BY doc_id, bench_id
)
SELECT doc_id, bench_id, n_shared,
       round(n_shared::DOUBLE / n_bench, 4) AS containment
FROM shared JOIN bench_sizes USING (bench_id)
WHERE n_shared::DOUBLE / n_bench >= {_FUZZY_MIN_CONTAIN}
ORDER BY doc_id, bench_id
"""


# --------------------------------------------------------------------------
# Unigram-LM surprisal scoring: the language-model-based quality signal
# (CCNet's perplexity filter, shrunk to a unigram LM that two engines can
# agree on bit-for-bit). Each token scores total_tokens/freq(token) — a
# rational inverse-probability surrogate, monotone in -log p(token), so
# ranking behaves like perplexity without transcendental ln() (whose last
# ulp differs between JVM and DuckDB libm; same policy as tfidf's
# rational idf). Per-doc sums accumulate in DECIMAL so partial-agg order
# cannot perturb the double result.
#
# Scale notes (100 TB): the vocabulary aggregate shuffles on term once;
# the per-token re-join BROADCASTS the vocab (a real pipeline caps it at
# top-K tokens + a default for the tail — bounded by construction). The
# per-doc aggregate shuffles on doc_id. No Python anywhere.


def _surprisal_scored(d: DataFrame, with_lang: bool = False) -> DataFrame:
    """The ONE definition of the unigram-surprisal score: per-doc
    (n_tokens, avg_surprisal, max_surprisal), optionally keyed by lang
    too. doc_unigram_surprisal and ccnet_perplexity_buckets both select
    from this — the registry demotion of the former is justified by the
    latter hash-checking these exact expressions in-window, which only
    holds while there is a single copy to drift."""
    keys = ["doc_id", "lang"] if with_lang else ["doc_id"]
    toks = d.select(*keys, F.explode(tokens_col()).alias("term")).filter(
        F.col("term") != ""
    )
    vocab = toks.groupBy("term").agg(F.count(F.lit(1)).alias("freq"))
    # corpus total folded out of the vocab (1-row broadcast) — no second
    # corpus pass, stays lazy
    total = vocab.agg(F.sum("freq").cast("double").alias("total"))
    s = (F.col("total") / F.col("freq").cast("double")).alias("s")
    return (
        toks.join(F.broadcast(vocab), "term")
        .crossJoin(F.broadcast(total))
        .select(*keys, s)
        .groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                F.sum(F.col("s").cast("decimal(25,10)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_surprisal"),
            F.round(F.max("s"), 6).alias("max_surprisal"),
        )
    )


def doc_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r14: a spread of this head was tried and REVERTED (measured 0.43 s
    # -> 0.58 s — the full-vocab explode aggregates better single-task).
    d = table(spark, sf_dir, "documents")
    return (
        _surprisal_scored(d)
        .select("doc_id", "n_tokens", "avg_surprisal", "max_surprisal")
        .orderBy("doc_id")
    )


DOC_SURPRISAL_ORACLE = """
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
  FROM documents
),
nonempty AS (SELECT doc_id, term FROM toks WHERE term <> ''),
vocab AS (SELECT term, count(*) AS freq FROM nonempty GROUP BY term),
total AS (SELECT count(*)::DOUBLE AS n FROM nonempty)
SELECT doc_id,
       count(*)::BIGINT AS n_tokens,
       round((sum(((SELECT n FROM total) / freq::DOUBLE)::DECIMAL(25,10))
              ::DOUBLE) / count(*), 6) AS avg_surprisal,
       round(max((SELECT n FROM total) / freq::DOUBLE), 6) AS max_surprisal
FROM nonempty JOIN vocab USING (term)
GROUP BY doc_id
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# CCNet-style perplexity bucketing (Wenzek et al. 2020, "CCNet:
# Extracting High Quality Monolingual Datasets from Web Crawl Data"):
# each language's documents are split into head/middle/tail terciles by
# LM score — CCNet's core curation primitive (train on head, sample
# middle, drop tail). The LM here is the repo's unigram-surprisal score
# (doc_unigram_surprisal's exact expressions; low surprisal = more
# predictable = head).
#
# Scale notes (100 TB): a naive per-lang ntile is a
# Window.partitionBy(lang) sort — parallelism equal to the number of
# languages, i.e. ~10 tasks sorting 10 TB each. This is instead the
# repo's two-phase bucketed global-position shape (token_budget_select /
# global_shuffle_shard): a construction-BOUNDED coarse key
# sbucket = floor(log10(surprisal)*10) (surprisal <= corpus token count
# < 2^63 -> log10 < 19 -> < 190 buckets/lang; monotone in the sort key,
# so (sbucket, surprisal, doc_id) order == (surprisal, doc_id) order),
# tiny per-(lang, sbucket) counts -> running offsets (broadcast), then
# row_number only within (lang, sbucket). The SQL-standard ntile
# remainder rule (first n%3 tiles get the extra row) is applied as an
# integer formula on the reconstructed per-lang rank, so the oracle is
# literally DuckDB's ntile(3).
def ccnet_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    scored = (
        _surprisal_scored(d, with_lang=True)
        .select("doc_id", "lang", "avg_surprisal")
        .withColumn(
            "sbucket",
            F.floor(
                F.log10(F.greatest(F.col("avg_surprisal"), F.lit(1.0))) * 10
            ).cast("int"),
        )
    )
    # The score table feeds three consumers (bucket counts -> offsets,
    # per-lang totals, and the ranked assignment); Spark 4.1 AQE
    # recomputes every multi-consumer branch, which would re-run the
    # corpus surprisal pass 9x. Materialize it once — it is the per-doc
    # score table a production pipeline persists anyway (4 narrow
    # columns, corpus-row-count-sized, not corpus-text-sized).
    scored = scored.localCheckpoint(eager=False)
    counts = scored.groupBy("lang", "sbucket").agg(
        F.count(F.lit(1)).alias("c")
    )
    w_off = (
        Window.partitionBy("lang")
        .orderBy("sbucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.withColumn(
        "off", F.coalesce(F.sum("c").over(w_off), F.lit(0))
    )
    lang_n = counts.groupBy("lang").agg(F.sum("c").alias("n"))
    w_in = Window.partitionBy("lang", "sbucket").orderBy(
        "avg_surprisal", "doc_id"
    )
    ranked = (
        scored.join(F.broadcast(offsets.select("lang", "sbucket", "off")),
                    ["lang", "sbucket"])
        .join(F.broadcast(lang_n), "lang")
        .withColumn("r", F.col("off") + F.row_number().over(w_in))
    )
    # SQL-standard ntile(3): size = n div 3, the first (n mod 3) tiles
    # carry one extra row.
    size = (F.col("n") / 3).cast("bigint")
    extras = F.col("n") % 3
    cut = (size + 1) * extras
    tile = F.when(
        F.col("r") <= cut, ((F.col("r") - 1) / (size + 1)).cast("bigint") + 1
    ).otherwise(
        extras + ((F.col("r") - cut - 1) / size).cast("bigint") + 1
    )
    bucket_name = (
        F.when(tile == 1, "head").when(tile == 2, "middle").otherwise("tail")
    )
    return (
        ranked.select(
            "doc_id",
            "lang",
            "avg_surprisal",
            F.col("r").alias("lang_rank"),
            bucket_name.alias("ppl_bucket"),
        )
        .orderBy("lang", "lang_rank")
    )


CCNET_BUCKETS_ORACLE = """
WITH toks AS (
  SELECT doc_id, lang,
         unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
  FROM documents
),
nonempty AS (SELECT doc_id, lang, term FROM toks WHERE term <> ''),
vocab AS (SELECT term, count(*) AS freq FROM nonempty GROUP BY term),
total AS (SELECT count(*)::DOUBLE AS n FROM nonempty),
scored AS (
  SELECT doc_id, lang,
         round((sum(((SELECT n FROM total) / freq::DOUBLE)::DECIMAL(25,10))
                ::DOUBLE) / count(*), 6) AS avg_surprisal
  FROM nonempty JOIN vocab USING (term)
  GROUP BY doc_id, lang
)
SELECT doc_id, lang, avg_surprisal,
       row_number() OVER (PARTITION BY lang
                          ORDER BY avg_surprisal, doc_id) AS lang_rank,
       CASE ntile(3) OVER (PARTITION BY lang
                           ORDER BY avg_surprisal, doc_id)
         WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail'
       END AS ppl_bucket
FROM scored
ORDER BY lang, lang_rank
"""


# --------------------------------------------------------------------------
# K-means (Lloyd's algorithm) over the embedding column — the iterative-
# algorithm representative the brief's "custom operators" clause calls
# for. Deterministic throughout: init centroids are the first K vectors
# by vec_id, assignment ties break to the lowest centroid id, and both
# the centroid means and the inertia accumulate in DECIMAL (r4: the
# per-dimension sums too — a plain double sum's merge order follows
# shuffle fetch order, which could move the mean by an ulp across runs).
# That full determinism is what makes the r4 ORACLE possible: the fixed
# iteration count unrolls into CTE stages (see _kmeans_oracle), turning
# the last non-streaming rows-only row into a hash-verified one.
#
# Scale notes (100 TB): the classic Spark k-means shape (what MLlib
# does) — centroids live on the DRIVER between iterations because they
# are O(k*d) (here 10x64 doubles), never O(n): each iteration broadcasts
# centroids as array literals into a narrow assignment map, then one
# (cid, dim) shuffle of dimension partial-sums computes the new means.
# The per-iteration collect is 640 rows — bounded by the model size, not
# the data. Array-literal centroids (not a crossJoin against a centroid
# frame) keep assignment inside whole-stage codegen, the same trick
# cosine_topk_lsh uses for its hyperplanes.
_KM_K = 10
_KM_ITERS = 3


def _km_assign(emb_df: DataFrame, cents: list[list[float]]) -> DataFrame:
    dists = F.array(
        *[
            F.aggregate(
                F.zip_with(
                    F.col("emb"),
                    F.array(*[F.lit(float(x)) for x in c]),
                    lambda x, y: (x - y) * (x - y),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            for c in cents
        ]
    )
    return emb_df.withColumn("dists", dists).select(
        "vec_id",
        "emb",
        (F.array_position(F.col("dists"), F.array_min("dists")) - 1)
        .cast("int")
        .alias("cid"),
        F.array_min("dists").alias("dist"),
    )


def kmeans_lloyd_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    cents = [
        r.emb
        for r in emb.filter(F.col("vec_id") < _KM_K).orderBy("vec_id").collect()
    ]
    for _ in range(_KM_ITERS):
        sums = (
            _km_assign(emb, cents)
            .select("cid", F.posexplode("emb").alias("dim", "x"))
            .groupBy("cid", "dim")
            # DECIMAL accumulation (repo numeric policy, same as the
            # inertia sum below): a plain double sum's reduce-side merge
            # order follows shuffle fetch order, so centroids could
            # differ in last ulps across runs and flip near-tie
            # assignments — breaking this operator's determinism claim.
            .agg(
                F.sum(F.col("x").cast("decimal(25,15)"))
                .cast("double")
                .alias("sx"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()  # O(k*d) model rows, not O(n) data rows
        )
        by_cid: dict[int, dict[int, tuple[float, int]]] = {}
        for r in sums:
            by_cid.setdefault(r.cid, {})[r.dim] = (r.sx, r.n)
        cents = [
            [by_cid[c][d][0] / by_cid[c][d][1] for d in range(len(cents[0]))]
            if c in by_cid
            else cents[c]  # empty cluster keeps its old centroid
            for c in range(_KM_K)
        ]
    return (
        _km_assign(emb, cents)
        .groupBy("cid")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(
                F.sum(F.col("dist").cast("decimal(25,15)")).cast("double"), 6
            ).alias("inertia"),
        )
        .orderBy("cid")
    )


def _kmeans_oracle() -> str:
    """Declarative fixpoint of the 3 Lloyd iterations as unrolled CTEs.

    Expressible ONLY because every piece is deterministic cross-engine:
    init = first K vectors, squared distances are index-ordered
    list_reduce folds (identical to Spark's F.aggregate sequential fold),
    ties break to the lowest cid, and centroid means / inertia accumulate
    in DECIMAL(25,15) before the double conversion — so each unrolled
    iteration reproduces the Spark driver loop bit-for-bit."""
    d2 = (
        "list_reduce(list_transform(list_zip(e.v, c.cv), "
        "p -> (p[1] - p[2]) * (p[1] - p[2])), (acc, x) -> acc + x)"
    )
    parts = [
        "WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE)"
        " AS v FROM embeddings),",
        "ex AS (SELECT vec_id, u.x, u.pos FROM e, LATERAL (SELECT unnest(v)"
        " AS x, generate_subscripts(v, 1) AS pos) u),",
        f"cl0 AS (SELECT vec_id AS cid, v AS cv FROM e"
        f" WHERE vec_id < {_KM_K}),",
    ]
    prev = "cl0"
    for i in range(1, _KM_ITERS + 1):
        parts += [
            f"""a{i} AS (
  SELECT vec_id, cid FROM (
    SELECT e.vec_id, c.cid,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {d2}, c.cid) AS rn
    FROM e CROSS JOIN {prev} c
  ) WHERE rn = 1
),""",
            f"""m{i} AS (
  SELECT a.cid, ex.pos, sum(ex.x::DECIMAL(25,15))::DOUBLE / count(*) AS cx
  FROM a{i} a JOIN ex USING (vec_id) GROUP BY a.cid, ex.pos
),""",
            f"""cl{i} AS (
  SELECT o.cid, coalesce(n.cv, o.cv) AS cv
  FROM {prev} o LEFT JOIN (SELECT cid, list(cx ORDER BY pos) AS cv
                           FROM m{i} GROUP BY cid) n USING (cid)
),""",
        ]
        prev = f"cl{i}"
    parts.append(
        f"""final AS (
  SELECT vec_id, cid, d FROM (
    SELECT e.vec_id, c.cid, {d2} AS d,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {d2}, c.cid) AS rn
    FROM e CROSS JOIN {prev} c
  ) WHERE rn = 1
)
SELECT cid, count(*)::BIGINT AS n_vecs,
       round(sum(d::DECIMAL(25,15))::DOUBLE, 6) AS inertia
FROM final GROUP BY cid ORDER BY cid"""
    )
    return "\n".join(parts)


KMEANS_ORACLE = _kmeans_oracle()


# --------------------------------------------------------------------------
# BM25-style keyword search: the missing retrieval member next to the
# embedding ANN stack — top-k documents per keyword query, scored with
# the BM25 term-frequency saturation (k1=1.2, b=0.75) and a RATIONAL idf
# surrogate (N - df + 0.5)/(df + 0.5), i.e. classic BM25 idf without the
# log(): per-term monotone, and IEEE-division exact on both engines (the
# repo numeric policy — same reason tfidf/surprisal are ln-free).
# Queries are derived in-query (tokens 10..12 of every 100th doc), so
# every query has guaranteed matches; note the seed doc need not win its
# own query — length normalization can prefer shorter full-match docs.
# Per-(query, doc) scores sum term contributions in DECIMAL after a
# 9-decimal round, so partial-agg order cannot perturb the ranking.
#
# Scale notes (100 TB): the query set is bounded (a search workload, not
# a corpus) — query terms BROADCAST into a semi-filter over the postings
# explosion, so only postings matching some query term ever shuffle; one
# (query, doc) aggregation, then a top-k window per query over the tiny
# scored set. avgdl is a 1-row broadcast like the surprisal total.
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_EVERY = 100     # every k-th doc seeds a query
_BM25_QSLICE = (10, 3)  # query = tokens 10..12 of the seed doc
_BM25_TOPK = 10
# Hard bound on the seeded workload: only docs below this id can seed a
# query, so the query set is <= _BM25_MAX_QUERIES at ANY corpus size —
# boundedness by construction, not by synthetic-data luck. (The r3 form
# .collect()ed the workload to the driver; that materialization grew
# O(corpus/100) — a driver bottleneck at the 100-TB design point.)
_BM25_MAX_QUERIES = 64


def bm25_keyword_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    # empty tokens dropped BEFORE dl/avgdl so length stats match the
    # postings the oracle computes over the filtered array
    toked = d.select(
        "doc_id",
        F.filter(tokens_col(), lambda t: t != "").alias("toks"),
    )
    # r14: the corpus branch tokenizes AFTER a spread of the raw rows —
    # the single-row-group scan otherwise runs split+explode on one core
    # (measured: the whole scan-side stage was 1 task).
    toked_wide = spread(d.select("doc_id", "text"), "doc_id").select(
        "doc_id",
        F.filter(tokens_col(), lambda t: t != "").alias("toks"),
    )
    # The query workload is a BOUNDED distributed frame (a search request
    # set, not a corpus): the doc_id range predicate below pushes through
    # the tokenization to the parquet scan (row-group pruning on the
    # doc_id min/max stats), so each of the two broadcast consumers of
    # `queries` (the distinct-term semi-filter and the scoring join)
    # re-derives it from a <= 64-doc slice — bounded work even though
    # Spark 4.1 AQE plans the two consumers independently. No driver
    # round-trip, no .collect().
    queries = toked.filter(
        (F.col("doc_id") % _BM25_EVERY == 0)
        & (F.col("doc_id") < _BM25_EVERY * _BM25_MAX_QUERIES)
    ).select(
        F.col("doc_id").alias("query_id"),
        F.explode(F.array_distinct(F.slice("toks", *_BM25_QSLICE))).alias(
            "term"
        ),
    )
    # one corpus branch: explode, broadcast-filter to query terms, ONE
    # pinned-width exchange by term that serves BOTH the tf aggregation
    # (hashpartitioning(term) satisfies the (doc, dl, term) clustering —
    # subset rule) and the df count window; df comes from a window over
    # this SAME small frame (one row per (doc, term)), not a second
    # corpus pass. r14: previously the tf groupBy and the df window each
    # took their own exchange, AQE coalesced both to ONE partition
    # (1.26 MB shuffle — but ~10^6-row CPU work), and the whole scoring
    # pipeline ran single-task (measured 1.3 s of a 2.1 s query).
    matched = (
        spread(
            toked_wide.select(
                "doc_id",
                F.size("toks").cast("double").alias("dl"),
                F.explode("toks").alias("term"),
            ).join(F.broadcast(queries.select("term").distinct()), "term"),
            "term",
        )
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
        .withColumn(
            "df",
            F.count(F.lit(1)).over(Window.partitionBy("term")).cast("double"),
        )
    )
    # corpus-level constants in ONE narrow agg scan (no explode)
    stats = d.select(F.size(F.filter(tokens_col(), lambda t: t != "")).alias("l")).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg(F.col("l").cast("double")).alias("avgdl"),
    )
    idf = (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    tf_norm = (F.col("tf") * (_BM25_K1 + 1)) / (
        F.col("tf")
        + _BM25_K1 * (1 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
    )
    # r14: the per-(doc, term) score is computed ONCE before the query
    # fan-out join (it does not depend on query_id), so the fanned rows
    # carry a ready value instead of re-evaluating the whole BM25
    # expression per (query, doc, term).
    # r15: the fanned rows now carry the score's UNSCALED LONG at 1e9
    # instead of a decimal(25,12), so the ~2.5M-row aggregation is a
    # codegen long sum, not BigDecimal adds (the measured floor of the
    # whole retrieval family). Bit-safety: round(x, 9) yields a double
    # whose shortest decimal repr has <= 9 fractional digits (the
    # 9-digit value it rounded to maps back to the same double at these
    # magnitudes), so cast to decimal(25,9) is exact and equals the old
    # decimal(25,12) value; x1e9 -> long is that exact unscaled integer.
    # The group sum is <= 3 terms x idf_max*2.2*1e9 — idf_max ~ corpus
    # size N, so the long sum is overflow-safe up to N ~ 1e9 docs (vs
    # long max 9.2e18); the back-conversion divides by 1e9 in decimal
    # (result scale 18 >= 9: exact) and casts to double, which is the
    # nearest double of the same exact sum the decimal path produced —
    # bit-identical through round(.., 6). Verified: 0 mismatches over
    # 200k random + boundary-tie values, and all 5 retrieval oracles.
    scale9 = F.lit(1000000000).cast("decimal(10,0)")
    term_score_u = (
        F.round(idf * tf_norm, 9).cast("decimal(25,9)") * scale9
    ).cast("long")
    scored = (
        matched.crossJoin(F.broadcast(stats))
        .withColumn("ts_u", term_score_u)
        .join(F.broadcast(queries), "term")
        .groupBy("query_id", "doc_id")
        .agg(
            F.round(
                (F.sum("ts_u").cast("decimal(29,9)") / scale9).cast(
                    "double"
                ),
                6,
            ).alias("score"),
            F.count(F.lit(1)).alias("n_matched_terms"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _BM25_TOPK)
        .select("query_id", "rank", "doc_id", "score", "n_matched_terms")
        .orderBy("query_id", "rank")
    )


def _bm25_oracle_over(table_expr: str, prelude: str = "") -> str:
    """The BM25 oracle parameterized by its corpus relation — the
    store-serving certificate (bm25_index_served_lww) reuses the
    IDENTICAL scoring SQL over an LWW-updated CTE, so the batch oracle
    and the update/delete serving oracle cannot drift apart."""
    return f"""
WITH {prelude}toked AS (
  SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\\s+'),
                             t -> t <> '') AS toks
  FROM {table_expr}
),
queries AS (
  SELECT doc_id AS query_id, unnest(list_distinct(
           list_slice(toks, {_BM25_QSLICE[0]},
                      {_BM25_QSLICE[0] + _BM25_QSLICE[1] - 1}))) AS term
  FROM toked WHERE doc_id % {_BM25_EVERY} = 0
    AND doc_id < {_BM25_EVERY * _BM25_MAX_QUERIES}
),
postings AS (
  SELECT doc_id, len(toks)::DOUBLE AS dl, term, count(*)::DOUBLE AS tf
  FROM (SELECT doc_id, toks, unnest(toks) AS term FROM toked)
  GROUP BY doc_id, len(toks), term
),
stats AS (
  SELECT (SELECT count(*)::DOUBLE FROM {table_expr}) AS n,
         (SELECT avg(len(toks)::DOUBLE) FROM toked) AS avgdl
),
df_counts AS (SELECT term, count(*)::DOUBLE AS df FROM postings GROUP BY term),
scored AS (
  SELECT q.query_id, p.doc_id,
         round(sum(round(
           ((s.n - f.df + 0.5) / (f.df + 0.5))
           * ((p.tf * ({_BM25_K1} + 1))
              / (p.tf + {_BM25_K1}
                 * (1 - {_BM25_B} + {_BM25_B} * p.dl / s.avgdl)))
         , 9)::DECIMAL(25,12))::DOUBLE, 6) AS score,
         count(*)::BIGINT AS n_matched_terms
  FROM postings p
  JOIN queries q USING (term)
  JOIN df_counts f USING (term)
  CROSS JOIN stats s
  GROUP BY q.query_id, p.doc_id
)
SELECT query_id, rank, doc_id, score, n_matched_terms
FROM (SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank
      FROM scored)
WHERE rank <= {_BM25_TOPK}
ORDER BY query_id, rank
"""


BM25_SEARCH_ORACLE = _bm25_oracle_over("documents")


# Session-scoped store directories for the *_served_lww certificates.
# The store build is deterministic in sf_dir (fixed waves, fixed
# timestamps), so repeated bench/verify invocations in one session reuse
# ONE directory per (kind, sf_dir) instead of accumulating store-sized
# temp trees (ADVICE r11); the tree is removed at interpreter exit. A
# build that throws is rmtree'd and NOT cached, so a later invocation
# rebuilds rather than serving a half-built store.
_SERVED_STATE_CACHE: dict[str, str] = {}


def _served_state_dir(kind: str, sf_dir: str, build) -> str:
    import atexit
    import os as _os
    import shutil
    import tempfile

    key = f"{kind}:{_os.path.abspath(sf_dir)}"
    hit = _SERVED_STATE_CACHE.get(key)
    if hit is not None:
        return hit
    path = tempfile.mkdtemp(prefix=f"{kind}_")
    try:
        build(path)
    except BaseException:
        shutil.rmtree(path, ignore_errors=True)
        raise
    _SERVED_STATE_CACHE[key] = path
    atexit.register(shutil.rmtree, path, ignore_errors=True)
    return path


def bm25_index_served_lww(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The incremental index's UPDATE/DELETE serving path under the
    driver's hash: land the corpus as wave 1 of a real postings/docmeta
    store (streaming/retrieval_index._land_text — the exact kernels the
    checkpointed stream runs), land a deterministic wave 2 of
    re-ingested versions and tombstones (every doc_id%10==7 doubled,
    every seed with doc_id%3==0 prefixed — the token slice shifts, so
    the seed's QUERY changes too — every doc_id%10==3 plus seed doc 100
    tombstoned), fold wave 1 (stats snapshot + physical LWW drop), and
    SERVE: bm25_index_search over snapshot-corrected corpus stats and
    the tail visibility mask. The oracle runs the IDENTICAL BM25 SQL
    (_bm25_oracle_over) over the LWW-updated corpus CTE — so the whole
    round-trip (ingest kernels, compaction fold, snapshot correction,
    tail mask, serving expressions) is value-hash-checked end to end.
    Reference anchor: the history lookup re-reads CURRENT Slack state
    per query because messages get edited (slackEventServer.js:187-202).

    Scale shape: identical to the streaming deployment's — ingest is
    append-only writes, the fold is the amortized heavy step, serving
    reads the query terms' pruned lists + a broadcast-sized tail mask
    + <= _DOC_PREFIXES snapshot rows (store build here is a bounded
    fixture of that pipeline, the media-store fixture discipline)."""
    from ..streaming.retrieval_index import (
        _land_text,
        bm25_index_search,
        compact_retrieval_store,
    )

    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    seed_upd = (F.col("doc_id") % _BM25_EVERY == 0) & (
        F.col("doc_id") % 3 == 0
    )
    text_upd = F.col("doc_id") % 10 == 7
    tomb = (F.col("doc_id") % 10 == 3) | (F.col("doc_id") == _BM25_EVERY)
    wave1 = d.select(
        "doc_id",
        "text",
        F.lit("2025-01-01 00:00:00").cast("timestamp").alias("ingest_ts"),
        F.lit(False).alias("deleted"),
    )
    wave2 = d.filter(seed_upd | text_upd | tomb).select(
        "doc_id",
        F.when(tomb, F.lit(None).cast("string"))
        .when(seed_upd, F.concat(F.lit("seed refresh "), F.col("text")))
        .otherwise(F.concat(F.col("text"), F.lit(" "), F.col("text")))
        .alias("text"),
        F.lit("2025-01-02 00:00:00").cast("timestamp").alias("ingest_ts"),
        tomb.alias("deleted"),
    )
    def build(state: str) -> None:
        _land_text(wave1, 0, state)
        _land_text(wave2, 1, state)
        # fold wave 1 only: wave 2 stays the uncompacted tail, so the
        # serve below exercises BOTH masking regimes (folded store
        # pre-masked physically; tail masked at read) and the
        # snapshot-corrected stats
        compact_retrieval_store(spark, state, upto=1)

    state = _served_state_dir("bm25_served_lww", sf_dir, build)
    return bm25_index_search(spark, state)


_LWW_DOCS_PRELUDE = f"""updated AS (
  SELECT doc_id,
         CASE WHEN doc_id % {_BM25_EVERY} = 0 AND doc_id % 3 = 0
                THEN 'seed refresh ' || text
              WHEN doc_id % 10 = 7 THEN text || ' ' || text
              ELSE text END AS text
  FROM documents
  WHERE doc_id % 10 <> 3 AND doc_id <> {_BM25_EVERY}
), """

BM25_INDEX_SERVED_LWW_ORACLE = _bm25_oracle_over(
    "updated", prelude=_LWW_DOCS_PRELUDE
)


def hybrid_index_served_lww(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HYBRID store's update/delete serving path under the driver's
    hash — the dense twin of bm25_index_served_lww: land the corpus
    (text + vector) as wave 1 of a real six-store hybrid state via the
    stream's own landing kernel (_land_hybrid), land the SAME
    deterministic update/tombstone wave with the dense extras (every
    doc_id%10==7 additionally takes the embedding of donor doc
    (doc_id%100)+400 — the vector MOVES cids under the fixed codebook;
    seed updates re-land their unchanged vector; tombstones drop both
    faces), fold wave 1 (compact_hybrid_store: physical LWW drop on
    all six stores + stats snapshot), and SERVE hybrid_index_search.
    The oracle composes the BM25 oracle over the LWW docs CTE with the
    IVF oracle over the LWW embeddings CTE — candidates and probe
    vectors from the UPDATED corpus, centroids from the ORIGINAL one
    (the fixed-codebook discipline the store runs), through the same
    RRF fusion SQL. So the dense masking (superseded vectors, moved
    cids, masked vecseeds) is value-hash-checked end to end."""
    from ..streaming.hybrid_index import (
        _land_hybrid,
        compact_hybrid_store,
        hybrid_index_search,
    )
    from .similarity import _centroid_model

    codebook = _centroid_model(spark, sf_dir)
    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    e = table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"),
        F.col("embedding").cast("array<double>").alias("embedding"),
    )
    base = d.join(e, "doc_id", "left")
    seed_upd = (F.col("doc_id") % _BM25_EVERY == 0) & (
        F.col("doc_id") % 3 == 0
    )
    text_upd = F.col("doc_id") % 10 == 7
    tomb = (F.col("doc_id") % 10 == 3) | (F.col("doc_id") == _BM25_EVERY)
    wave1 = base.select(
        "doc_id",
        "text",
        "embedding",
        F.lit("2025-01-01 00:00:00").cast("timestamp").alias("ingest_ts"),
        F.lit(False).alias("deleted"),
    )
    donor = e.select(
        F.col("doc_id").alias("donor_id"),
        F.col("embedding").alias("demb"),
    )
    wave2 = (
        base.filter(seed_upd | text_upd | tomb)
        .withColumn("donor_id", F.col("doc_id") % 100 + 400)
        .join(donor, "donor_id", "left")
        .select(
            "doc_id",
            F.when(tomb, F.lit(None).cast("string"))
            .when(seed_upd, F.concat(F.lit("seed refresh "), F.col("text")))
            .otherwise(F.concat(F.col("text"), F.lit(" "), F.col("text")))
            .alias("text"),
            # only docs that HAD a vector keep one (the oracle's
            # updated_emb is a projection of the embeddings table)
            F.when(tomb | F.col("embedding").isNull(), F.lit(None))
            .when(seed_upd, F.col("embedding"))
            .otherwise(F.col("demb"))
            .alias("embedding"),
            F.lit("2025-01-02 00:00:00")
            .cast("timestamp")
            .alias("ingest_ts"),
            tomb.alias("deleted"),
        )
    )
    def build(state: str) -> None:
        _land_hybrid(wave1, 0, state, codebook)
        _land_hybrid(wave2, 1, state, codebook)
        # fold wave 1 only: wave 2 stays the tail on BOTH faces
        compact_hybrid_store(spark, state, upto=1)

    state = _served_state_dir("hybrid_served_lww", sf_dir, build)
    return hybrid_index_search(spark, state, codebook)


def _hybrid_served_lww_oracle() -> str:
    """Composes _bm25_oracle_over(updated docs) with _ivf_oracle_at
    over the updated embeddings (centroids from the ORIGINAL corpus —
    the store's fixed codebook) through the RRF fusion SQL."""
    from .similarity import IVF_NPROBE, _ivf_oracle_at

    # LEFT join + donor-null drop, mirroring the store's left-join
    # semantics exactly (ADVICE r11): only text-updated (%10=7) docs
    # need the donor; an INNER join would silently drop live
    # non-updated vectors whenever the embeddings table lacks the donor
    # id (fewer than 500 contiguous rows). A %10=7 doc with NO donor
    # lands no v2 vector on the Spark side (isNotNull filter) while its
    # v1 vector is masked by the tail winner — so such docs leave the
    # dense face entirely, which is the WHERE clause's last conjunct.
    upd_emb_prelude = f"""updated_emb AS (
  SELECT e.vec_id,
         CASE WHEN e.vec_id % 10 = 7 THEN d.embedding
              ELSE e.embedding END AS embedding
  FROM embeddings e
  LEFT JOIN embeddings d ON d.vec_id = (e.vec_id % 100) + 400
  WHERE e.vec_id % 10 <> 3 AND e.vec_id <> {_BM25_EVERY}
    AND (e.vec_id % 10 <> 7 OR d.embedding IS NOT NULL)
), """
    ivf_sql = _ivf_oracle_at(
        IVF_NPROBE,
        query_where=(
            f"vec_id % {_BM25_EVERY} = 0"
            f" AND vec_id < {_BM25_EVERY * _BM25_MAX_QUERIES}"
        ),
        topk=_RRF_TOPK,
        corpus="updated_emb",
        centroid_corpus="embeddings",
        prelude=upd_emb_prelude,
    )
    lex_sql = _bm25_oracle_over("updated", prelude=_LWW_DOCS_PRELUDE)
    return f"""
WITH lex AS (
  SELECT query_id, doc_id, rank AS lex_rank
  FROM ({lex_sql}) bm
),
dense AS (
  SELECT query_id, neighbor_id AS doc_id, rank AS dense_rank
  FROM ({ivf_sql}) iv
),
fused AS (
  SELECT coalesce(l.query_id, d.query_id) AS query_id,
         coalesce(l.doc_id, d.doc_id) AS doc_id,
         round(coalesce(1.0::DOUBLE / ({_RRF_K} + l.lex_rank), 0.0)
               + coalesce(1.0::DOUBLE / ({_RRF_K} + d.dense_rank), 0.0),
               9) AS rrf_score,
         (l.lex_rank IS NOT NULL)::INT AS in_lex,
         (d.dense_rank IS NOT NULL)::INT AS in_dense
  FROM lex l FULL OUTER JOIN dense d
    ON l.query_id = d.query_id AND l.doc_id = d.doc_id
)
SELECT query_id, rank, doc_id, rrf_score, in_lex, in_dense
FROM (SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY rrf_score DESC, doc_id) AS rank
      FROM fused)
WHERE rank <= {_RRF_TOPK}
ORDER BY query_id, rank
"""


def funnel_sigstore_served_lww(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The funnel SIGNATURE STORE's update/delete serving path under
    the driver's hash — the dedup-store member of the *_served_lww
    certificate family (bm25/hybrid, r11): land the corpus as wave 1 of
    a REAL funnel ledger + signature store via the stream's own kernels
    (_land_funnel_ledger + _banded_sigs_of — the exact landing the
    checkpointed funnel runs), land a deterministic wave 2 of
    re-ingested versions and tombstones (every doc_id%10==7 doubled —
    its shingle set changes, so its signature and pairs change; every
    doc_id%10==3 tombstoned — its pairs must vanish), fold wave 1
    (compact_sig_store: physical LWW drop on the signature store +
    ledger fold), and SERVE the store's implied near-dup pairs
    (funnel_sigstore_pairs: ledger tail mask + the batch pair kernel
    _banded_sig_pairs verbatim). The oracle runs the IDENTICAL banded
    minhash SQL (_minhash_oracle) over the LWW-updated corpus CTE — so
    version-stamped signature landing, the masked fold, the tail mask,
    and the pair kernel are all value-hash-checked end to end.
    Reference anchor: the serving path re-reads CURRENT state per
    lookup (slackEventServer.js:187-202).

    Scale shape: identical to the streaming deployment's — landing is
    append-only narrow writes, the fold is the amortized heavy step,
    and the full-sweep serve reads 128-byte signature rows instead of
    re-tokenizing text (store build here is a bounded fixture of that
    pipeline, the bm25 certificate's discipline; the timed passes
    measure the recurring serving cost)."""
    from ..streaming.curation_funnel import (
        _banded_sigs_of,
        _land_funnel_ledger,
        compact_sig_store,
        funnel_sigstore_pairs,
    )

    d = table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    upd = F.col("doc_id") % 10 == 7
    tomb = F.col("doc_id") % 10 == 3
    wave1 = d.select(
        "doc_id",
        "text",
        "lang",
        "source",
        F.lit("2025-01-01 00:00:00").cast("timestamp").alias("ingest_ts"),
        F.lit(False).alias("deleted"),
    )
    wave2 = d.filter(upd | tomb).select(
        "doc_id",
        F.when(tomb, F.lit(None).cast("string"))
        .otherwise(F.concat(F.col("text"), F.lit(" "), F.col("text")))
        .alias("text"),
        "lang",
        "source",
        F.lit("2025-01-02 00:00:00").cast("timestamp").alias("ingest_ts"),
        tomb.alias("deleted"),
    )

    def build(state: str) -> None:
        for i, wave in enumerate((wave1, wave2)):
            _land_funnel_ledger(wave, i, state)
            live = wave.filter(~F.col("deleted"))
            (
                _banded_sigs_of(live)
                .write.mode("overwrite")
                .partitionBy("band", "bprefix")
                .parquet(f"{state}/sigs/batch_id={i}")
            )
        # fold wave 1 only: wave 2 stays the uncompacted tail on both
        # the signature store and the ledger, so the serve exercises
        # BOTH masking regimes (folded store pre-masked physically;
        # tail masked at read)
        compact_sig_store(spark, state, upto=1, ledger_upto=1)

    state = _served_state_dir("funnel_sigs_served_lww", sf_dir, build)
    return funnel_sigstore_pairs(spark, state)


def _funnel_sigstore_served_oracle() -> str:
    from .dedup import _minhash_oracle

    return _minhash_oracle(
        corpus="updated",
        prelude="""updated AS (
  SELECT doc_id,
         CASE WHEN doc_id % 10 = 7 THEN text || ' ' || text
              ELSE text END AS text
  FROM documents
  WHERE doc_id % 10 <> 3
), """,
    )


def funnel_landed_served_lww(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The funnel PRODUCT SINK's update/delete read path under the
    driver's hash — the landed-corpus member of the *_served_lww family
    (bm25/hybrid r11, signature store r12; r12 verdict item 3: the
    product mask was test-pinned but had no serving certificate). Land
    the corpus as wave 1 of a REAL funnel ledger + lang-partitioned
    landing sink via the stream's own kernels (_land_funnel_ledger +
    the landing write shape the foreachBatch stage uses), land the
    SAME deterministic update/tombstone wave 2 as the signature
    certificate (every doc_id%10==7 doubled, every doc_id%10==3
    tombstoned), fold wave 1 WITH the product sink
    (compact_sig_store(out_dir=...): tombstoned/superseded landed
    files physically dropped), and SERVE landed_documents_current — so
    version-stamped landing, the fold's physical mask on the product
    sink, and the read-time tail mask are value-hash-checked over the
    TEXT PAYLOAD itself (a training job that consumed the raw
    directory would train on deleted documents; this row certifies the
    reader that doesn't). Oracle: the LWW corpus CTE verbatim.
    Reference anchor: current-state re-read per lookup,
    slackEventServer.js:187-202.

    Scale shape: the read path is the deployment's — one pruned
    columnar scan of the landed corpus plus the broadcast-sized ledger
    tail mask (priced across three store decades in
    SCALE_PROBE_FUNNEL.json's landed_read_path face: both shapes
    ~linear because the op RETURNS the corpus; the mask term measured
    as the flat masked-minus-raw delta)."""
    from ..streaming.curation_funnel import (
        _land_funnel_ledger,
        compact_sig_store,
        landed_documents_current,
    )

    d = table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    upd = F.col("doc_id") % 10 == 7
    tomb = F.col("doc_id") % 10 == 3
    wave1 = d.select(
        "doc_id",
        "text",
        "lang",
        "source",
        F.lit("2025-01-01 00:00:00").cast("timestamp").alias("ingest_ts"),
        F.lit(False).alias("deleted"),
    )
    wave2 = d.filter(upd | tomb).select(
        "doc_id",
        F.when(tomb, F.lit(None).cast("string"))
        .otherwise(F.concat(F.col("text"), F.lit(" "), F.col("text")))
        .alias("text"),
        "lang",
        "source",
        F.lit("2025-01-02 00:00:00").cast("timestamp").alias("ingest_ts"),
        tomb.alias("deleted"),
    )

    def build(state: str) -> None:
        out = f"{state}/out"
        for i, wave in enumerate((wave1, wave2)):
            _land_funnel_ledger(wave, i, state)
            live = wave.filter(~F.col("deleted"))
            (
                live.select(
                    "doc_id",
                    "text",
                    "source",
                    "ingest_ts",
                    F.size(
                        F.filter(tokens_col(), lambda t: t != "")
                    ).cast("long").alias("n_tokens"),
                    "lang",
                )
                .write.mode("overwrite")
                .partitionBy("lang")
                .parquet(f"{out}/batch_id={i}")
            )
        # fold wave 1 only (out_dir included: the product sink's
        # physical mask) — wave 2 stays the uncompacted tail, so the
        # serve exercises BOTH masking regimes
        compact_sig_store(spark, state, upto=1, ledger_upto=1, out_dir=out)

    state = _served_state_dir("funnel_landed_served_lww", sf_dir, build)
    return (
        landed_documents_current(spark, f"{state}/out", state)
        .select("doc_id", "text", "lang", "source")
        .orderBy("doc_id")
    )


_FUNNEL_LANDED_SERVED_ORACLE = """
SELECT doc_id,
       CASE WHEN doc_id % 10 = 7 THEN text || ' ' || text
            ELSE text END AS text,
       lang,
       source
FROM documents
WHERE doc_id % 10 <> 3
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# HYBRID retrieval fusion (reciprocal-rank fusion, Cormack et al. 2009):
# the production shape for RAG / curation retrieval is BM25 ∪ dense
# ANN with the two rankings FUSED, and RRF is the standard fusion —
# score(d) = sum over systems of 1 / (k + rank_sys(d)), k = 60. It
# needs no score calibration across systems (ranks only), which is why
# it beats score interpolation in practice and why it is exactly
# SQL-expressible: a rank full-outer join + a bounded per-query top-k
# window, no new shuffle shapes.
#
# The shared query workload is the BM25 seed rule (every _BM25_EVERY-th
# doc, hard-capped at _BM25_MAX_QUERIES): documents and embeddings are
# 1:1 by id in this corpus (vec_id == doc_id), so query q's lexical
# side searches the seed doc's terms and its dense side searches the
# seed doc's embedding — the same information need through two
# retrievers, the textbook hybrid setup.
#
# Exactness: ranks are integers; 1.0/(60+rank) is one correctly-rounded
# IEEE division on both engines; the fused score sums at most two such
# terms in a fixed coalesce order and rounds to 9; the final rank
# orders by (rrf_score DESC, doc_id) — total order, no float ties
# across engines.
#
# 100 TB shape: both parents keep their pruned plans — the lexical side
# is the broadcast-query-term postings semi-filter, the dense side is a
# broadcast of <= 64 query vectors over one streaming candidate scan
# (swap in the IVF list-pruned variant beyond memory-bandwidth scale) —
# and the fusion itself joins two <= |Q| x topk ranked sets: bounded,
# broadcastable, trivial at any corpus size.
_RRF_K = 60
_RRF_TOPK = 10


def hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .similarity import cosine

    lex = bm25_keyword_search(spark, sf_dir).select(
        "query_id", "doc_id", F.col("rank").alias("lex_rank")
    )
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    q = emb.filter(
        (F.col("vec_id") % _BM25_EVERY == 0)
        & (F.col("vec_id") < _BM25_EVERY * _BM25_MAX_QUERIES)
    ).select(F.col("vec_id").alias("query_id"), F.col("emb").alias("qe"))
    # r14: candidate side spread off the single-task scan (single-row-
    # group input) so the |Q|x|C| cosine fold parallelizes.
    scored = (
        spread(emb, "vec_id")
        .select(F.col("vec_id").alias("doc_id"), F.col("emb").alias("ne"))
        .join(F.broadcast(q), F.col("query_id") != F.col("doc_id"))
        .withColumn("sim", cosine(F.col("qe"), F.col("ne")))
    )
    wd = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("doc_id")
    )
    dense = (
        scored.withColumn("dense_rank", F.row_number().over(wd))
        .filter(F.col("dense_rank") <= _RRF_TOPK)
        .select("query_id", "doc_id", "dense_rank")
    )
    return rrf_fuse(lex, dense)


def rrf_fuse(lex: DataFrame, dense: DataFrame) -> DataFrame:
    """RRF over two (query_id, doc_id, {lex,dense}_rank) rank frames —
    the fusion step alone, unit-testable on planted overlapping ranks
    (a doc in BOTH lists must score the two-term sum)."""
    fused = lex.join(dense, ["query_id", "doc_id"], "full_outer")
    rrf = F.round(
        F.coalesce(
            F.lit(1.0) / (F.lit(_RRF_K) + F.col("lex_rank")), F.lit(0.0)
        )
        + F.coalesce(
            F.lit(1.0) / (F.lit(_RRF_K) + F.col("dense_rank")), F.lit(0.0)
        ),
        9,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("rrf_score"), F.asc("doc_id")
    )
    return (
        fused.withColumn("rrf_score", rrf)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _RRF_TOPK)
        .select(
            "query_id",
            "rank",
            "doc_id",
            "rrf_score",
            F.col("lex_rank").isNotNull().cast("int").alias("in_lex"),
            F.col("dense_rank").isNotNull().cast("int").alias("in_dense"),
        )
        .orderBy("query_id", "rank")
    )


HYBRID_RRF_ORACLE = f"""
WITH lex AS (
  SELECT query_id, doc_id, rank AS lex_rank
  FROM ({BM25_SEARCH_ORACLE}) bm
),
dense AS (
  SELECT query_id, doc_id, dense_rank FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY list_cosine_similarity(q.emb, c.emb) DESC, c.vec_id
           ) AS dense_rank
    FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
          FROM embeddings
          WHERE vec_id % {_BM25_EVERY} = 0
            AND vec_id < {_BM25_EVERY * _BM25_MAX_QUERIES}) q
    CROSS JOIN (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
                FROM embeddings) c
    WHERE q.vec_id <> c.vec_id
  ) WHERE dense_rank <= {_RRF_TOPK}
),
fused AS (
  SELECT coalesce(l.query_id, d.query_id) AS query_id,
         coalesce(l.doc_id, d.doc_id) AS doc_id,
         round(coalesce(1.0::DOUBLE / ({_RRF_K} + l.lex_rank), 0.0)
               + coalesce(1.0::DOUBLE / ({_RRF_K} + d.dense_rank), 0.0),
               9) AS rrf_score,
         (l.lex_rank IS NOT NULL)::INT AS in_lex,
         (d.dense_rank IS NOT NULL)::INT AS in_dense
  FROM lex l FULL OUTER JOIN dense d
    ON l.query_id = d.query_id AND l.doc_id = d.doc_id
)
SELECT query_id, rank, doc_id, rrf_score, in_lex, in_dense
FROM (SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY rrf_score DESC, doc_id) AS rank
      FROM fused)
WHERE rank <= {_RRF_TOPK}
ORDER BY query_id, rank
"""


def hybrid_search_rrf_ivf(
    spark: SparkSession, sf_dir: str, model=None
) -> DataFrame:
    """Hybrid RRF with the dense side LIST-PRUNED — the deployable
    variant of hybrid_search_rrf (r9 verdict item 2).

    Same lexical parent (BM25 postings, broadcast-seeded), same
    rrf_fuse, same shared query workload (the BM25 seed rule, passed to
    the IVF probe branch as query_pred). The dense ranker swaps the
    brute-force full-corpus cosine for cosine_topk_ivf's machinery:
    nearest-centroid inverted lists, nprobe=3 probes, exact re-rank
    INSIDE the probed lists only (_ivf_topk, similarity.py). At bench
    scale both variants read the embeddings once; at 100 TB the
    brute-force side streams the whole corpus per query batch while
    this one touches nprobe/k of it — the memory-bandwidth win that
    makes IVF the production dense retriever. Approximation surfaces
    honestly in the fusion: a true dense neighbor outside the probed
    lists simply never enters the dense rank list (in_dense=0), exactly
    how a deployed IVF-backed hybrid behaves.

    `model` overrides the IVF codebook (default: this corpus's label
    centroids) — the comparator hook for the streaming store's retrain
    parity test (streaming/hybrid_index.retrain_hybrid_vector_store).
    """
    from .similarity import IVF_NPROBE, _ivf_topk

    lex = bm25_keyword_search(spark, sf_dir).select(
        "query_id", "doc_id", F.col("rank").alias("lex_rank")
    )
    seed = (F.col("vec_id") % _BM25_EVERY == 0) & (
        F.col("vec_id") < _BM25_EVERY * _BM25_MAX_QUERIES
    )
    dense = _ivf_topk(
        spark, sf_dir, IVF_NPROBE, query_pred=seed, topk=_RRF_TOPK,
        model=model,
    ).select(
        "query_id",
        F.col("neighbor_id").alias("doc_id"),
        F.col("rank").alias("dense_rank"),
    )
    return rrf_fuse(lex, dense)


def _hybrid_rrf_ivf_oracle() -> str:
    """Composes the BM25 oracle with the IVF oracle (seed workload,
    fusion-depth top-k) through the same RRF fusion SQL — the dense CTE
    is _ivf_oracle_at verbatim, so the list-pruned ranker cannot drift
    between its standalone row and the fused one."""
    from .similarity import IVF_NPROBE, _ivf_oracle_at

    ivf_sql = _ivf_oracle_at(
        IVF_NPROBE,
        query_where=(
            f"vec_id % {_BM25_EVERY} = 0"
            f" AND vec_id < {_BM25_EVERY * _BM25_MAX_QUERIES}"
        ),
        topk=_RRF_TOPK,
    )
    return f"""
WITH lex AS (
  SELECT query_id, doc_id, rank AS lex_rank
  FROM ({BM25_SEARCH_ORACLE}) bm
),
dense AS (
  SELECT query_id, neighbor_id AS doc_id, rank AS dense_rank
  FROM ({ivf_sql}) iv
),
fused AS (
  SELECT coalesce(l.query_id, d.query_id) AS query_id,
         coalesce(l.doc_id, d.doc_id) AS doc_id,
         round(coalesce(1.0::DOUBLE / ({_RRF_K} + l.lex_rank), 0.0)
               + coalesce(1.0::DOUBLE / ({_RRF_K} + d.dense_rank), 0.0),
               9) AS rrf_score,
         (l.lex_rank IS NOT NULL)::INT AS in_lex,
         (d.dense_rank IS NOT NULL)::INT AS in_dense
  FROM lex l FULL OUTER JOIN dense d
    ON l.query_id = d.query_id AND l.doc_id = d.doc_id
)
SELECT query_id, rank, doc_id, rrf_score, in_lex, in_dense
FROM (SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY rrf_score DESC, doc_id) AS rank
      FROM fused)
WHERE rank <= {_RRF_TOPK}
ORDER BY query_id, rank
"""


def hybrid_fusion_agreement_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-query agreement between the deployable list-pruned fusion
    (hybrid_search_rrf_ivf) and its brute-force parent — the acceptance
    table a deployment reads next to the scaling exponents (0.471 vs
    0.779, SCALE_PROBE_R10.json): how much of the fused top-k does the
    IVF dense side's bounded candidate reach actually cost?

    One row per query: both variants' fused result sizes, the overlap
    of their doc sets, overlap@k as a recall-style fraction, and
    whether the two top-1 docs agree (the answer a RAG serving path
    returns). The evaluation-composition shape (ann_recall_report /
    dedup_recall_report precedent): composes the two registered ops
    verbatim so the report can never drift from what it measures; the
    oracle composes their oracle SQLs the same way."""
    b = hybrid_search_rrf(spark, sf_dir).select(
        "query_id", "doc_id", F.col("rank").alias("rank_b")
    )
    v = hybrid_search_rrf_ivf(spark, sf_dir).select(
        "query_id", "doc_id", F.col("rank").alias("rank_v")
    )
    j = b.join(v, ["query_id", "doc_id"], "full_outer")
    both = F.col("rank_b").isNotNull() & F.col("rank_v").isNotNull()
    return (
        j.groupBy("query_id")
        .agg(
            F.sum(F.col("rank_b").isNotNull().cast("int"))
            .cast("long")
            .alias("n_brute"),
            F.sum(F.col("rank_v").isNotNull().cast("int"))
            .cast("long")
            .alias("n_ivf"),
            F.sum(both.cast("int")).cast("long").alias("n_overlap"),
            F.max(
                ((F.col("rank_b") == 1) & (F.col("rank_v") == 1)).cast(
                    "int"
                )
            )
            .cast("long")
            .alias("top1_agree"),
        )
        .select(
            "query_id",
            "n_brute",
            "n_ivf",
            "n_overlap",
            F.round(F.col("n_overlap") / F.lit(_RRF_TOPK), 6).alias(
                "overlap_at_k"
            ),
            "top1_agree",
        )
        .orderBy("query_id")
    )


def _hybrid_agreement_oracle() -> str:
    return f"""
WITH b AS (SELECT query_id, doc_id, rank AS rank_b
           FROM ({HYBRID_RRF_ORACLE}) hb),
v AS (SELECT query_id, doc_id, rank AS rank_v
      FROM ({_hybrid_rrf_ivf_oracle()}) hv),
j AS (
  SELECT coalesce(b.query_id, v.query_id) AS query_id,
         b.rank_b, v.rank_v
  FROM b FULL OUTER JOIN v
    ON b.query_id = v.query_id AND b.doc_id = v.doc_id
)
SELECT query_id,
       sum((rank_b IS NOT NULL)::INT)::BIGINT AS n_brute,
       sum((rank_v IS NOT NULL)::INT)::BIGINT AS n_ivf,
       sum((rank_b IS NOT NULL AND rank_v IS NOT NULL)::INT)::BIGINT
         AS n_overlap,
       round(sum((rank_b IS NOT NULL AND rank_v IS NOT NULL)::INT)
             / {_RRF_TOPK}.0, 6) AS overlap_at_k,
       max((rank_b = 1 AND rank_v = 1)::INT)::BIGINT AS top1_agree
FROM j GROUP BY query_id
ORDER BY query_id
"""


# --------------------------------------------------------------------------
# Product quantization (PQ) assignment: split each 64-dim embedding into
# M=8 subvectors of 8 dims; encode each subvector as the id of its
# nearest codebook centroid (K=16 per subspace) — the IVF-PQ storage
# format ANN services ship (64 floats -> 8 bytes, 32x). The codebook here
# is deterministic (the subvectors of the first K vectors — a trained
# codebook would come from kmeans_lloyd_clusters per subspace); ties
# break to the lowest centroid id; the reported quantization error
# accumulates per-subspace minima in DECIMAL so engines agree bitwise.
#
# Scale notes (100 TB): the codebook is MODEL state (M*K*8 = 1024
# doubles) embedded as array literals — the same codegen-friendly trick
# as cosine_topk_lsh's hyperplanes — so assignment is a pure narrow map:
# no shuffle, no join, no Python. The presentation sort is the only
# exchange.
_PQ_M = 8        # subspaces
_PQ_SUBDIM = 8   # dims per subspace
_PQ_K = 16       # centroids per subspace


def embedding_pq_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    codebook = [
        r.v for r in e.filter(F.col("vec_id") < _PQ_K).orderBy("vec_id").collect()
    ]  # model state: K vectors -> M*K subvector centroids

    def sub(col, j):  # 1-based slice of subspace j
        return F.slice(col, j * _PQ_SUBDIM + 1, _PQ_SUBDIM)

    def d2(col, lits):  # squared distance to a literal centroid subvector
        return F.aggregate(
            F.zip_with(
                col,
                F.array(*[F.lit(float(x)) for x in lits]),
                lambda x, y: (x - y) * (x - y),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    dist_cols = [
        F.array(
            *[
                d2(sub(F.col("v"), j),
                   codebook[c][j * _PQ_SUBDIM:(j + 1) * _PQ_SUBDIM])
                for c in range(_PQ_K)
            ]
        ).alias(f"d{j}")
        for j in range(_PQ_M)
    ]
    with_d = e.select("vec_id", *dist_cols)
    # argmin = first position of the min (ties -> lowest centroid id)
    code = F.concat_ws(
        "-",
        *[
            (F.array_position(F.col(f"d{j}"), F.array_min(f"d{j}")) - 1)
            .cast("string")
            for j in range(_PQ_M)
        ],
    )
    err = sum(
        F.round(F.array_min(f"d{j}"), 9).cast("decimal(25,12)")
        for j in range(_PQ_M)
    )
    return with_d.select(
        "vec_id",
        code.alias("pq_code"),
        F.round(err.cast("double"), 6).alias("q_err"),
    ).orderBy("vec_id")


EMBED_PQ_ORACLE = f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings
),
subs AS (
  SELECT vec_id, j,
         list_slice(v, j * {_PQ_SUBDIM} + 1, (j + 1) * {_PQ_SUBDIM}) AS sv
  FROM e, generate_series(0, {_PQ_M - 1}) g(j)
),
cb AS (
  SELECT vec_id AS cid, j, sv AS cv FROM subs WHERE vec_id < {_PQ_K}
),
dists AS (
  SELECT s.vec_id, s.j, c.cid,
         list_reduce(
           list_transform(list_zip(s.sv, c.cv),
                          p -> (p[1] - p[2]) * (p[1] - p[2])),
           (acc, x) -> acc + x
         ) AS d
  FROM subs s JOIN cb c USING (j)
),
best AS (
  SELECT vec_id, j, cid, d,
         row_number() OVER (PARTITION BY vec_id, j ORDER BY d, cid) AS rn
  FROM dists
)
SELECT vec_id,
       string_agg(cid::VARCHAR, '-' ORDER BY j) AS pq_code,
       round(sum(round(d, 9)::DECIMAL(25,12))::DOUBLE, 6) AS q_err
FROM best
WHERE rn = 1
GROUP BY vec_id
ORDER BY vec_id
"""


# --------------------------------------------------------------------------
# Corpus drift monitoring: distribution-shift report between a reference
# slice and a current slice of the corpus — the check a data pipeline
# runs before admitting a new crawl snapshot into the training mix (PSI/
# KL in most shops; here total-variation distance and the chi-square
# statistic, which are RATIONAL in the bucket proportions — no ln(), the
# repo's transcendental-free policy, same reason surprisal and tf-idf
# use rational surrogates). Signals: token-length buckets (16, capped)
# and the language distribution.
#
# Slices are derived in-query (doc_id parity) the way the bench-suite
# derivations are; production compares two snapshot paths. Scale shape:
# ONE conditional-aggregation pass over the corpus onto (signal, bucket)
# keys — bounded cardinality (16 + |langs|) — then all totals/distances
# fold IN-ROW from a per-signal collect_list (the quantile-histogram
# pattern: no single-partition window, no totals re-join). Per-bucket
# terms are single IEEE ops on exact integer ratios accumulated in
# DECIMAL, so both engines produce identical doubles.
_DRIFT_LEN_BUCKETS = 16
_DRIFT_LEN_WIDTH = 16


def corpus_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.size(tokens_col()).alias("n")
    )
    len_bucket = F.least(
        F.lit(_DRIFT_LEN_BUCKETS - 1),
        F.floor(F.col("n") / _DRIFT_LEN_WIDTH),
    ).cast("string")
    tagged = d.select(
        (F.col("doc_id") % 2 == 1).alias("cur"),
        len_bucket.alias("length"),
        F.col("lang").alias("lang_b"),
    )
    # one corpus pass: both signals unpivot from the same row
    sig = tagged.select(
        "cur",
        F.explode(
            F.array(
                F.struct(F.lit("length").alias("signal"),
                         F.col("length").alias("bucket")),
                F.struct(F.lit("lang").alias("signal"),
                         F.col("lang_b").alias("bucket")),
            )
        ).alias("sb"),
    ).select("cur", "sb.signal", "sb.bucket")
    buckets = sig.groupBy("signal", "bucket").agg(
        F.sum(F.when(~F.col("cur"), 1).otherwise(0)).alias("ref_c"),
        F.sum(F.when(F.col("cur"), 1).otherwise(0)).alias("cur_c"),
    )
    one = buckets.groupBy("signal").agg(
        F.sort_array(
            F.collect_list(F.struct("bucket", "ref_c", "cur_c"))
        ).alias("bc")
    )
    zero_l = F.lit(0).cast("long")
    base = one.select(
        "signal",
        "bc",
        F.aggregate(F.col("bc"), zero_l, lambda a, x: a + x["ref_c"]).alias(
            "n_ref"
        ),
        F.aggregate(F.col("bc"), zero_l, lambda a, x: a + x["cur_c"]).alias(
            "n_cur"
        ),
    )
    p = lambda x: x["ref_c"] / F.col("n_ref")  # noqa: E731
    q = lambda x: x["cur_c"] / F.col("n_cur")  # noqa: E731
    zero_d = F.lit(0).cast("decimal(25,15)")
    # re-cast inside the fold: decimal + decimal widens to (26,15) which
    # breaks aggregate()'s fixed accumulator type; scale stays 15 so the
    # cast is lossless
    tv = F.aggregate(
        F.col("bc"),
        zero_d,
        lambda a, x: (
            a + F.abs(p(x) - q(x)).cast("decimal(25,15)")
        ).cast("decimal(25,15)"),
    )
    chi2 = F.aggregate(
        F.col("bc"),
        zero_d,
        lambda a, x: (
            a
            + (
                (p(x) - q(x)) * (p(x) - q(x)) / ((p(x) + q(x)) / 2.0)
            ).cast("decimal(25,15)")
        ).cast("decimal(25,15)"),
    )
    return base.select(
        "signal",
        F.size("bc").cast("long").alias("n_buckets"),
        F.round(tv.cast("double") * 0.5, 6).alias("tv_distance"),
        F.round(chi2.cast("double"), 6).alias("chi2"),
    ).orderBy("signal")


DRIFT_ORACLE = f"""
WITH d AS (
  SELECT doc_id, lang,
         len(regexp_split_to_array(trim(text), '\\s+')) AS n
  FROM documents
),
sig AS (
  SELECT doc_id % 2 = 1 AS cur, 'length' AS signal,
         least({_DRIFT_LEN_BUCKETS - 1},
               floor(n / {_DRIFT_LEN_WIDTH}))::BIGINT::VARCHAR AS bucket
  FROM d
  UNION ALL
  SELECT doc_id % 2 = 1 AS cur, 'lang' AS signal, lang AS bucket FROM d
),
buckets AS (
  SELECT signal, bucket,
         sum(CASE WHEN NOT cur THEN 1 ELSE 0 END)::BIGINT AS ref_c,
         sum(CASE WHEN cur THEN 1 ELSE 0 END)::BIGINT AS cur_c
  FROM sig GROUP BY signal, bucket
),
tot AS (
  SELECT signal, sum(ref_c)::BIGINT AS n_ref, sum(cur_c)::BIGINT AS n_cur,
         count(*)::BIGINT AS n_buckets
  FROM buckets GROUP BY signal
)
SELECT b.signal, t.n_buckets,
       round(sum(CAST(abs(b.ref_c / t.n_ref - b.cur_c / t.n_cur)
                      AS DECIMAL(25,15)))::DOUBLE * 0.5, 6) AS tv_distance,
       round(sum(CAST((b.ref_c / t.n_ref - b.cur_c / t.n_cur)
                      * (b.ref_c / t.n_ref - b.cur_c / t.n_cur)
                      / ((b.ref_c / t.n_ref + b.cur_c / t.n_cur) / 2.0)
                      AS DECIMAL(25,15)))::DOUBLE, 6) AS chi2
FROM buckets b JOIN tot t ON t.signal = b.signal
GROUP BY b.signal, t.n_buckets
ORDER BY b.signal
"""


# --------------------------------------------------------------------------
# N-gram novelty curve — the data-ordering signal a curriculum pipeline
# tracks: for each document (in doc_id ingest order), what fraction of
# its word-3-grams has never appeared in any EARLIER document. A corpus
# whose novelty decays fast is mostly redundant tail; sharp drops locate
# bulk-duplicated ingest batches. First-occurrence attribution = the
# min-doc_id owner of each distinct shingle — one window on the shingle
# key (equi-partitioned), then a per-doc aggregate; no self-joins, no
# ordering-sensitive arithmetic (pure integer ratios, rounded once).
_NOVELTY_N = 3


def doc_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import _word_shingles

    d = table(spark, sf_dir, "documents")
    spans = (
        d.select(
            "doc_id",
            F.explode(_word_shingles(tokens_col(), _NOVELTY_N)).alias("s"),
        )
        .filter(F.col("s") != "")
        .distinct()
    )
    first_owner = F.min("doc_id").over(Window.partitionBy("s"))
    flagged = spans.select(
        "doc_id", (F.col("doc_id") == first_owner).alias("novel")
    )
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.col("novel").cast("long")).alias("n_novel"),
            F.round(
                F.sum(F.col("novel").cast("long"))
                / F.count(F.lit(1)),
                4,
            ).alias("novelty_frac"),
        )
        .orderBy("doc_id")
    )


NGRAM_NOVELTY_ORACLE = f"""
WITH spans AS (
  SELECT DISTINCT doc_id, s FROM (
    SELECT doc_id,
           unnest(list_transform(
             generate_series(1, greatest(len(toks) - {_NOVELTY_N - 1}, 0)),
             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
           )) AS s
    FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
          FROM documents)
  ) WHERE s <> ''
),
flagged AS (
  SELECT doc_id,
         (doc_id = min(doc_id) OVER (PARTITION BY s)) AS novel
  FROM spans
)
SELECT doc_id,
       count(*)::BIGINT AS n_shingles,
       sum(CASE WHEN novel THEN 1 ELSE 0 END)::BIGINT AS n_novel,
       round(sum(CASE WHEN novel THEN 1 ELSE 0 END) / count(*), 4)
         AS novelty_frac
FROM flagged
GROUP BY doc_id
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# Typo-pair detection via the DELETION-NEIGHBORHOOD join — the classic
# way to find edit-distance-1 key pairs WITHOUT an all-pairs comparison
# (FastSS / SymSpell's core trick): every term emits itself plus its
# len(t) single-character-deletion variants as join keys; two terms
# within edit distance 1 always share a key (insert/delete: one term IS
# the other's deletion variant; substitution: both delete the differing
# position to the same string), so a plain equi-join generates all
# candidates and levenshtein(a,b) = 1 confirms. At 100 TB the join is
# VOCAB-scale with ~(len+1) fan-out — never corpus-scale, never O(V^2).
#
# The synthetic vocabulary has no organic distance-1 pairs (verified),
# so typos are PLANTED in-query (the dedup_exact_normalized precedent):
# every 9th doc also emits its first token with the last character
# dropped. Report: (typo, correction) by frequency asymmetry — the
# cleaning rule "map the rare variant to the frequent one".
_TYPO_EVERY = 9
_TYPO_MIN_LEN = 4
_TYPO_MAX_LEN = 20


def vocab_typo_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(tokens_col()).alias("term")
    ).filter(F.col("term") != "")
    first_tok = F.element_at(tokens_col(), 1)
    planted = d.filter(
        (F.col("doc_id") % _TYPO_EVERY == 0)
        & (F.length(first_tok) >= _TYPO_MIN_LEN)
    ).select(
        first_tok.substr(F.lit(1), F.length(first_tok) - 1).alias("term")
    )
    vocab = (
        toks.select("term")
        .unionByName(planted.select("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(
            (F.length("term") >= _TYPO_MIN_LEN - 1)
            & (F.length("term") <= _TYPO_MAX_LEN)
        )
        # vocab-scale; feeds both sides of the key self-join — without
        # this, Spark 4.1 AQE recomputes the corpus token pass per side
        .localCheckpoint(eager=True)
    )
    deletions = F.transform(
        F.sequence(F.lit(1), F.length("term")),
        lambda i: F.concat(
            F.col("term").substr(F.lit(1), i - 1),
            F.col("term").substr(i + 1, F.length("term")),
        ),
    )
    keyed = vocab.select(
        "term",
        "freq",
        F.explode(
            F.array_union(F.array(F.col("term")), deletions)
        ).alias("k"),
    )
    a = keyed.select(
        F.col("term").alias("a"), F.col("freq").alias("fa"), "k"
    )
    b = keyed.select(
        F.col("term").alias("b"), F.col("freq").alias("fb"), "k"
    )
    pairs = (
        a.join(b, "k")
        .filter(F.col("a") < F.col("b"))
        .select("a", "fa", "b", "fb")
        .distinct()
        .filter(F.levenshtein("a", "b") == 1)
    )
    typo_first = F.col("fa") < F.col("fb")
    return pairs.select(
        F.when(typo_first, F.col("a")).otherwise(F.col("b")).alias("typo"),
        F.when(typo_first, F.col("fa")).otherwise(F.col("fb")).alias(
            "typo_freq"
        ),
        F.when(typo_first, F.col("b")).otherwise(F.col("a")).alias(
            "correction"
        ),
        F.when(typo_first, F.col("fb")).otherwise(F.col("fa")).alias(
            "correction_freq"
        ),
    ).orderBy("typo", "correction")


VOCAB_TYPO_ORACLE = f"""
WITH toks AS (
  SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
  FROM documents
),
planted AS (
  SELECT substr(t1, 1, len(t1) - 1) AS term FROM (
    SELECT regexp_split_to_array(trim(text), '\\s+')[1] AS t1
    FROM documents WHERE doc_id % {_TYPO_EVERY} = 0
  ) WHERE len(t1) >= {_TYPO_MIN_LEN}
),
vocab AS (
  SELECT term, count(*)::BIGINT AS freq FROM (
    SELECT term FROM toks WHERE term <> ''
    UNION ALL SELECT term FROM planted
  )
  GROUP BY term
  HAVING len(term) BETWEEN {_TYPO_MIN_LEN - 1} AND {_TYPO_MAX_LEN}
),
keyed AS (
  SELECT term, freq, unnest(list_distinct(
    [term] || list_transform(
      range(1, len(term) + 1),
      i -> substr(term, 1, i - 1) || substr(term, i + 1, len(term))
    ))) AS k
  FROM vocab
),
pairs AS (
  SELECT DISTINCT a.term AS a, a.freq AS fa, b.term AS b, b.freq AS fb
  FROM keyed a JOIN keyed b ON a.k = b.k AND a.term < b.term
)
SELECT CASE WHEN fa < fb THEN a ELSE b END AS typo,
       CASE WHEN fa < fb THEN fa ELSE fb END AS typo_freq,
       CASE WHEN fa < fb THEN b ELSE a END AS correction,
       CASE WHEN fa < fb THEN fb ELSE fa END AS correction_freq
FROM pairs
WHERE levenshtein(a, b) = 1
ORDER BY typo, correction
"""


# --------------------------------------------------------------------------
# Snapshot diff: dataset-versioning report between two corpus snapshots
# — what entered, what left, what changed in place — the audit a data
# lead reads before promoting a new snapshot (alongside the drift
# report's distribution view, this is the row-identity view). Production
# diffs two snapshot paths; here the snapshots derive in-query (the
# _INCR_EVERY precedent): snapshot A drops every 7th doc, snapshot B has
# every 11th doc's text perturbed — so the report exercises all four
# categories on the synthetic corpus.
#
# Scale shape: content identity via md5 hash projected at scan (never
# the text itself through the join), ONE full-outer equi-join on doc_id,
# and a bounded 4-key aggregate with map-side combine. At 100 TB this is
# the canonical two-snapshot reconciliation plan — no windows, no
# amplification, shuffle keyed by doc_id.
_DIFF_DROP_EVERY = 7      # snapshot A is missing these docs (added in B)
_DIFF_PERTURB_EVERY = 11  # snapshot B rewrote these docs (changed)
_DIFF_B_DROP_EVERY = 13   # snapshot B dropped these docs (removed)


def corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    snap_a = d.filter(F.col("doc_id") % _DIFF_DROP_EVERY != 0).select(
        "doc_id", F.md5("text").alias("h_a")
    )
    snap_b = d.filter(F.col("doc_id") % _DIFF_B_DROP_EVERY != 0).select(
        "doc_id",
        F.md5(
            F.when(
                F.col("doc_id") % _DIFF_PERTURB_EVERY == 0,
                F.concat(F.col("text"), F.lit(" rev2")),
            ).otherwise(F.col("text"))
        ).alias("h_b"),
    )
    status = (
        F.when(F.col("h_a").isNull(), F.lit("added"))
        .when(F.col("h_b").isNull(), F.lit("removed"))
        .when(F.col("h_a") != F.col("h_b"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        snap_a.join(snap_b, "doc_id", "full_outer")
        .select(status.alias("status"))
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("status")
    )


SNAPSHOT_DIFF_ORACLE = f"""
WITH snap_a AS (
  SELECT doc_id, md5(text) AS h_a FROM documents
  WHERE doc_id % {_DIFF_DROP_EVERY} <> 0
),
snap_b AS (
  SELECT doc_id,
         md5(CASE WHEN doc_id % {_DIFF_PERTURB_EVERY} = 0
                  THEN text || ' rev2' ELSE text END) AS h_b
  FROM documents
  WHERE doc_id % {_DIFF_B_DROP_EVERY} <> 0
)
SELECT CASE WHEN h_a IS NULL THEN 'added'
            WHEN h_b IS NULL THEN 'removed'
            WHEN h_a <> h_b THEN 'changed'
            ELSE 'unchanged' END AS status,
       count(*)::BIGINT AS n_docs
FROM snap_a FULL OUTER JOIN snap_b USING (doc_id)
GROUP BY 1 ORDER BY 1
"""


# --------------------------------------------------------------------------
# End-to-end curation funnel: the whole training-data cleaning story as
# ONE verifiable report — raw -> quality/repetition filter -> exact
# dedup -> MinHash-LSH near-dedup -> fuzzy decontamination, with the doc
# and token counts surviving each stage. This is the first table a data
# lead asks for from a curation run ("where did my tokens go?"), and it
# composes four already-verified operator families so the funnel can
# never drift from the stages it summarizes (the oracle composes their
# oracle SQL the same way).
#
# Stage semantics (each evaluated on the docs that survived the previous
# stage; `reached` = number of stages a doc passes):
#   1 quality:        quality_score >= min AND dup_bigram_frac <= max
#                     (textops thresholds, same rounding both engines)
#   2 exact_dedup:    keep the min-doc_id canonical per md5(text) group
#                     AMONG stage-1 survivors (a duplicate of a
#                     quality-dropped doc is itself canonical again)
#   3 near_dedup:     drop every doc_b of a MinHash-LSH candidate pair
#                     (greedy keep-first, the corpus_filter precedent;
#                     pair generation is corpus-global — membership of
#                     the earlier doc is NOT required, matching the
#                     "drop all later colliders" production rule)
#   4 decontaminated: drop every doc the fuzzy 3-gram-containment pass
#                     flags against the bench set
#
# Scale notes (100 TB): three deliberate scans of the documents source —
# signals, shingle->signature (minhash), shingle->containment (decon) —
# because the three token shapes differ and caching a 100 TB projection
# to share one scan would spill forever; columnar re-scan is the cheap
# choice. After that: one window shuffle on the content hash, the two
# victim pipelines' own bounded shuffles, two doc_id equi-joins (victims
# are NOT assumed broadcastable — web-scale near-dup rates run 30%+),
# and a 10-number global partial aggregate. The 5-row output explodes
# from that single aggregate row — no single-partition window anywhere.
_FUNNEL_STAGES = ("raw", "quality", "exact_dedup", "near_dedup",
                  "decontaminated", "source_kept", "classifier_kept")


def corpus_curation_funnel(
    spark: SparkSession, sf_dir: str, materialize_signals: bool = False
) -> DataFrame:
    """Seven-stage curation funnel: per-doc quality gate -> exact dedup
    -> minhash near-dedup -> fuzzy decontamination -> SOURCE-level
    exclusion (the C4/RefinedWeb/FineWeb domain-filtering stage,
    source_quality_report's bottom-quartile rule applied AS A STAGE —
    quality lives at the source too, and a spam domain's individually
    passable survivors get dropped together) -> DISTILLED-CLASSIFIER
    exclusion (the GPT-3/fastText production move: stage 1's own rule
    battery distilled into a Bernoulli-NB token classifier — the
    quality_classifier_distill machinery with the funnel's qk as the
    silver label — and applied to the remaining survivors, dropping
    docs that PASS the rules but token-profile like rule-failers; that
    generalization beyond the rule battery is the reason production
    pipelines run a classifier stage at all; the stage's > 1.0 cut is
    the deployed default whose operating-point table is
    textops.classifier_threshold_curve — the knob a deployment reads
    to move the cut). The source and classifier
    rules are computed over the WHOLE corpus (failers included — a
    source's mean quality, and the classifier's model, are properties
    of everything that was shipped, not of the survivors), so they land
    last in the reported order: they are the stages whose decisions
    need global statistics rather than per-doc state, which is also why
    the streaming twin applies both retrospectively at report time over
    the landed horizon (the classifier's model rebuilt exactly from
    per-batch integer sufficient statistics).

    `materialize_signals=True` persists the tokenized signal projection
    DISK_ONLY for the returned (lazy) plan's consumers; the CALLER owns
    that cache's lifetime — unpersist it (spark.catalog.clearCache() or
    the persisted plan's own handle) after the consuming action, or
    repeated invocations in one session accumulate disk-backed RDDs
    (ADVICE r10). The default (off, measured tie at sf0.1/10x) has no
    cache to manage."""
    from .dedup import dedup_minhash_lsh
    from .textops import (
        _FILTER_MAX_DUP_BIGRAM,
        _FILTER_MIN_QUALITY,
        quality_signals_of,
    )

    # ONE signal frame carries source through (keep=), so the source
    # stage needs no separate documents scan or doc->source join: the
    # per-source rollup and the per-doc funnel both branch off this
    # subtree (AQE recomputes the branch — one extra scan, vs three for
    # calling source_quality_report + a docsrc attach). NULL source
    # coalesces to the '' sentinel BEFORE either consumer: the stage-5
    # attach is an equi-join on source, and NULL would silently drop
    # the document from every stage including 'raw' (ADVICE r8) — the
    # sentinel ranks such docs as one ordinary source instead.
    sig = quality_signals_of(
        table(spark, sf_dir, "documents"), keep=("source",), with_toks=True
    ).withColumn("source", F.coalesce(F.col("source"), F.lit("")))
    if materialize_signals:
        # A/B knob (r9 verdict item 6): spend one disk-backed
        # materialization of the tokenized signal projection to stop
        # AQE recomputing the sig subtree per consumer (5 branches).
        # MEASURED (end-to-end build+run, min of 3, clean box): sf0.1
        # rescan 3.47 s vs materialized 3.29 s; 10x probe corpus 11.48
        # vs 11.53 s — a tie at both points, so the re-scan default
        # stands (columnar re-scan of a pruned projection costs what
        # the disk write saves; a corpus-sized materialization at
        # 100 TB would also spend cluster disk). The knob remains for
        # corpora where the scan itself dominates (wide docs, remote
        # storage).
        from pyspark import StorageLevel

        sig = sig.persist(StorageLevel.DISK_ONLY)
    qk = (F.col("quality_score") >= _FILTER_MIN_QUALITY) & (
        F.col("dup_bigram_frac") <= _FILTER_MAX_DUP_BIGRAM
    )
    # canonical = min doc_id over the content-hash group COUNTING ONLY
    # quality survivors: one window on h, no survivor re-join
    flagged = sig.select(
        "doc_id",
        "n_tokens",
        "source",
        qk.alias("qk"),
        F.min(F.when(qk, F.col("doc_id")))
        .over(Window.partitionBy("h"))
        .alias("canon"),
    )
    ndv = (
        dedup_minhash_lsh(spark, sf_dir)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
        .withColumn("nd", F.lit(1))
    )
    dcv = (
        decontaminate_fuzzy(spark, sf_dir)
        .select("doc_id")
        .distinct()
        .withColumn("dc", F.lit(1))
    )
    # bounded source-exclusion table (one row per source), broadcast —
    # the SAME ranking rule as source_quality_report, derived from this
    # funnel's own signal frame (identical expressions, so the oracle's
    # single sig CTE serves both consumers)
    srck = (
        sig.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(
                F.sum(F.col("quality_score").cast("decimal(18,6)")).cast(
                    "double"
                )
                / F.count(F.lit(1)),
                4,
            ).alias("mean_quality"),
        )
        .select(
            "source",
            F.row_number()
            .over(Window.orderBy("mean_quality", "source"))
            .alias("q_rank"),
            F.count(F.lit(1)).over(Window.partitionBy()).alias("n_sources"),
        )
        .select(
            "source",
            (
                F.col("q_rank") * _SRC_DROP_DEN
                > F.col("n_sources") * _SRC_DROP_NUM
            )
            .cast("int")
            .alias("kept"),
        )
    )
    # stage-6 classifier: distill the stage-1 rule battery (silver = qk
    # over ALL docs) into Bernoulli NB over per-doc distinct tokens —
    # quality_classifier_distill's exact numeric discipline (one-IEEE-op
    # rational likelihood ratios, DECIMAL-accumulated per-doc mean,
    # round 6, threshold > 1). Terms branch off the SAME signal subtree
    # (with_toks carries the token projection; qk rides along — no
    # separate documents scan and no label join-back), and the model is
    # localCheckpoint-ed (vocab-bounded — the bigram-LM/kmeans
    # precedent), so the scoring join re-runs the signal scan once
    # instead of rebuilding the model per consumer.
    dterms = sig.select(
        "doc_id",
        qk.cast("int").alias("y"),
        F.explode(F.array_distinct(F.col("toks"))).alias("term"),
    )
    classes = flagged.agg(
        F.sum(F.col("qk").cast("int")).cast("long").alias("nk"),
        (F.count(F.lit(1)) - F.sum(F.col("qk").cast("int")))
        .cast("long")
        .alias("nd_"),
    )
    cmodel = dterms.groupBy("term").agg(
        F.sum("y").cast("long").alias("ck"),
        (F.count(F.lit(1)) - F.sum("y")).cast("long").alias("cd"),
    ).localCheckpoint()
    w = (
        ((F.col("ck") + 1) * (F.col("nd_") + 2))
        / ((F.col("cd") + 1) * (F.col("nk") + 2))
    ).cast("double")
    nbk = (
        dterms.select("doc_id", "term")
        .join(cmodel, "term")
        .crossJoin(F.broadcast(classes))
        .select("doc_id", w.alias("w"))
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum(F.col("w").cast("decimal(25,10)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("nb_score")
        )
        .select("doc_id", (F.col("nb_score") > 1.0).alias("nbk"))
    )
    reached_col = (
        F.when(~F.col("qk"), F.lit(0))
        .when(F.col("doc_id") != F.col("canon"), F.lit(1))
        .when(F.col("nd").isNotNull(), F.lit(2))
        .when(F.col("dc").isNotNull(), F.lit(3))
        .when(F.col("kept") == 0, F.lit(4))
        .when(~F.coalesce(F.col("nbk"), F.lit(False)), F.lit(5))
        .otherwise(F.lit(6))
    )
    # nbk attaches LEFT: a doc with no distinct terms (NULL text) has no
    # classifier verdict, and an inner join would silently drop it from
    # every stage including 'raw' — the same failure class as the
    # NULL-source drop (ADVICE r8/r9). A missing verdict coalesces to
    # drop-at-the-classifier-stage; unreachable in practice (NULL text
    # scores quality 0.0 and exits at stage 0 first), but the raw count
    # must still see the doc.
    reached = (
        flagged.join(ndv, "doc_id", "left")
        .join(dcv, "doc_id", "left")
        .join(F.broadcast(srck), "source")
        .join(nbk, "doc_id", "left")
        .select("n_tokens", reached_col.alias("reached"))
    )
    agg = reached.agg(
        *[
            F.coalesce(
                F.sum(F.when(F.col("reached") >= s, F.lit(1))), F.lit(0)
            )
            .cast("long")
            .alias(f"d{s}")
            for s in range(len(_FUNNEL_STAGES))
        ],
        *[
            F.coalesce(
                F.sum(F.when(F.col("reached") >= s, F.col("n_tokens"))),
                F.lit(0),
            )
            .cast("long")
            .alias(f"t{s}")
            for s in range(len(_FUNNEL_STAGES))
        ],
    )
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(s).cast("int").alias("stage_ord"),
                    F.lit(name).alias("stage"),
                    F.col(f"d{s}").alias("n_docs"),
                    F.col(f"t{s}").alias("n_tokens"),
                )
                for s, name in enumerate(_FUNNEL_STAGES)
            ]
        )
    )
    return agg.select(rows.alias("r")).select("r.*").orderBy("stage_ord")


def _curation_funnel_oracle() -> str:
    from .dedup import _minhash_oracle
    from .textops import (
        _FILTER_MAX_DUP_BIGRAM,
        _FILTER_MIN_QUALITY,
        QUALITY_SIG_SQL,
    )

    stage_values = ", ".join(
        f"({s}, '{name}')" for s, name in enumerate(_FUNNEL_STAGES)
    )
    return f"""
WITH sig AS ({QUALITY_SIG_SQL}),
flagged AS (
  SELECT doc_id, n_tokens, qk,
         min(CASE WHEN qk THEN doc_id END) OVER (PARTITION BY h) AS canon
  FROM (
    SELECT *,
           (quality_score >= {_FILTER_MIN_QUALITY}
            AND dup_bigram_frac <= {_FILTER_MAX_DUP_BIGRAM}) AS qk
    FROM sig
  )
),
ndv AS (SELECT DISTINCT doc_b AS doc_id FROM ({_minhash_oracle()})),
dcv AS (SELECT DISTINCT doc_id FROM ({DECON_FUZZY_ORACLE})),
srcper AS (
  SELECT coalesce(d.source, '') AS source, count(*)::BIGINT AS n_docs,
         round(sum(CAST(s.quality_score AS DECIMAL(18,6)))::DOUBLE
               / count(*), 4) AS mean_quality
  FROM sig s JOIN documents d USING (doc_id)
  GROUP BY coalesce(d.source, '')
),
srck AS (
  SELECT source,
         CASE WHEN q_rank * {_SRC_DROP_DEN} > n_sources * {_SRC_DROP_NUM}
              THEN 1 ELSE 0 END AS kept
  FROM (
    SELECT source,
           row_number() OVER (ORDER BY mean_quality, source) AS q_rank,
           count(*) OVER () AS n_sources
    FROM srcper
  )
),
cterms AS (
  SELECT d.doc_id, f.qk::INT AS y,
         unnest(list_distinct(regexp_split_to_array(trim(d.text), '\\s+')))
           AS term
  FROM documents d JOIN (SELECT doc_id, qk FROM flagged) f USING (doc_id)
),
ccls AS (
  SELECT sum(y)::BIGINT AS nk, (count(*) - sum(y))::BIGINT AS nd_
  FROM (SELECT qk::INT AS y FROM flagged)
),
cmodel AS (
  SELECT term, sum(y)::BIGINT AS ck, (count(*) - sum(y))::BIGINT AS cd
  FROM cterms GROUP BY term
),
nbk AS (
  SELECT doc_id,
         (round(sum(((((ck + 1) * (nd_ + 2))::DOUBLE
                      / ((cd + 1) * (nk + 2))))::DECIMAL(25,10))::DOUBLE
                / count(*), 6) > 1.0) AS nbk
  FROM cterms t JOIN cmodel USING (term), ccls
  GROUP BY t.doc_id
),
reached AS (
  SELECT f.n_tokens,
         CASE WHEN NOT f.qk THEN 0
              WHEN f.doc_id <> f.canon THEN 1
              WHEN n.doc_id IS NOT NULL THEN 2
              WHEN c.doc_id IS NOT NULL THEN 3
              WHEN k.kept = 0 THEN 4
              WHEN NOT coalesce(b.nbk, false) THEN 5
              ELSE 6 END AS reached
  FROM flagged f
  LEFT JOIN ndv n USING (doc_id)
  LEFT JOIN dcv c USING (doc_id)
  JOIN documents d USING (doc_id)
  JOIN srck k ON k.source = coalesce(d.source, '')
  LEFT JOIN nbk b USING (doc_id)
)
SELECT s.stage_ord, s.stage,
       -- count(r.reached), NOT count(r.n_tokens): a NULL-text doc has
       -- NULL n_tokens but a real reached value, and must count as a
       -- document at every stage it reaches (ADVICE r9)
       count(r.reached)::BIGINT AS n_docs,
       coalesce(sum(r.n_tokens), 0)::BIGINT AS n_tokens
FROM (VALUES {stage_values}) AS s(stage_ord, stage)
LEFT JOIN reached r ON r.reached >= s.stage_ord
GROUP BY s.stage_ord, s.stage
ORDER BY s.stage_ord
"""


# --------------------------------------------------------------------------
# Source-level curation (the domain-filtering stage of C4/RefinedWeb/
# FineWeb pipelines: quality lives at the SOURCE, not only the document
# — a spam domain's individually-passable pages still get dropped
# together). Per-source roll-up of the row-local quality signals, then
# a RELATIVE rule: the bottom quarter of sources by mean quality is
# flagged for exclusion ("drop the worst domains", the form such rules
# actually take — absolute thresholds rot as the corpus mix shifts).
#
# Determinism: means accumulate in DECIMAL (order-free) and divide as
# doubles; the rank orders by (rounded mean quality, source) — total
# order, no float ties; the keep decision is the INTEGER comparison
# rank * DEN > n_sources (rank > n/4 with the division cleared), so
# both engines flag identical sources.
#
# 100 TB shape: one narrow signal pass + one groupBy(source); the
# source table is bounded (domains, not documents), so the rank window
# runs over a bounded frame (the audit's bounded-key class).
_SRC_DROP_NUM = 1
_SRC_DROP_DEN = 4


def source_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .textops import quality_signals_of

    # same NULL->'' sentinel as the funnel's stage-5 rule: a NULL source
    # must rank as an ordinary source (and the rank window's source
    # tiebreak must not hit the engines' opposite NULL orderings)
    sig = quality_signals_of(
        table(spark, sf_dir, "documents"), keep=("source",)
    ).withColumn("source", F.coalesce(F.col("source"), F.lit("")))
    per = sig.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(
            F.sum(F.col("quality_score").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)),
            4,
        ).alias("mean_quality"),
        F.round(
            F.sum(F.col("dup_bigram_frac").cast("decimal(18,6)")).cast(
                "double"
            )
            / F.count(F.lit(1)),
            4,
        ).alias("mean_dup_bigram"),
    )
    ranked = per.select(
        "*",
        F.row_number()
        .over(Window.orderBy("mean_quality", "source"))
        .alias("q_rank"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n_sources"),
    )
    return (
        ranked.select(
            "source",
            "n_docs",
            "mean_quality",
            "mean_dup_bigram",
            "q_rank",
            (
                F.col("q_rank") * _SRC_DROP_DEN
                > F.col("n_sources") * _SRC_DROP_NUM
            )
            .cast("int")
            .alias("kept"),
        )
        .orderBy("source")
    )


SOURCE_QUALITY_ORACLE = f"""
WITH sig AS ({{sig}}),
with_src AS (
  SELECT s.*, coalesce(d.source, '') AS source
  FROM sig s JOIN documents d USING (doc_id)
),
per AS (
  SELECT source, count(*)::BIGINT AS n_docs,
         round(sum(CAST(quality_score AS DECIMAL(18,6)))::DOUBLE
               / count(*), 4) AS mean_quality,
         round(sum(CAST(dup_bigram_frac AS DECIMAL(18,6)))::DOUBLE
               / count(*), 4) AS mean_dup_bigram
  FROM with_src GROUP BY source
),
ranked AS (
  SELECT *,
         row_number() OVER (ORDER BY mean_quality, source) AS q_rank,
         count(*) OVER () AS n_sources
  FROM per
)
SELECT source, n_docs, mean_quality, mean_dup_bigram, q_rank,
       CASE WHEN q_rank * {_SRC_DROP_DEN} > n_sources * {_SRC_DROP_NUM}
            THEN 1 ELSE 0 END AS kept
FROM ranked ORDER BY source
"""


def _source_quality_oracle() -> str:
    from .textops import QUALITY_SIG_SQL

    return SOURCE_QUALITY_ORACLE.format(sig=QUALITY_SIG_SQL)


QUERIES = [
    QuerySpec("source_quality_report", source_quality_report,
              _source_quality_oracle(),
              "source/domain-level curation: per-source quality rollup "
              "+ bottom-quartile exclusion flags (integer-exact rank "
              "rule)"),
    QuerySpec("interdoc_span_dedup", interdoc_span_dedup,
              INTERDOC_SPAN_ORACLE,
              "C4-style inter-document duplicated-span fraction + scrub"),
    QuerySpec("interdoc_dup_runs", interdoc_dup_runs, INTERDOC_RUNS_ORACLE,
              "maximal cross-doc duplicated runs (per-doc 5-gram "
              "approximation; superseded by interdoc_dup_runs_exact)"),
    QuerySpec("interdoc_dup_runs_exact", interdoc_dup_runs_exact,
              INTERDOC_RUNS_EXACT_ORACLE,
              "EXACT maximal shared-substring runs per doc pair "
              "(DSA-style seed join + diagonal islands; Lee et al. "
              "fidelity, catches >=4-token runs)"),
    QuerySpec("interdoc_dup_doc_report", interdoc_dup_doc_report,
              INTERDOC_DOC_REPORT_ORACLE,
              "per-doc duplicated-region rollup of the exact pair runs "
              "(interval-union sweep) — the scrubber input"),
    QuerySpec("interdoc_scrub_apply", interdoc_scrub_apply,
              INTERDOC_SCRUB_ORACLE,
              "substring-scrub APPLY: keep-first-occurrence, cut b-side "
              "run intervals, reassemble surviving tokens in order"),
    QuerySpec("token_budget_select", token_budget_select,
              TOKEN_BUDGET_ORACLE,
              "fill a token budget best-quality-first (two-phase cumsum)"),
    QuerySpec("global_shuffle_shard", global_shuffle_shard,
              GLOBAL_SHUFFLE_ORACLE,
              "deterministic global training shuffle + round-robin shards"),
    QuerySpec("embedding_quantize_int8", embedding_quantize_int8,
              EMBED_QUANT_ORACLE,
              "per-vector int8 max-abs quantization + reconstruction error"),
    QuerySpec("decontaminate_fuzzy", decontaminate_fuzzy,
              DECON_FUZZY_ORACLE,
              "paraphrase-robust eval decontamination by 3-gram containment"),
    QuerySpec("doc_unigram_surprisal", doc_unigram_surprisal,
              DOC_SURPRISAL_ORACLE,
              "unigram-LM surprisal quality score (rational, ln-free)"),
    QuerySpec("ccnet_perplexity_buckets", ccnet_perplexity_buckets,
              CCNET_BUCKETS_ORACLE,
              "CCNet head/middle/tail per-lang LM-score terciles via the "
              "two-phase bounded-bucket rank (no per-lang sort)"),
    QuerySpec("kmeans_lloyd_clusters", kmeans_lloyd_clusters, KMEANS_ORACLE,
              "iterative Lloyd k-means, driver-held O(k*d) model state "
              "(oracle: the 3 iterations unrolled as CTE stages)"),
    QuerySpec("embedding_pq_assign", embedding_pq_assign, EMBED_PQ_ORACLE,
              "product-quantization codes + decimal-exact error (8x16)"),
    QuerySpec("hybrid_search_rrf", hybrid_search_rrf, HYBRID_RRF_ORACLE,
              "hybrid retrieval fusion: reciprocal-rank fusion (k=60) "
              "of the BM25 lexical top-k and the dense cosine top-k "
              "over the shared bounded query workload — rank "
              "full-outer join + bounded per-query top-k window"),
    QuerySpec("hybrid_search_rrf_ivf", hybrid_search_rrf_ivf,
              _hybrid_rrf_ivf_oracle(),
              "hybrid RRF with the dense side list-pruned (IVF "
              "nprobe=3 + exact re-rank inside probed lists) — the "
              "deployable fusion: same lexical parent, same rrf_fuse, "
              "dense side touches nprobe/k of the corpus"),
    QuerySpec("hybrid_fusion_agreement_report",
              hybrid_fusion_agreement_report,
              _hybrid_agreement_oracle(),
              "per-query agreement of the list-pruned fusion vs its "
              "brute-force parent: overlap@k + top-1 agreement — the "
              "acceptance table next to the scaling exponents"),
    QuerySpec("bm25_keyword_search", bm25_keyword_search, BM25_SEARCH_ORACLE,
              "BM25 top-k keyword retrieval (rational log-free idf)"),
    QuerySpec("bm25_index_served_lww", bm25_index_served_lww,
              BM25_INDEX_SERVED_LWW_ORACLE,
              "update/delete serving certificate: land corpus + an "
              "update/tombstone wave into the real postings/docmeta "
              "store, fold wave 1, serve via snapshot-corrected stats "
              "and the tail mask; oracle = BM25 over the LWW CTE"),
    QuerySpec("hybrid_index_served_lww", hybrid_index_served_lww,
              _hybrid_served_lww_oracle(),
              "the dense twin: six-store hybrid state with a "
              "cid-moving embedding update wave, folded + tail-masked "
              "serve; oracle = BM25-over-LWW-docs fused with "
              "IVF-over-LWW-embeddings under original-corpus "
              "centroids"),
    QuerySpec("funnel_sigstore_served_lww", funnel_sigstore_served_lww,
              _funnel_sigstore_served_oracle(),
              "the dedup-store serving certificate: land corpus + an "
              "update/tombstone wave into the real funnel signature "
              "store + ledger via the stream's kernels, fold wave 1 "
              "(physical LWW drop), serve the store's implied near-dup "
              "pairs through the tail mask; oracle = the banded minhash "
              "pair SQL over the LWW CTE"),
    QuerySpec("funnel_landed_served_lww", funnel_landed_served_lww,
              _FUNNEL_LANDED_SERVED_ORACLE,
              "the PRODUCT-SINK serving certificate: land corpus + an "
              "update/tombstone wave into the real funnel ledger + "
              "landing sink, fold wave 1 with out_dir (physical drop "
              "of tombstoned/superseded landed files), serve "
              "landed_documents_current through the tail mask; oracle "
              "= the LWW corpus CTE over the text payload"),
    QuerySpec("corpus_curation_funnel", corpus_curation_funnel,
              _curation_funnel_oracle(),
              "end-to-end curation funnel: quality -> exact dedup -> "
              "minhash near-dedup -> decontamination survivor report"),
    QuerySpec("corpus_drift_report", corpus_drift_report, DRIFT_ORACLE,
              "distribution-drift report (TV distance + chi-square, "
              "ln-free) between corpus slices"),
    QuerySpec("corpus_snapshot_diff", corpus_snapshot_diff,
              SNAPSHOT_DIFF_ORACLE,
              "dataset-versioning diff: added/removed/changed/unchanged "
              "via one full-outer hash reconciliation"),
    QuerySpec("vocab_typo_pairs", vocab_typo_pairs, VOCAB_TYPO_ORACLE,
              "edit-distance-1 typo pairs via the deletion-neighborhood "
              "equi-join (FastSS/SymSpell shape, no all-pairs)"),
    QuerySpec("doc_ngram_novelty", doc_ngram_novelty, NGRAM_NOVELTY_ORACLE,
              "per-doc first-occurrence n-gram novelty (curriculum/"
              "data-ordering signal)"),
]
