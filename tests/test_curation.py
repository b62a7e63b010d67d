"""Property tests for the round-3 curation operators.

Oracle exactness is covered by tools/verify_local.py / the driver; these
pin the semantic properties a consumer relies on (permutation-ness,
budget monotonicity, quantization error bounds, k-means invariants).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_flink_slack_pipeline_spark.operators.curation import (
    _BUDGET_TOKENS,
    _KM_K,
    _QUANT_BITS_MAX,
    _SHUF_SHARDS,
    embedding_quantize_int8,
    global_shuffle_shard,
    interdoc_span_dedup,
    kmeans_lloyd_clusters,
    token_budget_select,
)
from kafka_flink_slack_pipeline_spark.tables import table


def test_global_shuffle_is_a_balanced_permutation(spark, sf_dir):
    rows = global_shuffle_shard(spark, sf_dir).collect()
    n = table(spark, sf_dir, "documents").count()
    assert len(rows) == n
    # global_pos is exactly 0..n-1 (a permutation, no gaps or dups)
    assert sorted(r.global_pos for r in rows) == list(range(n))
    # round-robin dealing: shard sizes differ by at most 1
    sizes: dict[int, int] = {}
    for r in rows:
        sizes[r.shard] = sizes.get(r.shard, 0) + 1
        assert r.shard == r.global_pos % _SHUF_SHARDS
        assert r.pos_in_shard == r.global_pos // _SHUF_SHARDS
    assert max(sizes.values()) - min(sizes.values()) <= 1


def test_token_budget_select_is_a_takewhile_prefix(spark, sf_dir):
    rows = token_budget_select(spark, sf_dir).collect()
    assert rows, "budget should admit at least one doc"
    # running sum never exceeds the budget and matches cum_tokens
    running = 0
    prev_key = None
    for r in rows:
        running += r.n_tokens
        assert r.cum_tokens == running <= _BUDGET_TOKENS
        key = (-r.quality_score, r.doc_id)
        assert prev_key is None or prev_key < key  # strictly ordered
        prev_key = key


def test_quantization_error_bounded_by_half_step(spark, sf_dir):
    rows = embedding_quantize_int8(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # symmetric max-abs quantization: error <= (scale/127)/2 + rounding
        assert 0 <= r.max_abs_err <= r.scale / _QUANT_BITS_MAX / 2 + 1e-9
        assert 0 <= r.mean_abs_err <= r.max_abs_err + 1e-12


def test_interdoc_span_fraction_in_range(spark, sf_dir):
    rows = interdoc_span_dedup(spark, sf_dir).collect()
    assert rows
    saw_shared = False
    for r in rows:
        assert 0 <= r.n_shared_spans <= r.n_spans
        # half-ulp tolerance at the 4th decimal: Spark rounds HALF_UP,
        # Python rounds half-even, so a .xxxx5 boundary differs by 1e-4
        assert abs(r.shared_span_frac - r.n_shared_spans / r.n_spans) <= 5.1e-5
        saw_shared = saw_shared or r.n_shared_spans > 0
    assert saw_shared, "corpus should contain organic cross-doc spans"


def test_fuzzy_decontamination_recovers_every_source(spark, sf_dir):
    """Each perturbed bench excerpt must flag its own source document —
    the contamination case the exact-5-gram pass misses entirely."""
    from kafka_flink_slack_pipeline_spark.operators.curation import (
        _FUZZY_EVERY,
        decontaminate_fuzzy,
    )

    hits = {(r.doc_id, r.bench_id)
            for r in decontaminate_fuzzy(spark, sf_dir).collect()}
    n_docs = table(spark, sf_dir, "documents").count()
    sources = {i for i in range(n_docs) if i % _FUZZY_EVERY == 0}
    assert sources, "fixture must seed at least one bench item"
    missing = {b for b in sources if (b, b) not in hits}
    assert not missing, f"bench items whose source went unflagged: {missing}"


def test_bm25_results_are_wellformed_rankings(spark, sf_dir):
    """Every seed query returns a clean 1..k rank prefix with descending
    positive scores, and every hit matched at least one query term.
    (The seed doc itself is NOT asserted into the top-k: BM25's length
    normalization legitimately ranks shorter full-match docs above a
    long seed in this small-vocabulary corpus — correctness of the
    scores is the oracle's job.)"""
    from kafka_flink_slack_pipeline_spark.operators.curation import (
        _BM25_EVERY,
        _BM25_MAX_QUERIES,
        bm25_keyword_search,
    )

    rows = bm25_keyword_search(spark, sf_dir).collect()
    assert rows
    n_docs = table(spark, sf_dir, "documents").count()
    expected_queries = {
        i
        for i in range(min(n_docs, _BM25_EVERY * _BM25_MAX_QUERIES))
        if i % _BM25_EVERY == 0
    }
    by_query: dict[int, list] = {}
    for r in rows:
        by_query.setdefault(r.query_id, []).append(r)
    assert set(by_query) == expected_queries
    for qid, hits in by_query.items():
        assert [h.rank for h in hits] == list(range(1, len(hits) + 1))
        scores = [h.score for h in hits]
        assert scores == sorted(scores, reverse=True)
        assert all(s > 0 for s in scores)
        assert all(h.n_matched_terms >= 1 for h in hits)


def test_bm25_query_workload_bounded_by_doc_id_cap(spark, tmp_path):
    """The r4 boundedness contract: docs at or above EVERY*MAX_QUERIES
    never seed queries, at ANY corpus size — pinned with doc_ids that
    straddle the cap (inert at the shipped SFs, where all ids are below
    it)."""
    from kafka_flink_slack_pipeline_spark.operators.curation import (
        _BM25_EVERY,
        _BM25_MAX_QUERIES,
        bm25_keyword_search,
    )

    cap = _BM25_EVERY * _BM25_MAX_QUERIES
    text = " ".join(f"tok{j}" for j in range(20))
    ids = [0, _BM25_EVERY, cap - _BM25_EVERY, cap, cap + _BM25_EVERY]
    docs = spark.createDataFrame(
        [(i, text) for i in ids], "doc_id bigint, text string"
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    qids = {
        r.query_id
        for r in bm25_keyword_search(spark, str(tmp_path)).collect()
    }
    assert qids == {0, _BM25_EVERY, cap - _BM25_EVERY}


def test_ivfpq_rankings_wellformed_and_bounded_by_exact(spark, sf_dir):
    """IVF-PQ output must be clean 1..5 rankings whose best hit can never
    beat the exact brute-force best (approximation can only lose)."""
    from kafka_flink_slack_pipeline_spark.operators.similarity import (
        cosine_topk_bruteforce,
        cosine_topk_ivfpq,
    )

    approx = cosine_topk_ivfpq(spark, sf_dir).collect()
    assert approx
    exact_best = {
        r.query_id: r.sim
        for r in cosine_topk_bruteforce(spark, sf_dir).collect()
        if r.rank == 1
    }
    by_query: dict[int, list] = {}
    for r in approx:
        by_query.setdefault(r.query_id, []).append(r)
    for qid, hits in by_query.items():
        assert [h.rank for h in hits] == list(range(1, len(hits) + 1))
        sims = [h.sim for h in hits]
        assert sims == sorted(sims, reverse=True)
        assert sims[0] <= exact_best[qid] + 1e-9
        assert all(-1.0 <= h.approx_sim <= 1.0 for h in hits)


def test_kmeans_partitions_all_vectors(spark, sf_dir):
    rows = kmeans_lloyd_clusters(spark, sf_dir).collect()
    n = table(spark, sf_dir, "embeddings").count()
    assert sum(r.n_vecs for r in rows) == n  # every vector assigned once
    assert {r.cid for r in rows} <= set(range(_KM_K))
    assert all(r.inertia >= 0 for r in rows)


def test_kmeans_iterations_do_not_increase_inertia(spark, sf_dir):
    """Lloyd's guarantee: total inertia is non-increasing per iteration."""
    import kafka_flink_slack_pipeline_spark.operators.curation as c

    orig = c._KM_ITERS
    try:
        c._KM_ITERS = 1
        one = sum(r.inertia for r in kmeans_lloyd_clusters(spark, sf_dir).collect())
        c._KM_ITERS = 3
        three = sum(r.inertia for r in kmeans_lloyd_clusters(spark, sf_dir).collect())
    finally:
        c._KM_ITERS = orig
    assert three <= one + 1e-6


def test_dup_runs_are_maximal_and_bounded(spark, sf_dir):
    from kafka_flink_slack_pipeline_spark.operators.curation import (
        _RUN_N,
        interdoc_dup_runs,
    )

    rows = interdoc_dup_runs(spark, sf_dir).collect()
    assert rows, "the planted near-dup docs share >= one 5-gram run"
    for r in rows:
        # every run covers at least one full span; runs are disjoint by
        # construction (islands merge overlapping/adjacent spans), so the
        # duplicated-token total is bounded by the doc itself
        assert r.longest_run >= _RUN_N
        assert r.dup_tokens >= r.n_runs * _RUN_N
        assert 0 < r.dup_frac <= 1.0


def test_curation_funnel_is_monotone_and_consistent(spark, sf_dir):
    from kafka_flink_slack_pipeline_spark.operators.curation import (
        _FUNNEL_STAGES,
        corpus_curation_funnel,
    )
    from kafka_flink_slack_pipeline_spark.operators.textops import (
        _FILTER_MAX_DUP_BIGRAM,
        _FILTER_MIN_QUALITY,
        quality_signal_frame,
    )

    rows = corpus_curation_funnel(spark, sf_dir).collect()
    assert [r.stage for r in rows] == list(_FUNNEL_STAGES)
    # survivor counts and token totals shrink (weakly) stage over stage
    for prev, cur in zip(rows, rows[1:]):
        assert cur.n_docs <= prev.n_docs
        assert cur.n_tokens <= prev.n_tokens
    # raw row matches the source table exactly
    sig = quality_signal_frame(spark, sf_dir)
    total = sig.agg(
        F.count(F.lit(1)).alias("d"), F.sum("n_tokens").alias("t")
    ).first()
    assert rows[0].n_docs == total.d and rows[0].n_tokens == total.t
    # stage-1 counts match an independent recomputation of the gate
    q = sig.filter(
        (F.col("quality_score") >= _FILTER_MIN_QUALITY)
        & (F.col("dup_bigram_frac") <= _FILTER_MAX_DUP_BIGRAM)
    ).count()
    assert rows[1].n_docs == q
    # non-vacuous: the funnel as a whole drops docs, and at least two
    # distinct stages contribute (exact dups may not exist at tiny SFs)
    assert rows[-1].n_docs < rows[0].n_docs
    dropping = sum(
        1 for prev, cur in zip(rows, rows[1:]) if cur.n_docs < prev.n_docs
    )
    assert dropping >= 2


def test_drift_report_properties(spark, sf_dir):
    from kafka_flink_slack_pipeline_spark.operators.curation import (
        corpus_drift_report,
    )

    rows = {r.signal: r for r in corpus_drift_report(spark, sf_dir).collect()}
    assert set(rows) == {"lang", "length"}
    for r in rows.values():
        # TV distance is a metric in [0, 1]; chi2 is non-negative
        assert 0.0 <= r.tv_distance <= 1.0
        assert r.chi2 >= 0.0
        assert r.n_buckets >= 1
    # doc_id parity slices of the same corpus should NOT be drifted:
    # distances sit near zero (sanity of the slice derivation)
    assert rows["lang"].tv_distance < 0.2


def test_snapshot_diff_counts_reconcile(spark, sf_dir):
    from kafka_flink_slack_pipeline_spark.operators.curation import (
        _DIFF_B_DROP_EVERY,
        _DIFF_DROP_EVERY,
        _DIFF_PERTURB_EVERY,
        corpus_snapshot_diff,
    )

    got = {r.status: r.n_docs
           for r in corpus_snapshot_diff(spark, sf_dir).collect()}
    n = table(spark, sf_dir, "documents").count()
    ids = range(n)
    in_a = {i for i in ids if i % _DIFF_DROP_EVERY != 0}
    in_b = {i for i in ids if i % _DIFF_B_DROP_EVERY != 0}
    changed = {i for i in in_a & in_b if i % _DIFF_PERTURB_EVERY == 0}
    expect = {
        "added": len(in_b - in_a),
        "removed": len(in_a - in_b),
        "changed": len(changed),
        "unchanged": len((in_a & in_b) - changed),
    }
    assert got == expect
    # every doc in either snapshot lands in exactly one category
    assert sum(got.values()) == len(in_a | in_b)


def test_typo_pairs_recover_planted_truncations(spark, sf_dir):
    from kafka_flink_slack_pipeline_spark.operators.curation import (
        _TYPO_EVERY,
        _TYPO_MIN_LEN,
        vocab_typo_pairs,
    )

    rows = vocab_typo_pairs(spark, sf_dir).collect()
    assert rows
    docs = {r.doc_id: r.text for r in
            table(spark, sf_dir, "documents").collect()}
    planted = set()
    for doc_id, text in docs.items():
        first = text.strip().split()[0]
        if doc_id % _TYPO_EVERY == 0 and len(first) >= _TYPO_MIN_LEN:
            planted.add(first[:-1])
    found = {(r.typo, r.correction) for r in rows}
    # every planted truncation pairs with its source term
    for t in planted:
        assert any(t in pair for pair in found), t
    # asymmetry rule: the typo is never more frequent than the correction
    for r in rows:
        assert r.typo_freq <= r.correction_freq


def test_ngram_novelty_is_a_prefix_monotone_signal(spark, sf_dir):
    from kafka_flink_slack_pipeline_spark.operators.curation import (
        doc_ngram_novelty,
    )

    rows = doc_ngram_novelty(spark, sf_dir).collect()
    assert rows
    # the first document is 100% novel by construction
    assert rows[0].novelty_frac == 1.0
    total_novel = sum(r.n_novel for r in rows)
    # every distinct corpus shingle is novel exactly once
    from kafka_flink_slack_pipeline_spark.operators.dedup import (
        _word_shingles,
    )
    from kafka_flink_slack_pipeline_spark.operators.textops import tokens_col

    distinct_shingles = (
        table(spark, sf_dir, "documents")
        .select(F.explode(_word_shingles(tokens_col(), 3)).alias("s"))
        .filter(F.col("s") != "")
        .distinct()
        .count()
    )
    assert total_novel == distinct_shingles
    for r in rows:
        assert 0 <= r.n_novel <= r.n_shingles


def test_dup_runs_exact_catches_short_run_the_approximation_misses(
    spark, tmp_path
):
    """Fidelity class (a): a 4-token substring shared between two docs
    has no 5-gram inside it, so interdoc_dup_runs (the per-doc 5-gram
    approximation) reports NOTHING, while the exact seed-chain op must
    report exactly one maximal pair run of length 4 at the right
    positions."""
    from kafka_flink_slack_pipeline_spark.operators.curation import (
        interdoc_dup_runs,
        interdoc_dup_runs_exact,
    )

    docs = spark.createDataFrame(
        [
            (1, "u1 u2 alpha beta gamma delta u3 u4"),
            (2, "v1 v2 v3 alpha beta gamma delta v4"),
        ],
        "doc_id bigint, text string",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    assert interdoc_dup_runs(spark, str(tmp_path)).collect() == []
    got = interdoc_dup_runs_exact(spark, str(tmp_path)).collect()
    assert [(r.doc_a, r.doc_b, r.start_a, r.start_b, r.run_len)
            for r in got] == [(1, 2, 2, 3, 4)]


def test_dup_runs_exact_does_not_merge_across_partners(spark, tmp_path):
    """Fidelity class (b): doc 1 holds two ADJACENT 5-token substrings,
    one shared with doc 2 and one with doc 3 — the merged 10-token
    string occurs in NO other document. The per-doc approximation
    chains them into one bogus 10-token run; the exact op must report
    two separate maximal 5-token pair runs (Lee et al. semantics)."""
    from kafka_flink_slack_pipeline_spark.operators.curation import (
        interdoc_dup_runs,
        interdoc_dup_runs_exact,
    )

    s1 = "a1 a2 a3 a4 a5"
    s2 = "b1 b2 b3 b4 b5"
    docs = spark.createDataFrame(
        [
            (1, f"{s1} {s2}"),
            (2, f"x1 x2 {s1} x3 x4"),
            (3, f"y1 {s2} y2 y3 y4"),
        ],
        "doc_id bigint, text string",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    approx = {r.doc_id: r for r in
              interdoc_dup_runs(spark, str(tmp_path)).collect()}
    # the approximation's documented deviation: one merged 10-token run
    assert approx[1].longest_run == 10 and approx[1].n_runs == 1
    got = [(r.doc_a, r.doc_b, r.start_a, r.start_b, r.run_len)
           for r in interdoc_dup_runs_exact(spark, str(tmp_path)).collect()]
    assert got == [(1, 2, 0, 2, 5), (1, 3, 5, 1, 5)]


def test_dup_doc_report_unions_intervals_across_partners(spark, tmp_path):
    """The per-doc rollup of the exact pair runs: doc 1's two touching
    5-token runs (shared with DIFFERENT partners) merge into one
    10-token covered region (interval union), giving dup_frac 1.0;
    each partner doc reports its own 5-token region."""
    from kafka_flink_slack_pipeline_spark.operators.curation import (
        interdoc_dup_doc_report,
    )

    s1 = "a1 a2 a3 a4 a5"
    s2 = "b1 b2 b3 b4 b5"
    docs = spark.createDataFrame(
        [
            (1, f"{s1} {s2}"),
            (2, f"x1 x2 {s1} x3 x4"),
            (3, f"y1 {s2} y2 y3 y4"),
        ],
        "doc_id bigint, text string",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    got = {r.doc_id: r for r in
           interdoc_dup_doc_report(spark, str(tmp_path)).collect()}
    assert got[1].n_regions == 1 and got[1].dup_tokens == 10
    assert got[1].longest_region == 10 and got[1].dup_frac == 1.0
    assert got[2].n_regions == 1 and got[2].dup_tokens == 5
    assert got[2].dup_frac == 0.5556  # 5 of 9 tokens
    assert got[3].n_regions == 1 and got[3].dup_tokens == 5


def test_scrub_apply_keeps_first_occurrence(spark, tmp_path):
    """The APPLY step: doc 1 (the doc_a side of both pairs) keeps its
    full text; docs 2 and 3 lose exactly their shared 5-token runs and
    reassemble their surviving tokens in order."""
    from kafka_flink_slack_pipeline_spark.operators.curation import (
        interdoc_scrub_apply,
    )

    s1 = "a1 a2 a3 a4 a5"
    s2 = "b1 b2 b3 b4 b5"
    docs = spark.createDataFrame(
        [
            (1, f"{s1} {s2}"),
            (2, f"x1 x2 {s1} x3 x4"),
            (3, f"y1 {s2} y2 y3 y4"),
        ],
        "doc_id bigint, text string",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    got = {r.doc_id: r for r in
           interdoc_scrub_apply(spark, str(tmp_path)).collect()}
    assert got[1].scrubbed_text == f"{s1} {s2}" and got[1].n_scrubbed == 0
    assert got[2].scrubbed_text == "x1 x2 x3 x4" and got[2].n_scrubbed == 5
    assert got[3].scrubbed_text == "y1 y2 y3 y4" and got[3].n_scrubbed == 5


def test_scrub_apply_fully_covered_doc_empties(spark, tmp_path):
    """A later doc that is entirely one shared run scrubs to the empty
    string instead of vanishing from the output."""
    from kafka_flink_slack_pipeline_spark.operators.curation import (
        interdoc_scrub_apply,
    )

    s = "c1 c2 c3 c4 c5 c6"
    docs = spark.createDataFrame(
        [(1, f"pre1 {s} post1"), (2, s)],
        "doc_id bigint, text string",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    got = {r.doc_id: r for r in
           interdoc_scrub_apply(spark, str(tmp_path)).collect()}
    assert got[1].n_scrubbed == 0
    assert got[2].scrubbed_text == "" and got[2].n_tokens_after == 0


def test_source_quality_report_rank_rule(spark, sf_dir):
    """The relative drop rule, pinned: ranks are a permutation of
    1..n_sources, exactly floor(n/4) sources are dropped, and the
    dropped ones are precisely the lowest-ranked quarter."""
    from kafka_flink_slack_pipeline_spark.operators.curation import (
        source_quality_report,
    )

    rows = source_quality_report(spark, sf_dir).collect()
    n = len(rows)
    assert sorted(r.q_rank for r in rows) == list(range(1, n + 1))
    dropped = {r.source for r in rows if r.kept == 0}
    assert len(dropped) == n // 4
    assert dropped == {
        r.source for r in rows if r.q_rank <= n // 4
    }


def test_curation_funnel_counts_null_source_docs(spark, sf_dir, tmp_path):
    """ADVICE r8: the stage-5 source attach is an equi-join — a NULL
    source must coalesce to the '' sentinel instead of silently
    dropping the document from every stage INCLUDING 'raw'. Pinned by
    nulling sources on a corpus slice and checking the Spark funnel
    against its own DuckDB oracle on the same file (stage-0 count must
    equal the full slice)."""
    import duckdb

    from kafka_flink_slack_pipeline_spark.operators.curation import (
        corpus_curation_funnel,
    )
    from kafka_flink_slack_pipeline_spark.plans.registry import all_queries

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .withColumn(
            "source",
            F.when(F.col("doc_id") % 10 == 0, F.lit(None)).otherwise(
                F.col("source")
            ),
        )
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    n_docs = docs.count()

    got = corpus_curation_funnel(spark, str(tmp_path)).collect()
    raw = [r for r in got if r["stage"] == "raw"][0]
    assert raw["n_docs"] == n_docs  # NULL-source docs still counted

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path}/documents.parquet/*.parquet'"
    )
    oracle = all_queries()["corpus_curation_funnel"].oracle
    want = con.execute(oracle).fetchall()
    assert [
        (r["stage_ord"], r["stage"], r["n_docs"], r["n_tokens"]) for r in got
    ] == [tuple(w) for w in want]


def test_curation_funnel_counts_null_text_docs(spark, sf_dir, tmp_path):
    """ADVICE r9: the stage-6 classifier attach was an inner join on the
    verdict — a doc with NULL text explodes to zero distinct terms,
    gets no nbk row, and silently vanished from every stage INCLUDING
    'raw' (the NULL-source failure class one join over). The attach is
    now a left join with a missing verdict coalescing to
    drop-at-the-classifier-stage; pinned by nulling text on a corpus
    slice and checking stage-0 against the full slice, plus the oracle
    row-for-row on the same file."""
    import duckdb

    from kafka_flink_slack_pipeline_spark.operators.curation import (
        corpus_curation_funnel,
    )
    from kafka_flink_slack_pipeline_spark.plans.registry import all_queries

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .withColumn(
            "text",
            F.when(F.col("doc_id") % 10 == 0, F.lit(None)).otherwise(
                F.col("text")
            ),
        )
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    n_docs = docs.count()

    got = corpus_curation_funnel(spark, str(tmp_path)).collect()
    raw = [r for r in got if r["stage"] == "raw"][0]
    assert raw["n_docs"] == n_docs  # NULL-text docs still counted

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path}/documents.parquet/*.parquet'"
    )
    oracle = all_queries()["corpus_curation_funnel"].oracle
    want = con.execute(oracle).fetchall()
    assert [
        (r["stage_ord"], r["stage"], r["n_docs"], r["n_tokens"]) for r in got
    ] == [tuple(w) for w in want]


def test_rrf_fusion_both_lists_and_ordering(spark):
    """RRF arithmetic pinned on planted overlapping ranks: a doc in
    BOTH lists scores 1/(60+r_lex) + 1/(60+r_dense) and outranks every
    single-list doc of comparable ranks; single-list docs carry the
    other system's zero; ties break by doc_id."""
    from kafka_flink_slack_pipeline_spark.operators.curation import (
        _RRF_K,
        rrf_fuse,
    )

    lex = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
        "query_id bigint, doc_id bigint, lex_rank int",
    )
    dense = spark.createDataFrame(
        [(1, 11, 1), (1, 13, 2)],
        "query_id bigint, doc_id bigint, dense_rank int",
    )
    rows = rrf_fuse(lex, dense).collect()
    by_doc = {r.doc_id: r for r in rows}
    assert set(by_doc) == {10, 11, 12, 13}

    # doc 11 is in both lists: two-term sum, flags both set, rank 1
    both = by_doc[11]
    assert (both.in_lex, both.in_dense) == (1, 1)
    assert both.rrf_score == round(
        1.0 / (_RRF_K + 2) + 1.0 / (_RRF_K + 1), 9
    )
    assert both.rank == 1
    # single-list docs: one term only
    assert by_doc[10].rrf_score == round(1.0 / (_RRF_K + 1), 9)
    assert (by_doc[10].in_lex, by_doc[10].in_dense) == (1, 0)
    assert by_doc[13].rrf_score == round(1.0 / (_RRF_K + 2), 9)
    # equal scores (lex rank 1 vs dense rank 1 alone would tie) break
    # by doc_id: doc 10 (lex r1) vs doc 13 (dense r2) differ, but doc
    # 10 vs a dense-r1-only doc would tie — pin the ordering we do
    # have: 11 > 10 > 13 > 12
    assert [r.doc_id for r in sorted(rows, key=lambda r: r.rank)] == [
        11, 10, 13, 12,
    ]


def test_curation_funnel_classifier_stage_drops_rule_passing_junk(
    spark, tmp_path
):
    """Stage 6 (classifier_kept) is the distilled classifier's reason to
    exist: a TRAP doc that PASSES the stage-1 rule battery (length,
    stopwords, no repeated bigrams) but is composed of the junk-class
    vocabulary must be dropped by the NB stage — the generalization
    beyond the rules production classifier stages provide. Junk docs
    fail stage 1 via dup_bigram_frac (their quality_score is 1.0, so
    the source stage stays neutral); the trap interleaves stopwords
    with pool tokens so it shares no 3-gram shingle with anything (the
    near-dup stage cannot touch it)."""
    import duckdb

    from kafka_flink_slack_pipeline_spark.operators.curation import (
        corpus_curation_funnel,
    )
    from kafka_flink_slack_pipeline_spark.plans.registry import all_queries

    stops = ["the", "a", "of", "is", "and"]
    pool = [f"junk{j:02d}" for j in range(25)]
    rows = []
    for d in range(8):  # clean: unique vocabulary, passes everything
        toks = stops + [f"clean{d}x{j:02d}" for j in range(25)]
        rows.append((d, " ".join(toks), "en", "src_clean"))
    for d in range(24):  # junk: the whole pool TWICE -> repeated bigrams
        # fail stage 1 (dup_bigram_frac >> 0.1) with quality_score still
        # 1.0 (keeps the source stage neutral); every pool token appears
        # in EVERY junk doc, so the pool is junk-typical for the model
        toks = [f"u{d:02d}"] + stops + pool + pool
        rows.append((100 + d, " ".join(toks), "en", "src_junk"))
    # the trap: rule-passing surface (right length, stopwords, all
    # bigrams distinct), junk-class vocabulary. Pool REVERSED and
    # stopword-interleaved so it shares no 3-gram shingle with the junk
    # docs — neither near-dup nor decontamination can touch it; only
    # the classifier sees what it is made of.
    trap_toks = []
    for j, t in enumerate(reversed(pool)):
        trap_toks.append(t)
        if j < len(stops):
            trap_toks.append(stops[j])
    rows.append((200, " ".join(trap_toks), "en", "src_trap"))

    docs = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string"
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))

    got = {
        r["stage"]: r for r in corpus_curation_funnel(
            spark, str(tmp_path)
        ).collect()
    }
    assert got["raw"]["n_docs"] == 33
    assert got["quality"]["n_docs"] == 9  # 8 clean + the trap
    # the classifier stage drops EXACTLY the trap among the survivors
    assert (
        got["source_kept"]["n_docs"] - got["classifier_kept"]["n_docs"] == 1
    )
    assert (
        got["source_kept"]["n_tokens"] - got["classifier_kept"]["n_tokens"]
        == 30
    )

    # the oracle agrees row for row on the same file
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path}/documents.parquet/*.parquet'"
    )
    oracle = all_queries()["corpus_curation_funnel"].oracle
    want = con.execute(oracle).fetchall()
    assert [
        (r["stage_ord"], r["stage"], r["n_docs"], r["n_tokens"])
        for r in corpus_curation_funnel(spark, str(tmp_path)).collect()
    ] == [tuple(w) for w in want]


def test_hybrid_ivf_dense_side_is_list_pruned(spark, sf_dir):
    """The fused op's pruning claim, behaviorally: every in_dense doc of
    hybrid_search_rrf_ivf lies inside that query's nprobe probed
    inverted lists, and the pruning is REAL on this corpus — the
    brute-force sibling ranks at least one dense doc OUTSIDE the probed
    lists (so the two ops genuinely differ in candidate reach, which is
    what the fused certificate + this test together pin)."""
    from pyspark.sql import functions as F

    from kafka_flink_slack_pipeline_spark.operators.curation import (
        _BM25_EVERY,
        _BM25_MAX_QUERIES,
        hybrid_search_rrf,
        hybrid_search_rrf_ivf,
    )
    from kafka_flink_slack_pipeline_spark.operators.similarity import (
        IVF_NPROBE,
        _ivf_index,
    )

    seed = (F.col("vec_id") % _BM25_EVERY == 0) & (
        F.col("vec_id") < _BM25_EVERY * _BM25_MAX_QUERIES
    )
    cand, probes = _ivf_index(spark, sf_dir, IVF_NPROBE, query_pred=seed)
    allowed = {
        (r.query_id, r.neighbor_id)
        for r in probes.join(cand, "cid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .collect()
    }
    fused = hybrid_search_rrf_ivf(spark, sf_dir).collect()
    ivf_dense = {(r.query_id, r.doc_id) for r in fused if r.in_dense == 1}
    assert ivf_dense, "fused output carries no dense-ranked docs"
    assert ivf_dense <= allowed, (
        "a dense doc escaped the probed lists: "
        f"{sorted(ivf_dense - allowed)[:5]}"
    )
    brute_dense = {
        (r.query_id, r.doc_id)
        for r in hybrid_search_rrf(spark, sf_dir).collect()
        if r.in_dense == 1
    }
    assert brute_dense - allowed, (
        "brute-force dense never left the probed lists — the pruning "
        "test is vacuous on this corpus; plant a wider one"
    )


def test_hybrid_fusion_agreement_bounds(spark, sf_dir):
    """The acceptance table's invariants: overlap is bounded by both
    fused sizes, overlap_at_k is its k-fraction, top1_agree is a flag —
    and the report is non-vacuous (the two variants genuinely differ
    somewhere on this corpus, else it certifies nothing)."""
    from kafka_flink_slack_pipeline_spark.operators.curation import (
        _RRF_TOPK,
        hybrid_fusion_agreement_report,
    )

    rows = hybrid_fusion_agreement_report(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_overlap <= min(r.n_brute, r.n_ivf)
        assert r.overlap_at_k == round(r.n_overlap / _RRF_TOPK, 6)
        assert r.top1_agree in (0, 1)
    assert any(r.n_overlap < r.n_brute for r in rows), (
        "variants identical everywhere — agreement report vacuous here"
    )
