"""Property tests for the round-4 training-data operators.

Oracle exactness is covered by tools/verify_local.py / the driver; these
pin the semantic properties a consumer relies on (importance weights
separate the target domain, BPE merge counts are monotone, LM scores are
proper inverse probabilities, the JL projection preserves norms in
expectation).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from kafka_flink_slack_pipeline_spark.operators.training import (
    _BPE_MERGES,
    _DSIR_TARGET_LANG,
    _KMV_K,
    _LM_KEEP_BELOW,
    _RP_OUT_DIM,
    bpe_apply_compression,
    bpe_learn_merges,
    doc_bigram_lm_score,
    dsir_importance_weights,
    embedding_random_projection,
    term_cardinality_kmv,
)
from kafka_flink_slack_pipeline_spark.tables import table


def test_dsir_separates_target_domain(spark, sf_dir):
    w = dsir_importance_weights(spark, sf_dir)
    d = table(spark, sf_dir, "documents").select("doc_id", "lang")
    by_lang = {
        r.lang: r.mw
        for r in w.join(d, "doc_id")
        .groupBy("lang")
        .agg(F.avg("log_weight").alias("mw"))
        .collect()
    }
    # the target domain's mean importance weight beats every other lang's
    target = by_lang.pop(_DSIR_TARGET_LANG)
    assert target > 0
    assert all(target > v for v in by_lang.values())
    # keep is exactly the positive-log-weight predicate
    assert w.filter(F.col("keep") != (F.col("log_weight") > 0)).count() == 0
    # uni+bigram featurization: n_feats == 2*n_tokens - 1
    toks = table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split(F.trim("text"), "\\s+")).alias("n")
    )
    bad = (
        w.join(toks, "doc_id")
        .filter(F.col("n_feats") != 2 * F.col("n") - 1)
        .count()
    )
    assert bad == 0


def test_bpe_merges_are_monotone_and_well_formed(spark, sf_dir):
    rows = bpe_learn_merges(spark, sf_dir).collect()
    assert [r.rank for r in rows] == list(range(1, _BPE_MERGES + 1))
    for r in rows:
        assert r.merged == r.lhs + r.rhs
        assert r.pair_count > 0
    # the max pair count can never increase after a merge: each merge only
    # removes occurrences of existing pairs, and pairs involving the new
    # symbol are bounded by the merged pair's own count
    counts = [r.pair_count for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_bpe_driver_learner_matches_distributed_loop(spark, sf_dir):
    """The driver-held incremental learner (production path, 32k-merge
    regime) and the one-job-per-merge distributed loop must agree
    merge-for-merge — same pairs, same counts, same tie-breaks. Run at a
    reduced merge count to keep the distributed variant's per-merge jobs
    affordable in a test."""
    from kafka_flink_slack_pipeline_spark.operators.training import (
        _learn_merges,
        _learn_merges_distributed,
    )

    n = 12
    assert _learn_merges(spark, sf_dir, n) == \
        _learn_merges_distributed(spark, sf_dir, n)


def test_bpe_learner_exhaustion_raises():
    """Asking for more merges than the corpus supports must fail loudly
    (a silent short vocab would desync apply-side replace chains)."""
    import pytest

    from kafka_flink_slack_pipeline_spark.operators.training import (
        _learn_merges_local,
    )

    with pytest.raises(ValueError, match="exhausted"):
        _learn_merges_local([("ab", 3)], 2)  # only one pair exists
    # exactly-at-ceiling works and reports the true count
    got = _learn_merges_local([("ab", 3)], 1)
    assert got == [(1, "a", "b", "ab", 3)]


def test_bigram_lm_scores_are_inverse_probabilities(spark, sf_dir):
    s = doc_bigram_lm_score(spark, sf_dir)
    # every per-doc mean inverse probability is >= 1 (each bigram term is
    # (c1+V)/(c2+1) with c1 >= c2, V >= 1)
    assert s.filter(F.col("avg_inv_prob") < 1.0).count() == 0
    assert (
        s.filter(
            F.col("keep") != (F.col("avg_inv_prob") < F.lit(_LM_KEEP_BELOW))
        ).count()
        == 0
    )
    # docs have n_tokens - 1 bigrams
    toks = table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split(F.trim("text"), "\\s+")).alias("n")
    )
    assert (
        s.join(toks, "doc_id")
        .filter(F.col("n_bigrams") != F.col("n") - 1)
        .count()
        == 0
    )


def test_bpe_apply_compresses_every_language(spark, sf_dir):
    rows = bpe_apply_compression(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # merges only ever shrink the symbol sequence, so the encoded
        # corpus has at most one token per char and strictly fewer after
        # 6 merges on this corpus
        assert r.total_tokens < r.total_chars
        assert r.chars_per_token > 1.0
        assert r.n_words > 0


def test_kmv_sketch_is_consistent(spark, sf_dir):
    rows = term_cardinality_kmv(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.kmv_k == _KMV_K
        assert r.kmv_estimate > 0
        # the published estimator error bound is ~1/sqrt(K-2); allow a
        # generous multiple for the tiny per-lang vocabularies here
        assert r.rel_error == round(
            abs(r.kmv_estimate - r.n_distinct_exact) / r.n_distinct_exact, 6
        )
        if r.n_distinct_exact <= _KMV_K:
            assert r.rel_error == 0.0


def test_sliding_chunks_cover_and_overlap(spark, sf_dir):
    from kafka_flink_slack_pipeline_spark.operators.training import (
        _CHUNK_STRIDE,
        _CHUNK_TOKENS,
        doc_chunk_sliding,
    )

    chunks = doc_chunk_sliding(spark, sf_dir)
    toks = table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split(F.trim("text"), "\\s+")).alias("n")
    )
    rows = (
        chunks.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("n_tokens").alias("tok_rows"),
            F.max("n_tokens").alias("max_len"),
        )
        .join(toks, "doc_id")
        .collect()
    )
    assert rows
    for r in rows:
        # chunk count is exactly ceil over stride; no chunk exceeds the size
        assert r.n_chunks == (r.n - 1) // _CHUNK_STRIDE + 1
        assert r.max_len <= _CHUNK_TOKENS
        # every token appears in >= 1 chunk; overlapped tokens appear twice
        assert r.tok_rows >= r.n


def test_cms_never_underestimates(spark, sf_dir):
    from kafka_flink_slack_pipeline_spark.operators.training import (
        _CMS_TOPK,
        term_heavy_hitters_cms,
    )

    rows = term_heavy_hitters_cms(spark, sf_dir).collect()
    assert len(rows) == _CMS_TOPK
    for r in rows:
        # CountMin's defining guarantee: estimate >= true count
        assert r.cms_estimate >= r.exact_count
        assert r.overestimate == r.cms_estimate - r.exact_count
    # top-k comes out in exact-count order
    counts = [r.exact_count for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_random_projection_preserves_norms_in_expectation(spark, sf_dir):
    p = embedding_random_projection(spark, sf_dir)
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.aggregate(
            F.transform("embedding", lambda x: x.cast("double") * x),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("norm2"),
    )
    proj_norm2 = sum(
        F.col(f"p{j:02d}") * F.col(f"p{j:02d}") for j in range(_RP_OUT_DIM)
    )
    ratios = (
        p.select("vec_id", proj_norm2.alias("pn2"))
        .join(e, "vec_id")
        .select((F.col("pn2") / F.col("norm2")).alias("ratio"))
        .agg(F.avg("ratio").alias("mean_ratio"))
        .collect()[0]
    )
    # E[||Pv||^2] = ||v||^2 for the ±1/sqrt(k) construction; with k=16 and
    # 500 vectors the dataset mean concentrates well inside [0.6, 1.6]
    assert 0.6 < ratios.mean_ratio < 1.6
    assert not math.isnan(ratios.mean_ratio)


def test_quantile_histogram_bounds_and_monotonicity(spark, sf_dir):
    from kafka_flink_slack_pipeline_spark.operators.training import (
        _QH_BINS,
        _QH_PS,
        token_quantile_histogram,
    )
    from kafka_flink_slack_pipeline_spark.operators.textops import tokens_col
    from kafka_flink_slack_pipeline_spark.tables import table

    rows = token_quantile_histogram(spark, sf_dir).collect()
    assert [r.p for r in rows] == sorted(_QH_PS)
    lens = (
        table(spark, sf_dir, "documents")
        .select(F.size(tokens_col()).alias("n"))
        .collect()
    )
    ns = sorted(r.n for r in lens)
    width = (ns[-1] - ns[0] + 1) / _QH_BINS
    prev_est = prev_exact = None
    for r in rows:
        # exact is the discrete lower-value quantile at rank ceil(p*N)
        import math

        rank = math.ceil(r.p * len(ns))
        assert r.exact_q == ns[rank - 1]
        # the interpolated estimate lands within one bin of the exact value
        assert abs(r.est_q - r.exact_q) <= width + 1e-6
        # quantile curves are monotone in p
        if prev_est is not None:
            assert r.est_q >= prev_est - 1e-9
            assert r.exact_q >= prev_exact
        prev_est, prev_exact = r.est_q, r.exact_q


def test_temperature_resample_upsamples_low_resource(spark, sf_dir):
    from kafka_flink_slack_pipeline_spark.operators.training import (
        _RESAMPLE_BUDGET,
        temperature_resample,
    )
    from kafka_flink_slack_pipeline_spark.tables import table

    rows = temperature_resample(spark, sf_dir).collect()
    assert rows
    got: dict[str, int] = {}
    for r in rows:
        got[r.lang] = got.get(r.lang, 0) + 1
        assert r.pick_rank <= r.target <= r.n  # never oversamples a lang
    assert sum(got.values()) <= _RESAMPLE_BUDGET
    # temperature flattening: selected share of a low-resource language
    # exceeds its corpus share; the highest-resource language's share
    # shrinks (the alpha-sampling contract)
    corpus = {
        r.lang: r.n
        for r in table(spark, sf_dir, "documents")
        .groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    total = sum(corpus.values())
    picked = sum(got.values())
    lo = min(corpus, key=corpus.get)
    hi = max(corpus, key=corpus.get)
    assert got[lo] / picked >= corpus[lo] / total
    assert got[hi] / picked <= corpus[hi] / total


# ---------------------------------------------------------------------------
# Unigram-LM tokenizer


def _naive_viterbi(word, scores):
    """Independent reference segmenter: memoized recursion maximizing the
    integer micro score with the SAME stated tie rule (shortest LAST
    piece on equal score, applied at every suffix boundary). Written
    top-down (the DP in training.py is bottom-up) so a shared indexing
    bug cannot hide."""
    from functools import lru_cache
    from kafka_flink_slack_pipeline_spark.operators.training import (
        _UG_MAX_PIECE,
        _UG_MISS,
    )

    @lru_cache(maxsize=None)
    def solve(i):  # best (score, pieces-tuple in walk-back order) of w[:i]
        if i == 0:
            return 0, ()
        best = None
        for k in range(1, min(_UG_MAX_PIECE, i) + 1):
            sub_score, sub_pcs = solve(i - k)
            sc = scores.get(word[i - k : i], _UG_MISS)
            cand = (sub_score + sc, k)
            if best is None or cand[0] > best[0][0] or (
                cand[0] == best[0][0] and k < best[0][1]
            ):
                best = (cand, (word[i - k : i],) + sub_pcs)
        return best[0][0], best[1]

    score, pcs = solve(len(word))
    # (last_piece,) + sub_pcs above already yields walk-back order —
    # last piece first, training.py's convention
    return score, list(pcs)


def test_unigram_viterbi_matches_naive_reference():
    """DP-for-DP equivalence on randomized corpora: same max score AND
    the same segmentation under the shared tie rule."""
    import random

    from kafka_flink_slack_pipeline_spark.operators.training import (
        _ug_score_micro,
        _ug_viterbi,
    )

    rng = random.Random(6)
    for _ in range(50):
        alphabet = "abcd"
        words = [
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 9)))
            for _ in range(8)
        ]
        # random small vocab: all chars + random substrings
        pieces = set(alphabet)
        for w in words:
            for _ in range(3):
                s = rng.randrange(len(w))
                length = rng.randint(2, 4)
                pieces.add(w[s : s + length])
        total = 100
        scores = {
            p: _ug_score_micro(rng.randint(0, 30), total, len(pieces))
            for p in sorted(pieces)
            if p
        }
        for w in words:
            got = _ug_viterbi(w, scores)
            ref_score, ref_pcs = _naive_viterbi(w, scores)
            assert got == ref_pcs, (w, got, ref_pcs)
            assert sum(scores.get(p) for p in got) == ref_score


def test_unigram_em_reference_equivalence_and_invariants():
    """Vocab-for-vocab: running the EM with the naive reference
    segmenter substituted for the DP must give the IDENTICAL final
    vocabulary, counts, and scores (the bpe driver-vs-distributed
    equivalence precedent). Plus structural invariants: every corpus
    character survives, multi-piece count obeys the final keep size."""
    from kafka_flink_slack_pipeline_spark.operators import training as T

    corpus = [("abab", 5), ("abcab", 3), ("bcbc", 2), ("cab", 4)]
    expected = T._unigram_em(corpus)

    orig = T._ug_viterbi
    try:
        T._ug_viterbi = lambda w, s: _naive_viterbi(w, s)[1]
        via_naive = T._unigram_em(corpus)
    finally:
        T._ug_viterbi = orig
    assert expected == via_naive

    chars = {ch for w, _ in corpus for ch in w}
    vocab_chars = {p for p, is_char, _, _ in expected if is_char}
    assert vocab_chars == chars
    n_multi = sum(1 for _, is_char, _, _ in expected if not is_char)
    assert n_multi <= T._UG_KEEP[-1]
    # scores are log-probs of a (sub-)distribution: negative, finite
    assert all(s < 0 for *_x, s in expected)


def test_unigram_apply_jvm_fold_matches_driver_viterbi(spark, sf_dir):
    """The distributed JVM Viterbi fold must emit the same token totals
    the driver-held segmenter computes from the same learned model —
    the apply path's driver-vs-distributed equivalence."""
    from kafka_flink_slack_pipeline_spark.operators import training as T

    model = T._unigram_model(spark, sf_dir)
    total = sum(cnt for _, _, cnt, _ in model)
    micro = {
        p: T._ug_score_micro(cnt, total, len(model))
        for p, _, cnt, _ in model
    }
    got = {
        r.lang: (r.n_words, r.total_chars, r.total_tokens)
        for r in T.unigram_apply_compression(spark, sf_dir).collect()
    }
    d = table(spark, sf_dir, "documents").select("lang", "text").collect()
    from collections import defaultdict

    agg = defaultdict(lambda: [0, 0, 0])
    for r in d:
        for w in r.text.strip().split():
            if not w:
                continue
            a = agg[r.lang]
            a[0] += 1
            a[1] += len(w)
            a[2] += len(T._ug_viterbi(w, micro))
    assert got == {k: tuple(v) for k, v in agg.items()}
    for lang, (nw, nc, nt) in got.items():
        assert nw <= nt <= nc  # >=1 token/word, <=1 token/char


def test_bloom_no_false_negatives_and_visible_fpr(spark, sf_dir):
    """The two Bloom guarantees, measured: every present probe hits (no
    false negatives — the structural guarantee), and at the test vocab
    (m sized down so collisions are observable, the CMS
    visible-overestimate precedent) at least one absent probe false-
    positives while at least one is correctly rejected."""
    from kafka_flink_slack_pipeline_spark.operators.training import (
        bloom_membership_report,
    )

    rows = bloom_membership_report(spark, sf_dir).collect()
    present = [r for r in rows if r.present == 1]
    absent = [r for r in rows if r.present == 0]
    assert present and absent
    assert all(r.bloom_hit == 1 for r in present)
    assert any(r.bloom_hit == 1 for r in absent)   # visible FPR
    assert any(r.bloom_hit == 0 for r in absent)   # filter still filters
