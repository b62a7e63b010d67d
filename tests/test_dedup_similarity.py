"""Semantic tests for dedup + similarity operators (with injected duplicates —
the testdata documents are all distinct, so dedup needs synthetic positives)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from kafka_flink_slack_pipeline_spark.operators import dedup as D
from kafka_flink_slack_pipeline_spark.operators import similarity as S
from kafka_flink_slack_pipeline_spark.operators.dedup import _word_shingles


def test_exact_dedup_finds_injected_dupes(spark, tmp_path):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, "alpha beta gamma"),
            (3, "ALPHA   beta Gamma"),  # normalized dup of 1/2
            (4, "something else"),
        ],
        "doc_id bigint, text string",
    )
    # exercise the same logic as dedup_exact via a temp parquet dir
    p = str(tmp_path / "documents.parquet")
    docs.write.parquet(p)
    # dedup functions read <sf_dir>/documents.parquet
    groups = D.dedup_exact(spark, str(tmp_path)).collect()
    by_id = {r.doc_id: r for r in groups}
    assert by_id[1].canonical_id == 1 and by_id[2].canonical_id == 1
    assert by_id[2].group_size == 2
    assert by_id[3].group_size == 1  # raw text differs

    # dedup_exact_normalized unions the corpus with perturbed variants
    # (doc_id+1000000): docs 1/2/3 normalize together with their variants
    # (group of 6), doc 4 groups with its own variant (group of 2).
    norm = {r.doc_id: r for r in D.dedup_exact_normalized(spark, str(tmp_path)).collect()}
    assert set(norm) == {1, 2, 3, 4, 1000001, 1000002, 1000003, 1000004}
    assert norm[3].canonical_id == 1 and norm[3].group_size == 6
    assert norm[4].canonical_id == 4 and norm[4].group_size == 2


def test_shingles_guard_short_docs(spark):
    df = spark.createDataFrame([("a b",), ("a b c d",)], "text string")
    out = df.select(
        _word_shingles(F.split("text", " "), 3).alias("sh")
    ).collect()
    assert out[0].sh == []
    assert out[1].sh == ["a b c", "b c d"]


def test_ngram_jaccard_identical_docs(spark, tmp_path):
    base = " ".join(f"w{i}" for i in range(30))
    near = " ".join(f"w{i}" for i in range(29)) + " zz"  # 1 token changed
    docs = spark.createDataFrame(
        [(1, base), (2, base), (3, near), (4, "totally different words here now ok yes")],
        "doc_id bigint, text string",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    pairs = {(r.doc_a, r.doc_b): r.jaccard
             for r in D.dedup_ngram_jaccard(spark, str(tmp_path)).collect()}
    assert pairs[(1, 2)] == 1.0
    assert 0.5 <= pairs[(1, 3)] < 1.0
    assert (1, 4) not in pairs


def test_cosine_topk_self_excluded_and_sorted(spark, sf_dir):
    rows = S.cosine_topk_bruteforce(spark, sf_dir).collect()
    by_q = {}
    for r in rows:
        assert r.query_id != r.neighbor_id
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        sims = [r.sim for r in sorted(rs, key=lambda r: r.rank)]
        assert sims == sorted(sims, reverse=True)
        assert len(rs) == 5


def test_cosine_identical_vector_sim_one(spark):
    from kafka_flink_slack_pipeline_spark.operators.similarity import cosine

    df = spark.createDataFrame([([1.0, 2.0, 3.0], [1.0, 2.0, 3.0])], "a array<double>, b array<double>")
    sim = df.select(cosine(F.col("a"), F.col("b")).alias("s")).collect()[0].s
    assert abs(sim - 1.0) < 1e-12

def test_minhash_lsh_finds_near_dups(spark, tmp_path):
    base = " ".join(f"w{i}" for i in range(40))
    near = " ".join(f"w{i}" for i in range(38)) + " zz yy"  # high jaccard
    docs = spark.createDataFrame(
        [(1, base), (2, base), (3, near),
         (4, "totally different words in this document right here")],
        "doc_id bigint, text string",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    pairs = {(r.doc_a, r.doc_b): r.est_jaccard
             for r in D.dedup_minhash_lsh(spark, str(tmp_path)).collect()}
    assert pairs[(1, 2)] == 1.0  # identical docs: all 16 sig components agree
    assert (1, 3) in pairs       # near-dup shares >=1 band
    assert (1, 4) not in pairs and (2, 4) not in pairs


def test_simhash_identical_docs_hamming_zero(spark, tmp_path):
    base = " ".join(f"tok{i}" for i in range(50))
    docs = spark.createDataFrame(
        [(1, base), (2, base),
         (3, "completely unrelated vocabulary over here friends")],
        "doc_id bigint, text string",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    rows = {(r.doc_a, r.doc_b): r.hamming
            for r in D.dedup_simhash(spark, str(tmp_path)).collect()}
    assert rows[(1, 2)] == 0
    assert (1, 3) not in rows


def test_lsh_ann_recall_vs_bruteforce(spark, sf_dir):
    """Multi-probe LSH at radius 2 should recover most true top-5 neighbors."""
    exact = {(r.query_id, r.neighbor_id)
             for r in S.cosine_topk_bruteforce(spark, sf_dir).collect()}
    approx = {(r.query_id, r.neighbor_id)
              for r in S.cosine_topk_lsh(spark, sf_dir).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"LSH recall {recall:.2f} too low"


def test_ivf_ann_recall_vs_bruteforce(spark, sf_dir):
    """nprobe=3 of 10 Voronoi cells should beat random scan coverage."""
    exact = {(r.query_id, r.neighbor_id)
             for r in S.cosine_topk_bruteforce(spark, sf_dir).collect()}
    approx = {(r.query_id, r.neighbor_id)
              for r in S.cosine_topk_ivf(spark, sf_dir).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.4, f"IVF recall {recall:.2f} too low"


def test_connected_components_known_graph(spark):
    """CC over chain 1-2-3-4, triangle 10-11-12 (+ redundant edge), and
    isolated pair 20-21: min-label propagation must reach the fixpoint
    cluster_id = min(component) for every node."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4),          # chain, diameter 3
         (10, 11), (11, 12), (10, 12),    # triangle
         (20, 21)],                       # pair
        "doc_a bigint, doc_b bigint",
    )
    labels = {r.doc_id: r.label
              for r in D.connected_components(edges).collect()}
    assert labels == {1: 1, 2: 1, 3: 1, 4: 1,
                      10: 10, 11: 10, 12: 10,
                      20: 20, 21: 20}


def test_semantic_dedup_drops_planted_copies_only(spark, sf_dir):
    """SemDeDup verdicts: every drop is a planted copy (vec_id >= 1e6),
    every dropped copy names its lower-id source stats, and no organic
    vector is pruned. Boundary-straddling copies surviving is expected
    (coarse 10-cell codebook)."""
    rows = S.semantic_dedup(spark, sf_dir).collect()
    dropped = [r for r in rows if not r.keep]
    assert dropped, "planted near-dups must produce drops"
    assert all(r.vec_id >= 1_000_000 for r in dropped)
    assert all(r.n_dups >= 1 and r.best_sim >= S.NEARDUP_THRESHOLD
               for r in dropped)
    kept = [r for r in rows if r.keep]
    assert all(r.n_dups == 0 and r.best_sim is None for r in kept)
    # keep-first rule: sources (lowest id of each pair) are all kept
    sources = {r.vec_id - 1_000_000 for r in dropped}
    kept_ids = {r.vec_id for r in kept}
    assert sources <= kept_ids


def test_dedup_recall_report_bounds(spark, sf_dir):
    """Composed metric: counts positive, precision/recall in (0, 1]."""
    r = D.dedup_recall_report(spark, sf_dir).collect()
    assert len(r) == 1
    row = r[0]
    assert row.n_exact > 0 and row.n_approx > 0
    assert row.n_hits <= min(row.n_exact, row.n_approx)
    assert 0.0 < row.precision <= 1.0 and 0.0 < row.recall <= 1.0


def test_minhash_bucket_cap_drops_megadup_buckets(spark, tmp_path, monkeypatch):
    """The r4 safety valve: buckets larger than MINHASH_BUCKET_CAP emit no
    pairs. Pinned by squeezing the cap to 1 — every >=2 bucket is then
    over cap, so the identical-doc pair from the test above must vanish;
    with the default cap it is found. (The oracle applies the same cap,
    so driver parity cannot drift — see DEDUP_MINHASH_LSH_ORACLE.)"""
    base = " ".join(f"w{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, base), (2, base)], "doc_id bigint, text string"
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    assert D.dedup_minhash_lsh(spark, str(tmp_path)).count() == 1
    monkeypatch.setattr(D, "MINHASH_BUCKET_CAP", 1)
    assert D.dedup_minhash_lsh(spark, str(tmp_path)).count() == 0


def test_prefix_join_equals_naive_threshold_join(spark, sf_dir):
    """Prefix filtering is a theorem, not a heuristic: the PPJoin-style
    operator must return BYTE-identical rows to the naive inverted-index
    threshold join on the same corpus (they also share one oracle)."""
    naive = D.dedup_ngram_jaccard(spark, sf_dir).collect()
    pruned = D.dedup_ngram_prefix_join(spark, sf_dir).collect()
    assert naive == pruned
    assert len(naive) > 0  # corpus contains planted near-dups


def test_prefix_join_prunes_stop_shingle_candidates(spark, tmp_path):
    """The point of the df-ascending order: two docs sharing ONLY a
    stop-shingle (present in every doc, so never in any prefix at this
    corpus shape) must not pair, while a true near-dup pair must — and
    exactness must hold even though the stop shingle never enters the
    candidate join."""
    stop = "the common stop"  # one shared 3-gram across all docs
    a = "the common stop alpha beta gamma delta eps zeta eta"
    b = "the common stop alpha beta gamma delta eps zeta theta"
    c = "the common stop one two three four five six seven"
    docs = spark.createDataFrame(
        [(1, a), (2, b), (3, c)], "doc_id bigint, text string"
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    got = {(r.doc_a, r.doc_b): r.jaccard
           for r in D.dedup_ngram_prefix_join(spark, str(tmp_path)).collect()}
    naive = {(r.doc_a, r.doc_b): r.jaccard
             for r in D.dedup_ngram_jaccard(spark, str(tmp_path)).collect()}
    assert got == naive
    assert (1, 2) in got        # true near-dups pair
    assert (1, 3) not in got    # stop-shingle-only overlap: below t
    assert (2, 3) not in got


def test_simhash_bucket_cap_drops_megadup_buckets(spark, tmp_path, monkeypatch):
    """The decade-probe fix, same safety-valve contract as minhash's:
    band buckets larger than SIMHASH_BUCKET_CAP emit no pairs. Squeeze
    the cap to 1 — every >=2 bucket is over cap and the identical-doc
    pairs vanish; with the default cap the capped op matches the exact
    twin. (The oracle applies the same per-(band, bucket) count filter,
    so driver parity cannot drift.)"""
    base = " ".join(f"w{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, base), (2, base), (3, base)], "doc_id bigint, text string"
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    uncapped = D.dedup_simhash(spark, str(tmp_path)).collect()
    assert len(uncapped) == 3  # 3 identical docs -> 3 hamming-0 pairs
    assert D.dedup_simhash_capped(spark, str(tmp_path)).collect() == uncapped
    monkeypatch.setattr(D, "SIMHASH_BUCKET_CAP", 1)
    assert D.dedup_simhash_capped(spark, str(tmp_path)).count() == 0


def test_simhash_wide_subset_of_narrow_and_finds_dups(spark, tmp_path, sf_dir):
    """120-bit simhash: identical docs still pair at hamming 0, and —
    because fp0 reuses EXACTLY the 60-bit op's md5 bits — every wide
    pair is a narrow pair (ham120 = ham60 + ham(extra bits), so
    ham120 <= 3 implies ham60 <= 3): the wide geometry is a strictly
    more precise test, never a different one."""
    base = " ".join(f"w{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, base), (2, base)], "doc_id bigint, text string"
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    got = D.dedup_simhash_wide(spark, str(tmp_path)).collect()
    assert [(r.doc_a, r.doc_b, r.hamming) for r in got] == [(1, 2, 0)]
    wide = {(r.doc_a, r.doc_b)
            for r in D.dedup_simhash_wide(spark, sf_dir).collect()}
    narrow = {(r.doc_a, r.doc_b)
              for r in D.dedup_simhash(spark, sf_dir).collect()}
    assert wide <= narrow


def test_minhash_sig_bands_single_scan_plan(spark, sf_dir):
    """The signature pipeline must appear exactly once in the LSH plan —
    the r4 one-pass contract (scan count == recompute count under
    Spark 4.1 AQE)."""
    plan = (
        D.dedup_minhash_lsh(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("documents.parquet") == 1


def test_mmr_diversifies_against_plain_topk(spark, sf_dir):
    from kafka_flink_slack_pipeline_spark.operators.similarity import (
        _MMR_K,
        cosine_topk_bruteforce,
        cosine_topk_mmr,
    )

    mmr_rows = cosine_topk_mmr(spark, sf_dir).collect()
    assert mmr_rows
    by_q: dict[int, list] = {}
    for r in mmr_rows:
        by_q.setdefault(r.query_id, []).append(r)
    plain = {}
    for r in cosine_topk_bruteforce(spark, sf_dir).collect():
        plain.setdefault(r.query_id, []).append(r)
    assert set(by_q) == set(plain)
    for qid, rows in by_q.items():
        # clean 1..K ranks, no repeats, first pick = most-similar neighbor
        assert [r.rank for r in rows] == list(range(1, _MMR_K + 1))
        assert len({r.neighbor_id for r in rows}) == _MMR_K
        assert rows[0].neighbor_id == plain[qid][0].neighbor_id
        # scores are non-increasing ONLY within what greedy guarantees:
        # each pick maximizes the current objective, so the relevance
        # term bounds every mmr_score by lambda * best sim
        best_sim = plain[qid][0].sim
        assert all(r.mmr_score <= 0.7 * best_sim + 1e-9 for r in rows)


def test_cluster_representatives_pick_best_quality(spark, tmp_path):
    """Two planted near-dup docs + one exact copy form one cluster; the
    representative is the highest-quality member (quality ties break to
    the lowest doc_id), and the member mass covers the whole cluster."""
    base = ["the", "a", "of", "is", "and"] * 5 + [
        f"tok{i}" for i in range(20)
    ]
    twin = list(base)
    twin[-1] = "changedtok"
    lone = ["zz"] * 25
    docs = spark.createDataFrame(
        [
            (1, " ".join(base)),
            (2, " ".join(base)),       # exact copy of 1
            (3, " ".join(twin)),       # near-dup of 1/2
            (9, " ".join(lone)),       # no pair -> no cluster row
        ],
        "doc_id bigint, text string",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    out = D.dedup_cluster_representatives(spark, str(tmp_path)).collect()
    assert len(out) == 1
    row = out[0]
    assert row.n_members == 3
    # all three members share the same (in-range) quality -> lowest id
    assert row.rep_doc_id == 1
    assert row.member_tokens == 45 * 3


def test_method_report_prefix_row_is_exactness_control(spark, sf_dir):
    """The report's prefix_join row is the built-in control: it must
    read precision = recall = 1.0 with n_pairs == n_exact, and every
    method row shares the same n_exact denominator."""
    rows = {r.method: r for r in D.dedup_method_report(spark, sf_dir).collect()}
    assert set(rows) == {
        "minhash_lsh", "simhash_capped", "ngram_capped", "prefix_join"
    }
    pj = rows["prefix_join"]
    assert pj.precision == 1.0 and pj.recall == 1.0
    assert pj.n_pairs == pj.n_exact == pj.n_hits
    n_exact = {r.n_exact for r in rows.values()}
    assert len(n_exact) == 1 and n_exact.pop() > 0


def test_adaptive_routes_high_entropy_corpus_to_prefix_join(spark, sf_dir):
    """On natural(-shaped) text the gate measures zero hot prefix
    postings, so the routed result must be the EXACT prefix join's rows
    with method='prefix_join'."""
    hot, total = D._prefix_hot_gate(spark, sf_dir)
    assert hot * D.ROUTE_HOT_DEN <= total * D.ROUTE_HOT_NUM
    routed = D.dedup_ngram_adaptive(spark, sf_dir).collect()
    assert routed and all(r.method == "prefix_join" for r in routed)
    exact = D.dedup_ngram_prefix_join(spark, sf_dir).collect()
    assert [(r.doc_a, r.doc_b, r.n_common, r.jaccard) for r in routed] == [
        (r.doc_a, r.doc_b, r.n_common, r.jaccard) for r in exact
    ]


def test_adaptive_routes_flat_vocab_corpus_to_capped_path(spark, tmp_path):
    """The r5 probe's superlinear regime, now routed in CODE: a corpus
    whose prefix postings are dominated by over-cap shingles (52
    identical low-entropy docs) must take the bounded df-capped path —
    and the pair that path CAN see (two docs sharing rare shingles)
    must still come out. The DuckDB oracle computes the same integer
    gate, so the routing decision is cross-engine-checked here too."""
    import duckdb

    flat = " ".join(f"tok{i % 4}" for i in range(30))
    rows = [(i, flat) for i in range(1, 53)] + [
        (100, "alpha beta gamma delta eps zeta eta"),
        (101, "alpha beta gamma delta eps zeta theta"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    hot, total = D._prefix_hot_gate(spark, str(tmp_path))
    assert hot * D.ROUTE_HOT_DEN > total * D.ROUTE_HOT_NUM
    routed = D.dedup_ngram_adaptive(spark, str(tmp_path)).collect()
    assert routed and all(r.method == "ngram_capped" for r in routed)
    assert {(r.doc_a, r.doc_b) for r in routed} == {(100, 101)}

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path}/documents.parquet/*.parquet'"
    )
    oracle = con.execute(D.DEDUP_NGRAM_ADAPTIVE_ORACLE).fetchall()
    assert [(r[0], r[1], r[4]) for r in oracle] == [
        (100, 101, "ngram_capped")
    ]


@pytest.mark.slow
def test_ivf_nprobe_curve_is_monotone_and_anchored(spark, sf_dir):
    """Recall@5 must be monotone non-decreasing in nprobe (probing more
    Voronoi cells only ADDS candidates to an exact re-rank), candidate
    workload strictly grows, and the nprobe=3 row must agree with the
    deployed cosine_topk_ivf's own recall as ann_recall_report computes
    it (micro-averaged)."""
    rows = S.ivf_nprobe_recall_curve(spark, sf_dir).collect()
    assert [r.nprobe for r in rows] == [1, 2, 3, 5]
    for prev, cur in zip(rows, rows[1:]):
        assert cur.recall_at_5 >= prev.recall_at_5
        assert cur.n_candidates > prev.n_candidates
        assert cur.n_exact == prev.n_exact
    report = S.ann_recall_report(spark, sf_dir).collect()
    micro = sum(r.ivf_hits for r in report) / sum(r.k for r in report)
    at3 = next(r for r in rows if r.nprobe == 3)
    assert at3.recall_at_5 == round(micro, 4)


@pytest.mark.slow
def test_lsh_radius_curve_is_monotone_and_anchored(spark, sf_dir):
    """Recall@5 must be monotone non-decreasing in probe radius (a
    larger radius probes a superset of buckets), candidate workload
    non-decreasing, and the deployed radius-2 row must reproduce
    cosine_topk_lsh's own recall against brute force."""
    rows = S.lsh_radius_recall_curve(spark, sf_dir).collect()
    assert [r.radius for r in rows] == [0, 1, 2, 3]
    for prev, cur in zip(rows, rows[1:]):
        assert cur.recall_at_5 >= prev.recall_at_5
        assert cur.n_candidates >= prev.n_candidates
    exact = {(r.query_id, r.neighbor_id)
             for r in S.cosine_topk_bruteforce(spark, sf_dir).collect()}
    approx = {(r.query_id, r.neighbor_id)
              for r in S.cosine_topk_lsh(spark, sf_dir).collect()}
    at2 = next(r for r in rows if r.radius == 2)
    assert at2.recall_at_5 == round(len(exact & approx) / len(exact), 4)


def test_banding_tradeoff_candidates_are_nested(spark, sf_dir):
    """The S-curve geometry: an agreeing 8-row band contains two
    agreeing 4-row bands, so candidate sets nest 2x8 ⊆ 4x4 ⊆ 8x2 (no
    bucket nears the shared cap on this corpus), making recall and
    pair counts monotone along the loosening configs; the loosest
    config pays in precision on this corpus (it admits candidates the
    strict bands reject)."""
    p = {}
    for b, r in D._BANDING_CONFIGS:
        p[(b, r)] = {(x.doc_a, x.doc_b)
                     for x in D._minhash_band_pairs(spark, sf_dir, b, r).collect()}
    assert p[(2, 8)] <= p[(4, 4)] <= p[(8, 2)]
    rows = D.minhash_banding_tradeoff(spark, sf_dir).collect()
    by_cfg = {r.config: r for r in rows}
    assert by_cfg["2x8"].recall <= by_cfg["4x4"].recall <= by_cfg["8x2"].recall
    assert by_cfg["2x8"].n_pairs <= by_cfg["4x4"].n_pairs <= by_cfg["8x2"].n_pairs
    assert by_cfg["8x2"].precision <= by_cfg["4x4"].precision
