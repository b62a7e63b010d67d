"""Plan-shape regression tests: the scale antipatterns tools/plan_audit.py
hunts must stay out of representative headline plans. Runs at the session
fixture's sf (cheap — plans are built, not executed)."""

from __future__ import annotations

import pytest

from tools.plan_audit import _ALLOWED_BNLJ

# one representative per plan family: agg+join, inverted-index self-join,
# window dedup, two-phase global position, arrow packing pipeline — plus
# the r4 single-pass rewrites whose whole value is their scan count
_AUDITED = (
    "q5_local_supplier_volume",
    "dedup_ngram_jaccard_capped",
    "interdoc_span_dedup",
    "token_budget_select",
    "global_shuffle_shard",
    "corpus_export_manifest",
    "decontaminate_fuzzy",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "funnel_stages",
    "semantic_dedup",
    "cosine_topk_ivfpq",
    "customer_deciles",
)


@pytest.fixture(scope="module")
def plans(spark, sf_dir):
    from kafka_flink_slack_pipeline_spark.plans.registry import all_queries

    specs = all_queries()
    return {
        name: specs[name]
        .fn(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
        for name in _AUDITED
    }


def test_no_nested_loop_joins(plans):
    for name, plan in plans.items():
        if name in _ALLOWED_BNLJ:
            continue
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_no_row_at_a_time_python(plans):
    for name, plan in plans.items():
        assert "BatchEvalPython" not in plan, name


def test_filter_pushdown_reaches_scan(plans):
    """The flagship join's region filter must reach the parquet scan."""
    plan = plans["q5_local_supplier_volume"]
    assert "PushedFilters: [" in plan
    assert "IsNotNull" in plan or "EqualTo" in plan


def test_interdoc_span_single_explosion(plans):
    """The r3 fix pinned: one span explosion (no self-join recompute)."""
    assert plans["interdoc_span_dedup"].count("Generate explode") == 1


def _scans(plan: str, table: str) -> int:
    return plan.count(f"{table}.parquet")


def test_r4_single_pass_rewrites(plans):
    """Spark 4.1 AQE plans no cross-branch exchange reuse, so scan count
    IS recompute count. Pin the r4 one-pass shapes: the signature /
    fingerprint / funnel pipelines must appear exactly once."""
    assert _scans(plans["dedup_minhash_lsh"], "documents") == 1
    assert _scans(plans["dedup_simhash"], "documents") == 1
    assert _scans(plans["dedup_exact"], "documents") == 1
    assert _scans(plans["funnel_stages"], "events") == 1
    # bucket-grouped pair generation has no join at all
    for name in ("dedup_minhash_lsh", "dedup_simhash", "funnel_stages"):
        assert "Join" not in plans[name], name


def test_r4_literal_centroid_assignment(plans):
    """IVF/SemDeDup assignment is a narrow map over literal centroids:
    no nested-loop codebook join, bounded scan budgets (the planted-dup
    union legitimately doubles semantic_dedup's count)."""
    assert "BroadcastNestedLoopJoin" not in plans["cosine_topk_ivfpq"]
    assert "BroadcastNestedLoopJoin" not in plans["semantic_dedup"]
    assert _scans(plans["cosine_topk_ivfpq"], "embeddings") <= 3
    assert _scans(plans["semantic_dedup"], "embeddings") <= 6


def test_r4_deciles_no_global_window(plans):
    """customer_deciles' ntile now comes from the two-phase bucketed
    pattern: any SinglePartition exchange must sit above the bounded
    bucket frame, never above the customer scan."""
    from tools.plan_audit import _single_partition_ok
    import re

    plan = plans["customer_deciles"]
    for m in re.finditer(r"Exchange SinglePartition", plan):
        assert _single_partition_ok(plan, m.start())
