"""Plan-shape regression tests: the scale antipatterns tools/plan_audit.py
hunts must stay out of representative headline plans. Runs at the session
fixture's sf (cheap — plans are built, not executed)."""

from __future__ import annotations

import pytest

from tools.plan_audit import _ALLOWED_BNLJ

# one representative per plan family: agg+join, inverted-index self-join,
# window dedup, two-phase global position, arrow packing pipeline
_AUDITED = (
    "q5_local_supplier_volume",
    "dedup_ngram_jaccard_capped",
    "interdoc_span_dedup",
    "token_budget_select",
    "global_shuffle_shard",
    "corpus_export_manifest",
    "decontaminate_fuzzy",
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
