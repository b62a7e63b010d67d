"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All queries live in the package registry
(`kafka_flink_slack_pipeline_spark.plans.registry`); this module just
flattens it into the driver's shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kafka_flink_slack_pipeline_spark.plans.registry import all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Flagship = the end-to-end curation funnel: quality/repetition filter
    -> exact dedup -> MinHash-LSH near-dedup -> fuzzy decontamination
    -> source-level exclusion -> distilled-classifier exclusion,
    reported as per-stage doc/token survivor counts — the whole
    training-data cleaning story in one Catalyst plan (stable 7-row,
    4-column schema: raw + six gates; oracle-verified at sf0.001 and
    sf0.01).
    """
    from kafka_flink_slack_pipeline_spark.operators.curation import (
        corpus_curation_funnel,
    )

    return corpus_curation_funnel(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted where the op is
    not SQL-expressible → driver records a weaker rows-only check)."""
    return {
        name: spec.oracle
        for name, spec in all_queries().items()
        if spec.oracle is not None
    }
