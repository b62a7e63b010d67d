"""Semantic unit tests for the relational operators (values, not just shapes).

The cross-engine value check is tools/verify_local.py; here we pin down
hand-checkable invariants at sf0.001.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_flink_slack_pipeline_spark.operators import relational as R
from kafka_flink_slack_pipeline_spark.tables import table


def test_q1_groups_complete(spark, sf_dir):
    rows = R.q1_pricing_summary(spark, sf_dir).collect()
    # all 6 (returnflag, linestatus) combos exist in the data
    assert len(rows) == 6
    for r in rows:
        assert r.count_order > 0
        assert abs(r.avg_qty * r.count_order - r.sum_qty) / r.sum_qty < 1e-3


def test_q3_topk_ordering(spark, sf_dir):
    rows = R.q3_shipping_priority(spark, sf_dir).collect()
    assert len(rows) <= 10
    revs = [r.revenue for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_top_orders_rank_bounds(spark, sf_dir):
    df = R.top_orders_per_customer(spark, sf_dir)
    assert df.filter(F.col("rank_in_customer") > 3).count() == 0
    # rank 1 row per customer has that customer's max totalprice
    o = table(spark, sf_dir, "orders")
    max_price = o.groupBy("o_custkey").agg(F.round(F.max("o_totalprice"), 2).alias("mx"))
    r1 = df.filter(F.col("rank_in_customer") == 1)
    joined = r1.join(max_price, "o_custkey")
    assert joined.filter(F.col("o_totalprice") != F.col("mx")).count() == 0


def test_semi_plus_anti_partition_customers(spark, sf_dir):
    """semi(orders) + anti(orders) partitions customer exactly."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    semi = c.join(o, c.c_custkey == o.o_custkey, "left_semi").count()
    anti = c.join(o, c.c_custkey == o.o_custkey, "left_anti").count()
    assert semi + anti == c.count()


def test_rollup_grand_total(spark, sf_dir):
    rows = {(r.region, r.nation): r for r in
            R.rollup_revenue_region_nation(spark, sf_dir).collect()}
    grand = rows[("ALL", "ALL")]
    per_region = [v for (reg, nat), v in rows.items()
                  if nat == "ALL" and reg != "ALL"]
    assert grand.n_orders == sum(v.n_orders for v in per_region)
    assert abs(grand.total_price - sum(v.total_price for v in per_region)) < 1.0


def test_pivot_counts_sum_to_orders(spark, sf_dir):
    rows = R.pivot_orders_priority_status(spark, sf_dir).collect()
    total = sum(r.n_f + r.n_o + r.n_p for r in rows)
    assert total == table(spark, sf_dir, "orders").count()


def test_q5_broadcast_in_plan(spark, sf_dir):
    """The dimension joins must be broadcast (scale guard, not just correctness)."""
    plan = R.q5_local_supplier_volume(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_bucketed_join_eliminates_shuffle(spark, sf_dir, tmp_path):
    """Bucketing both fact tables on the join key pre-partitions them on
    disk: the sort-merge join then needs NO Exchange — the physical plan
    a 100 TB deployment wants for repeated orders⋈lineitem joins."""
    from pyspark.sql import functions as F

    from kafka_flink_slack_pipeline_spark.tables import table

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        for name, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
            spark.sql(f"DROP TABLE IF EXISTS b_{name}")
            (
                table(spark, sf_dir, name)
                .write.bucketBy(8, key).sortBy(key)
                .option("path", str(tmp_path / name))
                .saveAsTable(f"b_{name}")
            )
        joined = (
            spark.table("b_orders")
            .join(
                spark.table("b_lineitem"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = joined._sc._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "formatted"
        )
        join_section = plan.split("HashAggregate")[0]
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange" not in join_section, join_section
        # and the result matches the unbucketed join
        plain = (
            table(spark, sf_dir, "orders")
            .join(
                table(spark, sf_dir, "lineitem"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        assert sorted(map(tuple, joined.collect())) == \
            sorted(map(tuple, plain.collect()))
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    """Writing curated data partitionBy(lang) lets a lang filter prune
    entire directories at planning time — at 100 TB the difference between
    scanning one partition and the whole corpus."""
    from pyspark.sql import functions as F

    from kafka_flink_slack_pipeline_spark.tables import table

    out = str(tmp_path / "docs_by_lang")
    table(spark, sf_dir, "documents").write.partitionBy("lang").parquet(out)
    df = spark.read.parquet(out).filter(F.col("lang") == "en")
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters: [isnotnull(lang" in plan, plan[:800]
    full = spark.read.parquet(out)
    langs = {r.lang for r in full.select("lang").distinct().collect()}
    assert "en" in langs and df.count() > 0
    assert df.count() == full.filter(F.col("lang") == "en").count()


def test_customer_deciles_matches_ntile_window(spark, sf_dir):
    """The r4 two-phase bucketed decile arithmetic must reproduce
    F.ntile(10) OVER (ORDER BY ...) exactly — same bucket sizes, same
    boundary assignment (first n%10 tiles take the extra row)."""
    from pyspark.sql import Window as W

    from kafka_flink_slack_pipeline_spark.operators.relational import (
        customer_deciles,
    )
    from kafka_flink_slack_pipeline_spark.tables import table

    c = table(spark, sf_dir, "customer")
    w = W.orderBy(F.asc("c_acctbal"), F.asc("c_custkey"))
    ref = (
        c.withColumn("decile", F.ntile(10).over(w))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.min("c_acctbal"), 2).alias("min_acctbal"),
            F.round(F.max("c_acctbal"), 2).alias("max_acctbal"),
        )
        .orderBy("decile")
        .collect()
    )
    got = {
        r.decile: (r.n_customers, r.min_acctbal, r.max_acctbal)
        for r in customer_deciles(spark, sf_dir).collect()
    }
    for r in ref:
        assert got[r.decile] == (r.n_customers, r.min_acctbal, r.max_acctbal)


def test_salted_join_plan_and_equality(spark, sf_dir):
    """The salted-join contract, both halves: the executed plan actually
    partitions on (event_type, salt) — each hot key spread across S
    reducers — and the result equals the plain unsalted join."""
    from pyspark.sql import functions as F

    from kafka_flink_slack_pipeline_spark.operators.skew import (
        events_above_p95_salted_join,
    )
    from kafka_flink_slack_pipeline_spark.tables import table

    df = events_above_p95_salted_join(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re

    assert re.search(r"hashpartitioning\(event_type#\d+, salt#\d+", plan)

    e = table(spark, sf_dir, "events")
    pct = e.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.95)).alias("p95")
    )
    plain = (
        e.join(pct, "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum((F.col("value") > F.col("p95")).cast("long")).alias(
                "n_above_p95"
            ),
            F.round(F.min("p95"), 4).alias("p95"),
        )
        .orderBy("event_type")
    )
    assert [tuple(r) for r in df.collect()] == [
        tuple(r) for r in plain.collect()
    ]
