"""Batch relational operator surface.

The reference implements none of these (SURVEY.md §2.10 — no joins, aggs,
window functions, sorts, set ops); Spark SQL/Catalyst supplies them all.
This module exercises the full relational surface on the driver's
TPC-H-ish testdata so the DuckDB oracle can verify each operator class:

  scans + filter/projection pushdown     q1
  multi-way joins (broadcast + shuffle)  q3, q5
  group-by aggregation                   q1, q3, q5
  semi / anti joins                      q4_priority_exists, customers_without_orders
  window functions (rank / ntile / lag)  top_orders_per_customer, customer_deciles
  rollup (grouping sets)                 rollup_revenue_region_nation
  pivot (conditional aggregation)        pivot_orders_priority_status
  set operations                         nations_customers_minus_suppliers
  scalar subquery                        rich_customers_without_orders
  top-k (order + limit)                  q3
  JSON extraction                        (operators/windows.py events queries)

Scale notes (100 TB):
  - Dimension joins (region, nation) are explicitly `F.broadcast(...)`:
    bounded cardinality at any SF → no shuffle on the fact side.
  - Fact-fact joins (orders ⋈ lineitem) are left to Catalyst/AQE: at local
    SF it picks broadcast; at cluster SF it becomes a sort-merge join on
    the shared key, which is the right plan (both sides shuffle-partitioned
    on orderkey; with warehouse tables we'd bucket both by orderkey to
    eliminate that shuffle entirely).
  - All filters are plain column predicates on scan columns → pushed into
    the parquet reader (verified via .explain: PushedFilters).

Rounding / formatting: see plans/registry.py invariants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.numeric import exact_avg, money_sum
from ..plans.registry import QuerySpec
from ..tables import table


# --------------------------------------------------------------------------
# q1 — pricing summary (TPC-H Q1 shape): full-scan aggregation.
# 100 TB: map-side partial aggregation on (returnflag, linestatus) — 6 groups
# → shuffle is 6 rows per task; scan dominates, projection pruned to 7 cols.
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            money_sum(F.col("l_quantity")).alias("sum_qty"),
            money_sum(F.col("l_extendedprice")).alias("sum_base_price"),
            money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), scale=4
            ).alias("sum_disc_price"),
            money_sum(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax")),
                scale=6,
            ).alias("sum_charge"),
            exact_avg(F.col("l_quantity")).alias("avg_qty"),
            exact_avg(F.col("l_extendedprice")).alias("avg_price"),
            exact_avg(F.col("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_ORACLE = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity::DECIMAL(18,2)), 2)::DOUBLE                    AS sum_qty,
       round(sum(l_extendedprice::DECIMAL(18,2)), 2)::DOUBLE               AS sum_base_price,
       round(sum((l_extendedprice * (1 - l_discount))::DECIMAL(18,4)), 2)::DOUBLE AS sum_disc_price,
       round(sum((l_extendedprice * (1 - l_discount) * (1 + l_tax))::DECIMAL(18,6)), 2)::DOUBLE AS sum_charge,
       sum(l_quantity::DECIMAL(18,2))::DOUBLE / count(*)                   AS avg_qty,
       sum(l_extendedprice::DECIMAL(18,2))::DOUBLE / count(*)              AS avg_price,
       sum(l_discount::DECIMAL(18,2))::DOUBLE / count(*)                   AS avg_disc,
       count(*)                                                            AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------
# q3 — shipping priority (TPC-H Q3 shape): 3-way join + agg + top-k.
# 100 TB: customer filter prunes the probe side early; orders⋈lineitem is the
# big sort-merge join; top-10 is a TakeOrderedAndProject (no full sort).
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    l = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), scale=4
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
            "revenue",
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


Q3_ORACLE = """
SELECT l_orderkey,
       strftime(o_orderdate, '%Y-%m-%d')                                   AS o_orderdate,
       o_orderpriority,
       round(sum((l_extendedprice * (1 - l_discount))::DECIMAL(18,4)), 2)::DOUBLE AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate  > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


# --------------------------------------------------------------------------
# q5 — local supplier volume (TPC-H Q5 shape): 6-way join incl. broadcast dims.
# 100 TB: region/nation broadcast (bounded); supplier joins on nationkey after
# the customer-side join has already restricted rows; AQE reorders as needed.
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = table(spark, sf_dir, "nation")
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    l = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), scale=4
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


Q5_ORACLE = """
SELECT n_name,
       round(sum((l_extendedprice * (1 - l_discount))::DECIMAL(18,4)), 2)::DOUBLE AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


# --------------------------------------------------------------------------
# q4 — order counts by priority where a returned lineitem EXISTS (semi join).
# 100 TB: left-semi join avoids materializing the (huge) match fan-out.
def q4_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_ORACLE = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# --------------------------------------------------------------------------
# customers_without_orders — anti join (NOT EXISTS), restricted to 1995H1
# so the result is non-trivial at every SF.
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-07-01").cast("timestamp"))
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


CUSTOMERS_WITHOUT_ORDERS_ORACLE = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '1995-01-01'
                    AND o_orderdate <  TIMESTAMP '1995-07-01')
ORDER BY c_custkey
"""


# --------------------------------------------------------------------------
# top_orders_per_customer — ranking window (row_number ≤ 3 per customer).
# 100 TB: single shuffle on o_custkey; rank prunes before any further join.
def top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rank_in_customer", F.row_number().over(w))
        .filter(F.col("rank_in_customer") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "rank_in_customer",
        )
        .orderBy("o_custkey", "rank_in_customer")
    )


TOP_ORDERS_PER_CUSTOMER_ORACLE = """
SELECT o_custkey, o_orderkey,
       round(o_totalprice, 2) AS o_totalprice,
       rank_in_customer
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC)
           AS rank_in_customer
  FROM orders
)
WHERE rank_in_customer <= 3
ORDER BY o_custkey, rank_in_customer
"""


# --------------------------------------------------------------------------
# customer_deciles — ntile + re-aggregation, WITHOUT a global window.
def customer_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile stats over customer account balances.

    r4 rewrite: the r1 form ran ntile(10) OVER (ORDER BY ...) — a
    single-partition window funnelling every customer through one task.
    This is the same two-phase bucketed global-position pattern as
    token_budget_select / global_shuffle_shard: c_acctbal's domain is
    bounded by the TPC-H spec ([-999.99, 9999.99]), so floor(acctbal/500)
    is a <=22-value bucket key that is a monotone prefix of the sort
    order; per-bucket counts -> broadcast running offsets -> within-
    bucket row_number = global rank, and the decile falls out of ntile's
    arithmetic rule (first n%10 tiles get one extra row) applied to
    (rank, total). The oracle keeps the declarative ntile form."""
    c = table(spark, sf_dir, "customer")
    keyed = c.select(
        "c_custkey",
        "c_acctbal",
        F.floor(F.col("c_acctbal") / 500).cast("int").alias("bucket"),
    )
    counts = keyed.groupBy("bucket").agg(F.count(F.lit(1)).alias("bn"))
    w_b = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.partitionBy()
    offsets = counts.select(
        "bucket",
        F.coalesce(F.sum("bn").over(w_b), F.lit(0)).alias("offset"),
        F.sum("bn").over(w_all).alias("total"),
    )
    w_in = Window.partitionBy("bucket").orderBy("c_acctbal", "c_custkey")
    pos = keyed.join(F.broadcast(offsets), "bucket").withColumn(
        "rk", F.col("offset") + F.row_number().over(w_in)
    )
    # ntile(10): q = total div 10, r = total mod 10; the first r tiles
    # hold q+1 rows, the rest q.
    q = (F.col("total") / 10).cast("long")
    r = F.col("total") % 10
    big = r * (q + 1)  # rows covered by the (q+1)-sized tiles
    decile = (
        F.when(F.col("rk") <= big, F.ceil(F.col("rk") / (q + 1)))
        .otherwise(r + F.ceil((F.col("rk") - big) / q))
        .cast("int")
    )
    return (
        pos.withColumn("decile", decile)
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            exact_avg(F.col("c_acctbal")).alias("avg_acctbal"),
            F.round(F.min("c_acctbal"), 2).alias("min_acctbal"),
            F.round(F.max("c_acctbal"), 2).alias("max_acctbal"),
        )
        .orderBy("decile")
    )


CUSTOMER_DECILES_ORACLE = """
SELECT decile,
       count(*)                 AS n_customers,
       sum(c_acctbal::DECIMAL(18,2))::DOUBLE / count(*) AS avg_acctbal,
       round(min(c_acctbal), 2) AS min_acctbal,
       round(max(c_acctbal), 2) AS max_acctbal
FROM (
  SELECT c_acctbal,
         ntile(10) OVER (ORDER BY c_acctbal ASC, c_custkey ASC) AS decile
  FROM customer
)
GROUP BY decile
ORDER BY decile
"""


# --------------------------------------------------------------------------
# rollup_revenue_region_nation — grouping sets via ROLLUP.
def rollup_revenue_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = table(spark, sf_dir, "region")
    n = table(spark, sf_dir, "nation")
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    joined = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            money_sum(F.col("o_totalprice")).alias("total_price"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            "total_price",
            "n_orders",
        )
        .orderBy("region", "nation")
    )


ROLLUP_ORACLE = """
SELECT coalesce(r_name, 'ALL')       AS region,
       coalesce(n_name, 'ALL')       AS nation,
       round(sum(o_totalprice::DECIMAL(18,2)), 2)::DOUBLE AS total_price,
       count(*)                      AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
ORDER BY region, nation
"""


# --------------------------------------------------------------------------
# pivot_orders_priority_status — pivot (conditional aggregation).
def pivot_orders_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    pivoted = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return pivoted.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).alias("n_f"),
        F.coalesce(F.col("O"), F.lit(0)).alias("n_o"),
        F.coalesce(F.col("P"), F.lit(0)).alias("n_p"),
    ).orderBy("o_orderpriority")


PIVOT_ORACLE = """
SELECT o_orderpriority,
       coalesce(sum(CASE WHEN o_orderstatus = 'F' THEN 1 END), 0)::BIGINT AS n_f,
       coalesce(sum(CASE WHEN o_orderstatus = 'O' THEN 1 END), 0)::BIGINT AS n_o,
       coalesce(sum(CASE WHEN o_orderstatus = 'P' THEN 1 END), 0)::BIGINT AS n_p
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# --------------------------------------------------------------------------
# nations_customers_minus_suppliers — set operation (EXCEPT).
def nations_customers_minus_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nations with high-balance customers but no high-balance supplier.

    `subtract` = EXCEPT (set semantics, dedups both sides), matching SQL
    EXCEPT — exceptAll would be bag semantics and diverge.
    """
    n = table(spark, sf_dir, "nation")
    c = table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 7500)
    s = table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") > 7500)
    cust_nations = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select(
        "n_name"
    )
    supp_nations = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "n_name"
    )
    return cust_nations.subtract(supp_nations).orderBy("n_name")


NATIONS_SET_OPS_ORACLE = """
SELECT n_name FROM customer JOIN nation ON c_nationkey = n_nationkey
  WHERE c_acctbal > 7500
EXCEPT
SELECT n_name FROM supplier JOIN nation ON s_nationkey = n_nationkey
  WHERE s_acctbal > 7500
ORDER BY n_name
"""


# --------------------------------------------------------------------------
# rich_customers_without_orders — scalar subquery + anti join (TPC-H Q22 shape).
def rich_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp")
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        exact_avg(F.col("c_acctbal")).alias("avg_bal")
    )
    rich = c.join(F.broadcast(avg_bal)).filter(F.col("c_acctbal") > F.col("avg_bal"))
    return (
        rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
        .join(F.broadcast(table(spark, sf_dir, "nation")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            money_sum(F.col("c_acctbal")).alias("total_acctbal"),
        )
        .orderBy("n_name")
    )


RICH_NO_ORDERS_ORACLE = """
SELECT n_name,
       count(*)                    AS n_customers,
       round(sum(c_acctbal::DECIMAL(18,2)), 2)::DOUBLE AS total_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal > (SELECT sum(c_acctbal::DECIMAL(18,2))::DOUBLE / count(*)
                   FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2001-01-01')
GROUP BY n_name
ORDER BY n_name
"""


QUERIES = [
    QuerySpec("q1_pricing_summary", q1_pricing_summary, Q1_ORACLE,
              "full-scan aggregation (TPC-H Q1 shape)"),
    QuerySpec("q3_shipping_priority", q3_shipping_priority, Q3_ORACLE,
              "3-way join + agg + top-k (TPC-H Q3 shape)"),
    QuerySpec("q5_local_supplier_volume", q5_local_supplier_volume, Q5_ORACLE,
              "6-way join with broadcast dims (TPC-H Q5 shape)"),
    QuerySpec("q4_priority_exists", q4_priority_exists, Q4_ORACLE,
              "left-semi join (EXISTS)"),
    QuerySpec("customers_without_orders", customers_without_orders,
              CUSTOMERS_WITHOUT_ORDERS_ORACLE, "left-anti join (NOT EXISTS)"),
    QuerySpec("top_orders_per_customer", top_orders_per_customer,
              TOP_ORDERS_PER_CUSTOMER_ORACLE, "ranking window function"),
    QuerySpec("customer_deciles", customer_deciles, CUSTOMER_DECILES_ORACLE,
              "ntile window + re-aggregation"),
    QuerySpec("rollup_revenue_region_nation", rollup_revenue_region_nation,
              ROLLUP_ORACLE, "ROLLUP grouping sets"),
    QuerySpec("pivot_orders_priority_status", pivot_orders_priority_status,
              PIVOT_ORACLE, "pivot / conditional aggregation"),
    QuerySpec("nations_customers_minus_suppliers", nations_customers_minus_suppliers,
              NATIONS_SET_OPS_ORACLE, "set operation (EXCEPT)"),
    QuerySpec("rich_customers_without_orders", rich_customers_without_orders,
              RICH_NO_ORDERS_ORACLE, "scalar subquery + anti join (TPC-H Q22 shape)"),
]
