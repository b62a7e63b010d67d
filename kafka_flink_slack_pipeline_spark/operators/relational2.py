"""Advanced relational surface (batch 2): multi-fact joins, correlated
subqueries, lead/lag analytics, CUBE, exact percentiles, date functions.

Complements operators/relational.py — together they cover the relational
operator classes a reference user could ever reach for (SURVEY.md §2.10
lists the reference as having none; Spark SQL supplies them all).

Scale notes (100 TB):
  - q7/q10/q18 shapes: the fact-fact join (orders ⋈ lineitem) shuffles on
    orderkey once and every downstream agg reuses that partitioning;
    nation joins broadcast.
  - correlated_above_avg_orders: the correlated scalar subquery is
    expressed as a window avg over the SAME shuffle partitioning the
    output grouping needs — one exchange total, vs. the naive
    self-join-aggregate which would shuffle twice.
  - lead_lag gaps: single window sort per customer partition; at cluster
    scale this is the canonical "sessionize" shuffle, skew-safe via AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.numeric import money_sum
from ..plans.registry import QuerySpec
from ..tables import table


# --------------------------------------------------------------------------
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: revenue by (customer nation, supplier nation, year)."""
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    cn = F.broadcast(n.select(F.col("n_nationkey").alias("c_nk"),
                              F.col("n_name").alias("cust_nation")))
    sn = F.broadcast(n.select(F.col("n_nationkey").alias("s_nk"),
                              F.col("n_name").alias("supp_nation")))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(cn, c.c_nationkey == F.col("c_nk"))
        .join(sn, s.s_nationkey == F.col("s_nk"))
        .filter(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy(
            "cust_nation", "supp_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            # decimal accumulation: a 2-decimal price × 2-decimal discount
            # is exact at 4 decimals, and decimal addition is associative —
            # so the sum is identical regardless of partitioning/engine
            # (double sums flip the last ulp on rounding boundaries).
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,4)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
        .filter(F.col("revenue") > 1000)
        .orderBy("cust_nation", "supp_nation", "l_year")
    )


Q7_ORACLE = """
SELECT cust_nation, supp_nation, l_year, revenue
FROM (
  SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
         year(l_shipdate)::INT AS l_year,
         round(sum((l_extendedprice * (1 - l_discount))::DECIMAL(18,4)), 2)::DOUBLE AS revenue
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  WHERE cn.n_name <> sn.n_name
  GROUP BY 1, 2, 3
)
WHERE revenue > 1000
ORDER BY cust_nation, supp_nation, l_year
"""


# --------------------------------------------------------------------------
def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue on returned items."""
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = F.broadcast(table(spark, sf_dir, "nation"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), scale=4
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


Q10_ORACLE = """
SELECT c_custkey, c_name, n_name,
       round(sum((l_extendedprice * (1 - l_discount))::DECIMAL(18,4)), 2)::DOUBLE AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# --------------------------------------------------------------------------
def q13_orders_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of order counts per customer
    (including zero-order customers via left anti semantics)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


Q13_ORACLE = """
SELECT c_count, count(*)::BIGINT AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey)::BIGINT AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# --------------------------------------------------------------------------
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds 150, with
    customer, ordered by value (GROUP BY + HAVING-in-join)."""
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


Q18_ORACLE = """
SELECT c_name, c_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       round(o_totalprice, 2) AS o_totalprice, total_qty
FROM (
  SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING round(sum(l_quantity), 2) > 150
) big
JOIN orders   ON big.l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


# --------------------------------------------------------------------------
def correlated_above_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders priced >1.5x their customer's average (correlated scalar
    subquery; planned as ONE window over the customer partitioning)."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    # exact decimal window-sum / count instead of double avg: the division
    # of identical operands is then the same IEEE op on both engines
    cust_avg = (
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double")
        / F.count(F.lit(1)).over(w)
    )
    return (
        o.withColumn("cust_avg", cust_avg)
        .filter(F.col("o_totalprice") > 1.5 * F.col("cust_avg"))
        .select(
            "o_orderkey",
            "o_custkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            # cust_avg is bit-identical across engines (exact decimal sum /
            # int count) — emitted UNROUNDED: rounding would reintroduce
            # divergence via round-half modes on true .5 ties.
            F.col("cust_avg"),
        )
        .orderBy("o_orderkey")
    )


CORRELATED_ABOVE_AVG_ORACLE = """
SELECT o_orderkey, o_custkey,
       round(o_totalprice, 2) AS o_totalprice,
       cust_avg
FROM (
  SELECT o_orderkey, o_custkey, o_totalprice,
         sum(o_totalprice::DECIMAL(18,2)) OVER (PARTITION BY o_custkey)::DOUBLE
           / count(*) OVER (PARTITION BY o_custkey) AS cust_avg
  FROM orders
)
WHERE o_totalprice > 1.5 * cust_avg
ORDER BY o_orderkey
"""


# --------------------------------------------------------------------------
def lead_lag_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Days between consecutive orders per customer (lag analytics)."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 200)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.withColumn("prev_date", F.lag("o_orderdate").over(w))
        .withColumn(
            "gap_days",
            F.datediff(F.to_date("o_orderdate"), F.to_date("prev_date")),
        )
        .filter(F.col("gap_days").isNotNull())
        .select(
            "o_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "gap_days",
        )
        .orderBy("o_custkey", "o_orderkey")
    )


LEAD_LAG_GAPS_ORACLE = """
SELECT o_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       date_diff('day', prev_date::DATE, o_orderdate::DATE)::INT AS gap_days
FROM (
  SELECT o_custkey, o_orderkey, o_orderdate,
         lag(o_orderdate) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ) AS prev_date
  FROM orders
  WHERE o_custkey < 200
)
WHERE prev_date IS NOT NULL
ORDER BY o_custkey, o_orderkey
"""


# --------------------------------------------------------------------------
def cube_revenue_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE (all grouping-set combinations) over orders."""
    o = table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            money_sum(F.col("o_totalprice")).alias("total"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


CUBE_REVENUE_ORACLE = """
SELECT o_orderstatus, o_orderpriority,
       count(*)::BIGINT AS n_orders,
       round(sum(o_totalprice::DECIMAL(18,2)), 2)::DOUBLE AS total
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
"""


# --------------------------------------------------------------------------
def median_order_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (median/p90) per order status — interpolated,
    matching quantile_cont."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("median_price"),
            F.round(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90_price"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("o_orderstatus")
    )


MEDIAN_ORDER_ORACLE = """
SELECT o_orderstatus,
       round(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
       round(quantile_cont(o_totalprice, 0.9), 4) AS p90_price,
       count(*)::BIGINT AS n
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


# --------------------------------------------------------------------------
def orders_by_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-function surface: day-of-week / month / year breakdown.
    (Spark dayofweek: 1=Sunday..7=Saturday; DuckDB dayofweek: 0=Sunday —
    the oracle adds 1.)"""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").alias("y"),
            F.month("o_orderdate").alias("m"),
            F.dayofweek("o_orderdate").alias("dow"),
        )
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("y", "m", "dow")
    )


ORDERS_BY_DOW_ORACLE = """
SELECT year(o_orderdate)::INT AS y,
       month(o_orderdate)::INT AS m,
       (dayofweek(o_orderdate) + 1)::INT AS dow,
       count(*)::BIGINT AS n_orders
FROM orders
GROUP BY 1, 2, 3
ORDER BY y, m, dow
"""


# --------------------------------------------------------------------------
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: single-scan filtered revenue — every predicate is a
    plain scan-column comparison, so the whole WHERE pushes into the
    parquet reader (PushedFilters) and the agg is one map-side pass."""
    l = table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            money_sum(
                F.col("l_extendedprice") * F.col("l_discount"), scale=4
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


Q6_ORACLE = """
SELECT round(sum((l_extendedprice * l_discount)::DECIMAL(18,4)), 2)::DOUBLE AS revenue,
       count(*)::BIGINT AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


# --------------------------------------------------------------------------
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-aggregation ratio (promo revenue %).
    Both sums are exact decimals; the final division is one IEEE op on
    identical operands — emitted unrounded per the numeric policy."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    joined = l.join(p, l.l_partkey == p.p_partkey)
    return joined.agg(
        (
            F.lit(100.0)
            * F.sum(
                F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(
                    F.lit(0).cast("decimal(18,4)")
                )
            ).cast("double")
            / F.sum(rev).cast("double")
        ).alias("promo_revenue_pct")
    )


Q14_ORACLE = """
SELECT 100.0 * sum(CASE WHEN p_type LIKE 'PROMO%'
                        THEN (l_extendedprice * (1 - l_discount))::DECIMAL(18,4)
                        ELSE 0::DECIMAL(18,4) END)::DOUBLE
            / sum((l_extendedprice * (1 - l_discount))::DECIMAL(18,4))::DOUBLE
         AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
"""


# --------------------------------------------------------------------------
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of conjunctive brand/size/quantity
    bands — Catalyst extracts the common join key and pushes the
    brand/size legs to the part scan."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    j = l.join(p, l.l_partkey == p.p_partkey)
    band1 = (
        (F.col("p_brand") == "Brand#1")
        & (F.col("p_size") <= 10)
        & (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 15)
    )
    band2 = (
        (F.col("p_brand") == "Brand#2")
        & (F.col("p_size") <= 20)
        & (F.col("l_quantity") >= 10) & (F.col("l_quantity") <= 25)
    )
    band3 = (
        (F.col("p_brand") == "Brand#3")
        & (F.col("p_size") <= 30)
        & (F.col("l_quantity") >= 20) & (F.col("l_quantity") <= 35)
    )
    return j.filter(band1 | band2 | band3).agg(
        money_sum(
            F.col("l_extendedprice") * (1 - F.col("l_discount")), scale=4
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


Q19_ORACLE = """
SELECT round(sum((l_extendedprice * (1 - l_discount))::DECIMAL(18,4)), 2)::DOUBLE
         AS revenue,
       count(*)::BIGINT AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size <= 10 AND l_quantity BETWEEN 1 AND 15)
   OR (p_brand = 'Brand#2' AND p_size <= 20 AND l_quantity BETWEEN 10 AND 25)
   OR (p_brand = 'Brand#3' AND p_size <= 30 AND l_quantity BETWEEN 20 AND 35)
"""


QUERIES = [
    QuerySpec("q6_forecast_revenue", q6_forecast_revenue, Q6_ORACLE,
              "single-scan filtered revenue, full predicate pushdown"),
    QuerySpec("q14_promo_revenue_share", q14_promo_revenue_share, Q14_ORACLE,
              "conditional-aggregation ratio"),
    QuerySpec("q19_disjunctive_revenue", q19_disjunctive_revenue, Q19_ORACLE,
              "disjunctive predicate bands over a join"),
    QuerySpec("q7_volume_shipping", q7_volume_shipping, Q7_ORACLE,
              "bi-nation revenue: 6-way join, broadcast dims"),
    QuerySpec("q10_returned_revenue", q10_returned_revenue, Q10_ORACLE,
              "top-20 customers by returned-item revenue"),
    QuerySpec("q13_orders_histogram", q13_orders_histogram, Q13_ORACLE,
              "order-count distribution incl. zero-order customers"),
    QuerySpec("q18_large_orders", q18_large_orders, Q18_ORACLE,
              "group-having join: orders above quantity threshold"),
    QuerySpec("correlated_above_avg_orders", correlated_above_avg_orders,
              CORRELATED_ABOVE_AVG_ORACLE,
              "correlated scalar subquery as single-window plan"),
    QuerySpec("lead_lag_order_gaps", lead_lag_order_gaps, LEAD_LAG_GAPS_ORACLE,
              "lag analytics: inter-order gaps in days"),
    QuerySpec("cube_revenue_status_priority", cube_revenue_status_priority,
              CUBE_REVENUE_ORACLE, "CUBE grouping sets"),
    QuerySpec("median_order_by_status", median_order_by_status,
              MEDIAN_ORDER_ORACLE, "exact interpolated percentiles"),
    QuerySpec("orders_by_dow", orders_by_dow, ORDERS_BY_DOW_ORACLE,
              "date-function breakdown (dow/month/year)"),
]
