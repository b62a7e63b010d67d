"""TPC-H tail shapes (SURVEY.md §2.10 relational surface, round 2).

Completes the TPC-H-shape sweep over the driver tables with the eleven
queries r1 lacked: Q2/Q8/Q9/Q11/Q12/Q15/Q16/Q17/Q20/Q21/Q22. The testdata
has no partsupp table and lineitem lacks commit/receipt dates and shipmode,
so the partsupp-dependent queries are ADAPTED — same operator shape
(correlated min, scalar-subquery threshold, distinct-count + NOT IN,
nested-agg semi join, multi-exists self-join), semantics re-expressed over
the columns that exist. Each adaptation is noted on the query.

Determinism rules (beyond plans/registry.py invariants):
  - per-row double arithmetic (division, comparison) is IEEE-identical
    across engines, so `min(l_extendedprice / l_quantity)` and
    `x::DOUBLE > 0.5 * y::DOUBLE` are safe UNROUNDED;
  - every aggregate that feeds an equality or threshold is an exact
    DECIMAL sum first (functions/numeric.py) — order-independent, so the
    derived doubles are bit-identical on both sides.

Scale notes (100 TB): every join below is either a broadcast of a bounded
dim (region/nation/supplier-filter/part-filter) or a shuffle equi-join on
a key Catalyst can plan as sort-merge; scalar thresholds are 1-row
crossJoin broadcasts, never driver collect()s; window functions partition
by the same key as the upstream aggregate so they reuse the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.numeric import money_sum
from ..plans.registry import QuerySpec
from ..tables import table


# --------------------------------------------------------------------------
# q2 shape — min-cost supplier (correlated min subquery + dim-join chain).
# Adapted: no partsupp/ps_supplycost; "cost" is the minimum unit price
# (l_extendedprice / l_quantity) at which the supplier ever shipped the
# part. Per-row IEEE division + MIN is order-independent → exact.
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") <= 10)
    )
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    costs = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("p_partkey", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    w = Window.partitionBy("p_partkey")
    return (
        costs.withColumn("best_cost", F.min("unit_cost").over(w))
        .filter(F.col("unit_cost") == F.col("best_cost"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "unit_cost")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


Q2_ORACLE = """
WITH costs AS (
  SELECT p_partkey, s_suppkey, s_name, s_acctbal, n_name,
         min(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE' AND p_type = 'STANDARD' AND p_size <= 10
  GROUP BY p_partkey, s_suppkey, s_name, s_acctbal, n_name
),
best AS (SELECT *, min(unit_cost) OVER (PARTITION BY p_partkey) AS best_cost
         FROM costs)
SELECT s_acctbal, s_name, n_name, p_partkey, unit_cost
FROM best WHERE unit_cost = best_cost
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


# --------------------------------------------------------------------------
# q8 shape — national market share: conditional-agg ratio per year.
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    n_c = table(spark, sf_dir, "nation").alias("nc")
    n_s = table(spark, sf_dir, "nation").alias("ns")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    base = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n_c), c.c_nationkey == F.col("nc.n_nationkey"))
        .join(F.broadcast(r), F.col("nc.n_regionkey") == r.r_regionkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n_s), s.s_nationkey == F.col("ns.n_nationkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            vol.cast("decimal(18,4)").alias("volume"),
            F.col("ns.n_name").alias("supp_nation"),
        )
    )
    nation_vol = F.sum(
        F.when(F.col("supp_nation") == "NATION_5", F.col("volume")).otherwise(
            F.lit(0).cast("decimal(18,4)")
        )
    ).cast("double")
    return (
        base.groupBy("o_year")
        .agg((nation_vol / F.sum("volume").cast("double")).alias("mkt_share"))
        .orderBy("o_year")
    )


Q8_ORACLE = """
WITH base AS (
  SELECT year(o_orderdate) AS o_year,
         (l_extendedprice * (1 - l_discount))::DECIMAL(18,4) AS volume,
         ns.n_name AS supp_nation
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation nc ON c_nationkey = nc.n_nationkey
  JOIN region   ON nc.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ns ON s_nationkey = ns.n_nationkey
  WHERE r_name = 'ASIA' AND p_type = 'PROMO'
)
SELECT o_year,
       sum(CASE WHEN supp_nation = 'NATION_5' THEN volume
                ELSE 0::DECIMAL(18,4) END)::DOUBLE
         / sum(volume)::DOUBLE AS mkt_share
FROM base GROUP BY o_year ORDER BY o_year
"""


# --------------------------------------------------------------------------
# q9 shape — product-type profit by nation and year.
# Adapted: no ps_supplycost, so profit = discounted revenue.
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_name").contains("red"))
    o = table(spark, sf_dir, "orders")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(
            money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), scale=4
            ).alias("sum_profit")
        )
        .orderBy("nation", F.desc("o_year"))
    )


Q9_ORACLE = """
SELECT n_name AS nation, year(o_orderdate) AS o_year,
       round(sum((l_extendedprice * (1 - l_discount))::DECIMAL(18,4)), 2)::DOUBLE
         AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, year(o_orderdate)
ORDER BY nation, o_year DESC
"""


# --------------------------------------------------------------------------
# q11 shape — important stock: group-agg + global scalar-subquery threshold.
# Adapted: no partsupp; a part's "stock value" is shipped quantity ×
# retail price for suppliers of one nation, kept when above 0.1% of total.
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    val = (F.col("l_quantity") * F.col("p_retailprice")).cast("decimal(18,4)")
    per_part = (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(p, l.l_partkey == p.p_partkey)
        .groupBy("p_partkey")
        .agg(F.sum(val).alias("value_dec"))
    )
    total = per_part.agg(
        (F.sum("value_dec").cast("double") * F.lit(0.001)).alias("threshold")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value_dec").cast("double") > F.col("threshold"))
        .select(
            "p_partkey",
            F.round(F.col("value_dec"), 2).cast("double").alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "p_partkey")
    )


Q11_ORACLE = """
WITH per_part AS (
  SELECT p_partkey,
         sum((l_quantity * p_retailprice)::DECIMAL(18,4)) AS value_dec
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN part     ON l_partkey = p_partkey
  WHERE n_name = 'NATION_3'
  GROUP BY p_partkey
)
SELECT p_partkey, round(value_dec, 2)::DOUBLE AS part_value
FROM per_part
WHERE value_dec::DOUBLE > (SELECT sum(value_dec)::DOUBLE * 0.001 FROM per_part)
ORDER BY part_value DESC, p_partkey
"""


# --------------------------------------------------------------------------
# q12 shape — priority class counts (join + CASE conditional counts).
# Adapted: no l_shipmode/commit/receipt dates; classes by line status over
# a one-year ship window, counting urgent-vs-other order priorities.
def q12_priority_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


Q12_ORACLE = """
SELECT l_linestatus,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END)::BIGINT AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY l_linestatus ORDER BY l_linestatus
"""


# --------------------------------------------------------------------------
# q15 shape — top supplier: derived revenue view + max scalar subquery.
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    s = table(spark, sf_dir, "supplier")
    rev = l.groupBy("l_suppkey").agg(
        money_sum(
            F.col("l_extendedprice") * (1 - F.col("l_discount")), scale=4
        ).alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(s), rev.l_suppkey == s.s_suppkey)
        .select(
            F.col("s_suppkey"), F.col("s_name"), F.col("total_revenue")
        )
        .orderBy("s_suppkey")
    )


Q15_ORACLE = """
WITH rev AS (
  SELECT l_suppkey,
         round(sum((l_extendedprice * (1 - l_discount))::DECIMAL(18,4)), 2)::DOUBLE
           AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
ORDER BY s_suppkey
"""


# --------------------------------------------------------------------------
# q16 shape — supplier counts per part class: distinct-count + NOT IN.
# Adapted: supplier-comment exclusion becomes negative-balance exclusion.
def q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#9")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
    )
    bad = table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0)
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(
            F.broadcast(bad),
            l.l_suppkey == bad.s_suppkey,
            "left_anti",  # NOT IN (excluded suppliers)
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


Q16_ORACLE = """
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey)::BIGINT AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#9' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# --------------------------------------------------------------------------
# q17 shape — small-quantity revenue: correlated per-part avg subquery.
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#13")
    li = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    # correlated avg as a window: exact decimal sum / count, one IEEE div
    w = Window.partitionBy("p_partkey")
    avg_qty = (
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).over(w).cast("double")
        / F.count(F.lit(1)).over(w)
    )
    return (
        li.withColumn("avg_qty", avg_qty)
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast(
                    "double"
                )
                / F.lit(7.0)
            ).alias("avg_yearly")
        )
    )


Q17_ORACLE = """
WITH li AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#13'
),
stats AS (
  SELECT *, sum(l_quantity::DECIMAL(18,2)) OVER (PARTITION BY l_partkey)::DOUBLE
              / count(*) OVER (PARTITION BY l_partkey) AS avg_qty
  FROM li
)
SELECT sum(l_extendedprice::DECIMAL(18,2))::DOUBLE / 7.0 AS avg_yearly
FROM stats WHERE l_quantity < 0.2 * avg_qty
"""


# --------------------------------------------------------------------------
# q20 shape — volume suppliers: nested agg + threshold semi join.
# Adapted: no partsupp availqty; a supplier qualifies when it shipped more
# than half of a small-part's total 1997 volume.
def q20_volume_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    p = table(spark, sf_dir, "part").filter(F.col("p_name").startswith("small"))
    s = table(spark, sf_dir, "supplier")
    pq = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("sq"))
    )
    tot = pq.groupBy("l_partkey").agg(F.sum("sq").alias("tq"))
    dominant = (
        pq.join(tot, "l_partkey")
        .filter(F.col("sq").cast("double") > 0.5 * F.col("tq").cast("double"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(dominant, s.s_suppkey == dominant.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


Q20_ORACLE = """
WITH pq AS (
  SELECT l_partkey, l_suppkey, sum(l_quantity::DECIMAL(18,2)) AS sq
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE 'small%'
    AND l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1998-01-01'
  GROUP BY l_partkey, l_suppkey
),
tot AS (SELECT l_partkey, sum(sq) AS tq FROM pq GROUP BY l_partkey)
SELECT s_suppkey, s_name FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM pq JOIN tot USING (l_partkey)
  WHERE sq::DOUBLE > 0.5 * tq::DOUBLE)
ORDER BY s_suppkey
"""


# --------------------------------------------------------------------------
# q21 shape — suppliers who held up multi-supplier orders (exists +
# not-exists self-joins on the fact table, here via window counts).
# Adapted: no commit/receipt dates; "held up" = sole supplier whose ship
# date is the order's latest, on finished multi-supplier orders.
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = table(spark, sf_dir, "supplier")
    lo = l.join(o, l.l_orderkey == o.o_orderkey).select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    stats = lo.groupBy("l_orderkey").agg(
        F.max("l_shipdate").alias("maxship"),
        F.countDistinct("l_suppkey").alias("nsupp"),
    )
    last = (
        lo.join(stats, "l_orderkey")
        .filter((F.col("l_shipdate") == F.col("maxship")) & (F.col("nsupp") >= 2))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    only_last = (
        last.groupBy("l_orderkey")
        .agg(
            F.min("l_suppkey").alias("l_suppkey"),
            F.count(F.lit(1)).alias("n_at_max"),
        )
        .filter(F.col("n_at_max") == 1)  # NOT EXISTS another supplier at max
    )
    return (
        only_last.join(F.broadcast(s), only_last.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(25)
    )


Q21_ORACLE = """
WITH lo AS (
  SELECT l_orderkey, l_suppkey, l_shipdate
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
),
stats AS (
  SELECT l_orderkey, max(l_shipdate) AS maxship,
         count(DISTINCT l_suppkey) AS nsupp
  FROM lo GROUP BY l_orderkey
),
last AS (
  SELECT DISTINCT lo.l_orderkey, lo.l_suppkey
  FROM lo JOIN stats USING (l_orderkey)
  WHERE lo.l_shipdate = stats.maxship AND stats.nsupp >= 2
),
only_last AS (
  SELECT l_orderkey, min(l_suppkey) AS l_suppkey
  FROM last GROUP BY l_orderkey HAVING count(*) = 1
)
SELECT s_name, count(*)::BIGINT AS numwait
FROM only_last JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_name ORDER BY numwait DESC, s_name
LIMIT 25
"""


# --------------------------------------------------------------------------
# q22 shape — dormant rich customers: anti join + scalar avg subquery.
# Adapted: no c_phone prefix; cohort = customers with no orders since
# 1999, grouped by nation key instead of phone country code.
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
    )
    cohort = c.join(o, c.c_custkey == o.o_custkey, "left_anti")
    thresh = cohort.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_bal")
    )
    return (
        cohort.crossJoin(F.broadcast(thresh))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            money_sum(F.col("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


Q22_ORACLE = """
WITH cohort AS (
  SELECT c_custkey, c_nationkey, c_acctbal FROM customer c
  WHERE NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey
      AND o.o_orderdate >= TIMESTAMP '1999-01-01')
)
SELECT c_nationkey, count(*)::BIGINT AS numcust,
       round(sum(c_acctbal::DECIMAL(18,2)), 2)::DOUBLE AS totacctbal
FROM cohort
WHERE c_acctbal > (SELECT sum(c_acctbal::DECIMAL(18,2))::DOUBLE / count(*)
                   FROM cohort WHERE c_acctbal > 0)
GROUP BY c_nationkey ORDER BY c_nationkey
"""


QUERIES = [
    QuerySpec("q2_min_cost_supplier", q2_min_cost_supplier, Q2_ORACLE,
              "Q2 shape: correlated min + dim-join chain (adapted, no partsupp)"),
    QuerySpec("q8_market_share", q8_market_share, Q8_ORACLE,
              "Q8 shape: conditional-agg national share per year"),
    QuerySpec("q9_product_profit", q9_product_profit, Q9_ORACLE,
              "Q9 shape: profit by supplier nation and year (adapted)"),
    QuerySpec("q11_important_stock", q11_important_stock, Q11_ORACLE,
              "Q11 shape: agg + global scalar-subquery threshold (adapted)"),
    QuerySpec("q12_priority_classes", q12_priority_classes, Q12_ORACLE,
              "Q12 shape: CASE conditional counts per class (adapted)"),
    QuerySpec("q15_top_supplier", q15_top_supplier, Q15_ORACLE,
              "Q15 shape: derived revenue view + max scalar subquery"),
    QuerySpec("q16_part_supplier_counts", q16_part_supplier_counts, Q16_ORACLE,
              "Q16 shape: distinct-count + NOT IN anti join (adapted)"),
    QuerySpec("q17_small_quantity_revenue", q17_small_quantity_revenue,
              Q17_ORACLE,
              "Q17 shape: correlated per-part avg subquery"),
    QuerySpec("q20_volume_suppliers", q20_volume_suppliers, Q20_ORACLE,
              "Q20 shape: nested agg + threshold semi join (adapted)"),
    QuerySpec("q21_waiting_suppliers", q21_waiting_suppliers, Q21_ORACLE,
              "Q21 shape: sole-latest-supplier on multi-supplier orders (adapted)"),
    QuerySpec("q22_dormant_customers", q22_dormant_customers, Q22_ORACLE,
              "Q22 shape: anti join + scalar avg subquery (adapted)"),
]
