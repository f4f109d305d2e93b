"""TPC-H flavors q2/q4/q8/q9/q11/q12/q15 — completes the full 22-shape
TPC-H vocabulary (the other 15 shapes live in relational.py and
analytics_ext.py).

The testdata has no ``partsupp`` table and no
``l_shipmode``/``l_commitdate``/``l_receiptdate`` columns, so — exactly
like the existing q16/q20 flavors — lineitem stands in as the
part-supplier bridge and "late shipment" is expressed as
``l_shipdate > o_orderdate + N days``. Reference parity: these cover the
decision-query surface of the reference's extract engine
(snowflake_to_postgres/sf_migrate.py:214-275 runs arbitrary SELECTs
through its cursor; SURVEY §2.4 "same capabilities is the floor").

Scale notes (100 TB):
- q2: the (partkey, suppkey) bridge aggregate and the per-part MIN reuse
  one shuffle prefix; every dim broadcasts.
- q4/q12: fact-fact joins on the orderkey; no broadcast of orders at
  scale — they hash-shuffle on the join key only.
- q8/q9: single fact shuffle, all dims broadcast.
- q11/q15: the scalar threshold (total / max) is computed as its own
  tiny job and injected as a literal — exactly what Catalyst's
  ScalarSubquery execution does — keeping the main plan free of
  nested-loop joins (the global plan guard in test_plan_quality.py
  asserts no CartesianProduct / BroadcastNestedLoopJoin anywhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from snowflake_to_postgres_spark.operators.common import dec, one
from snowflake_to_postgres_spark.registry import QuerySpec
from snowflake_to_postgres_spark.sources import load_table

SPECS: list[QuerySpec] = []


def x_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q2 flavor: for each part in a size/type slice, the
    supplier(s) offering the minimum cost (min l_extendedprice stands in
    for ps_supplycost). The correlated MIN subquery is decorrelated into
    a second aggregate over the same bridge + an equality join; both
    aggregates share the l_partkey shuffle prefix."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    bridge = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(dec("l_extendedprice")).alias("cost")
    )
    min_cost = bridge.groupBy(F.col("l_partkey").alias("mk")).agg(
        F.min("cost").alias("min_cost")
    )
    parts = part.filter(F.col("p_size").between(10, 20) & (F.col("p_type") == "LARGE"))
    eu_nation = nation.join(
        F.broadcast(region.filter(F.col("r_name") == "EUROPE")),
        nation.n_regionkey == region.r_regionkey,
    ).select("n_nationkey", "n_name")
    return (
        bridge.join(
            min_cost,
            (bridge.l_partkey == min_cost.mk) & (bridge.cost == min_cost.min_cost),
        )
        .join(F.broadcast(parts), bridge.l_partkey == parts.p_partkey)
        .join(F.broadcast(supplier), bridge.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(eu_nation), supplier.s_nationkey == eu_nation.n_nationkey)
        .select("s_name", "n_name", "p_partkey", "p_brand", "cost")
    )


X_Q2_ORACLE = """
WITH cost AS (
  SELECT l_partkey, l_suppkey,
         MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS cost
  FROM lineitem GROUP BY 1, 2
)
SELECT s_name, n_name, p_partkey, p_brand, cost
FROM cost
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE p_size BETWEEN 10 AND 20 AND p_type = 'LARGE' AND r_name = 'EUROPE'
  AND cost = (SELECT MIN(c2.cost) FROM cost c2 WHERE c2.l_partkey = cost.l_partkey)
"""


def x_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q4 flavor: orders in a quarter having at least one
    late-shipped line (EXISTS → LEFT SEMI join on the orderkey with the
    non-equi lateness predicate as a join residual), counted per
    priority. Fact-fact semi join: hash-shuffles on the orderkey only;
    the semi form ships no lineitem payload columns."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


X_Q4_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
GROUP BY o_orderpriority
"""


def x_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q8 flavor: one nation's share of a region's order volume by
    order year. Numerator and denominator accumulate as exact decimals
    (order-independent sums); the share divides their *narrow*
    decimal(18,4) double images so both engines convert int64-backed
    decimals (exact) before the IEEE division."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    am_nation = nation.join(
        F.broadcast(region.filter(F.col("r_name") == "AMERICA")),
        nation.n_regionkey == region.r_regionkey,
    ).select(F.col("n_nationkey").alias("ck_nat"))
    supp_nation = nation.select(
        F.col("n_nationkey").alias("sk_nat"), F.col("n_name").alias("supp_nation")
    )
    vol = (dec("l_extendedprice") * (one() - dec("l_discount"))).cast("decimal(28,4)")
    zero = F.lit("0.0000").cast("decimal(28,4)")
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(am_nation), F.col("c_nationkey") == F.col("ck_nat"), "left_semi")
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(supp_nation), F.col("s_nationkey") == F.col("sk_nat"))
    )
    agg = j.groupBy(F.year("o_orderdate").cast("bigint").alias("o_year")).agg(
        F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(zero))
        .cast("decimal(18,4)")
        .alias("nation_vol"),
        F.sum(vol).cast("decimal(18,4)").alias("total_vol"),
    )
    return agg.select(
        "o_year",
        (F.col("nation_vol").cast("double") / F.col("total_vol").cast("double")).alias(
            "mkt_share"
        ),
        "nation_vol",
        "total_vol",
    )


X_Q8_ORACLE = """
WITH j AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         n2.n_name AS supp_nation,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2))
              * (CAST('1.00' AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))
              AS DECIMAL(28,4)) AS vol
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE c_nationkey IN (
    SELECT n_nationkey FROM nation JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'AMERICA')
), agg AS (
  SELECT o_year,
         CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN vol
                       ELSE CAST('0.0000' AS DECIMAL(28,4)) END) AS DECIMAL(18,4)) AS nation_vol,
         CAST(SUM(vol) AS DECIMAL(18,4)) AS total_vol
  FROM j GROUP BY o_year
)
SELECT o_year,
       CAST(nation_vol AS DOUBLE) / CAST(total_vol AS DOUBLE) AS mkt_share,
       nation_vol, total_vol
FROM agg
"""


def x_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q9 flavor: profit by supplier nation and order year for
    'widget' parts; profit = revenue − retail cost of the quantity
    (p_retailprice × l_quantity stands in for ps_supplycost ×
    l_quantity). Both products are pinned to decimal(28,4) before the
    subtraction so Spark and the oracle agree on every intermediate
    type."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    part = load_table(spark, sf_dir, "part")
    widgets = part.filter(F.col("p_name").contains("widget")).select(
        "p_partkey", "p_retailprice"
    )
    rev = (dec("l_extendedprice") * (one() - dec("l_discount"))).cast("decimal(28,4)")
    cost = (dec("p_retailprice") * dec("l_quantity")).cast("decimal(28,4)")
    return (
        li.join(F.broadcast(widgets), li.l_partkey == widgets.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(F.sum(rev - cost).cast("decimal(38,4)").alias("profit"))
    )


X_Q9_ORACLE = """
SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(
         CAST(CAST(l_extendedprice AS DECIMAL(18,2))
              * (CAST('1.00' AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))
              AS DECIMAL(28,4))
         - CAST(CAST(p_retailprice AS DECIMAL(18,2))
                * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(28,4))
       ) AS DECIMAL(38,4)) AS profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, o_year
"""


def x_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q11 flavor: parts whose stocked value (Σ extendedprice over
    one nation's suppliers) exceeds 2× the average part value. The
    HAVING-over-scalar-subquery threshold is computed as a tiny driver
    job and injected as literals; the comparison cross-multiplies
    (value · n_parts > 2 · total) on exact decimals so no division is
    involved."""
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    nat5 = nation.filter(F.col("n_name") == "NATION_5").select("n_nationkey")
    supp5 = supplier.join(
        F.broadcast(nat5), supplier.s_nationkey == nat5.n_nationkey, "left_semi"
    ).select("s_suppkey")
    scoped = li.join(F.broadcast(supp5), li.l_suppkey == supp5.s_suppkey, "left_semi")
    value = scoped.groupBy("l_partkey").agg(
        F.sum(dec("l_extendedprice")).cast("decimal(38,2)").alias("part_value")
    )
    t = value.agg(
        F.sum("part_value").cast("decimal(38,2)").alias("s"), F.count("*").alias("n")
    ).collect()[0]
    # Empty scoped set (tiny fixtures): SUM is NULL — any literal keeps
    # the filter-over-empty result empty, matching the oracle.
    s_lit = F.lit(str(t["s"] if t["s"] is not None else 0)).cast("decimal(38,2)")
    n_lit = F.lit(int(t["n"]))
    return value.filter(F.col("part_value") * n_lit > s_lit * F.lit(2))


X_Q11_ORACLE = """
WITH value AS (
  SELECT l_partkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS part_value
  FROM lineitem
  WHERE l_suppkey IN (
    SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_5')
  GROUP BY l_partkey
), t AS (
  SELECT CAST(SUM(part_value) AS DECIMAL(38,2)) AS s, COUNT(*) AS n FROM value
)
SELECT l_partkey, part_value
FROM value, t
WHERE part_value * n > s * 2
"""


def x_q12_late_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q12 flavor: for late-shipped lines (shipped > 60 days after
    the order date; l_linestatus stands in for l_shipmode), how many
    belong to critical-priority vs other orders. Fact-fact join on the
    orderkey; the CASE counts fold map-side."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    j = li.join(orders, li.l_orderkey == orders.o_orderkey).filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    crit = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return j.groupBy("l_linestatus").agg(
        F.sum(F.when(crit, 1).otherwise(0)).alias("high_line_count"),
        F.sum(F.when(crit, 0).otherwise(1)).alias("low_line_count"),
    )


X_Q12_ORACLE = """
SELECT l_linestatus,
       SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
         AS high_line_count,
       SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END)
         AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
GROUP BY l_linestatus
"""


def x_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q15 flavor: the supplier(s) with maximum revenue over one
    quarter. The MAX-over-view scalar subquery runs as its own tiny job
    (driver literal); the equality filter compares exact decimals, so
    ties resolve identically in both engines. The per-supplier revenue
    relation is computed once and reused for both the threshold and the
    result (Spark caches nothing here — the recompute is one scan — but
    at 100 TB the revenue agg is the only shuffle and the supplier dim
    broadcasts)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    supplier = load_table(spark, sf_dir, "supplier")
    rev = (dec("l_extendedprice") * (one() - dec("l_discount"))).cast("decimal(28,4)")
    revenue = li.groupBy("l_suppkey").agg(
        F.sum(rev).cast("decimal(38,4)").alias("total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("m")).collect()[0]["m"]
    top = revenue.filter(
        F.col("total_revenue")
        == F.lit(str(max_rev if max_rev is not None else 0)).cast("decimal(38,4)")
    )
    return supplier.join(F.broadcast(top), supplier.s_suppkey == top.l_suppkey).select(
        "s_suppkey", "s_name", "total_revenue"
    )


X_Q15_ORACLE = """
WITH revenue AS (
  SELECT l_suppkey,
         CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
              * (CAST('1.00' AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))
              AS DECIMAL(28,4))) AS DECIMAL(38,4)) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = l_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


SPECS.append(QuerySpec("x_q2_min_cost_supplier", x_q2_min_cost_supplier, X_Q2_ORACLE))
SPECS.append(QuerySpec("x_q4_order_priority", x_q4_order_priority, X_Q4_ORACLE))
SPECS.append(QuerySpec("x_q8_market_share", x_q8_market_share, X_Q8_ORACLE))
SPECS.append(QuerySpec("x_q9_product_profit", x_q9_product_profit, X_Q9_ORACLE))
SPECS.append(QuerySpec("x_q11_important_stock", x_q11_important_stock, X_Q11_ORACLE))
SPECS.append(QuerySpec("x_q12_late_priority", x_q12_late_priority, X_Q12_ORACLE))
SPECS.append(QuerySpec("x_q15_top_supplier", x_q15_top_supplier, X_Q15_ORACLE))


def x_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3 flavor (shipping priority): unshipped BUILDING-segment
    orders placed before the cutoff, top-10 by pending revenue —
    completes the 22-query TPC-H flavor set. The fixture's orders table
    has no o_shippriority column, so o_orderpriority stands in (same
    plan shape). Physical form: customer broadcasts into orders, the
    single shuffle is lineitem⋈orders on the orderkey, and the top-10 is
    TakeOrderedAndProject — never a global sort."""
    cutoff = "1995-03-15"
    customer = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    revenue = (dec("l_extendedprice") * (one() - dec("l_discount"))).cast("decimal(18,4)")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(customer), orders["o_custkey"] == customer["c_custkey"])
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).cast("decimal(38,4)").alias("revenue"))
        .select(
            "l_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            "o_orderpriority",
            "revenue",
        )
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


X_Q3_ORACLE = """
SELECT l_orderkey,
       CAST(o_orderdate AS DATE) AS o_orderdate,
       o_orderpriority,
       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST('1.00' AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15'
  AND l_shipdate > TIMESTAMP '1995-03-15'
GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""


SPECS.append(QuerySpec("x_q3_shipping_priority", x_q3_shipping_priority, X_Q3_ORACLE))
