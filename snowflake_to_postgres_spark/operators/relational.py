"""Relational operator surface (SURVEY.md §2.1–2.5), Spark-first.

Each query is a declarative DataFrame plan — predicate pushdown, column
pruning and join strategy are Catalyst's job (SURVEY §4: the reference
hand-rolled these as SQL string templates; here they are free). Names are
prefixed with the SURVEY §2 operator id they re-express.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from snowflake_to_postgres_spark.operators.common import dec, md5_bucket, one
from snowflake_to_postgres_spark.registry import QuerySpec
from snowflake_to_postgres_spark.sources import load_table


# --------------------------------------------------------------------------
# S1/P1-P4/A1-A3: scans, projections, filters, aggregates
# --------------------------------------------------------------------------

def s1_scan_filter_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-table extract scan with projection + WHERE pushdown.

    Re-expresses data_transfer.py:98-208 (SELECT col-list FROM t WHERE ...):
    the filter and the 4-column projection both reach the parquet reader
    (PushedFilters / ReadSchema in .explain)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-02-01").cast("timestamp"))
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_shipdate").cast("date").alias("ship_date"),
            dec("l_extendedprice").alias("price"),
        )
    )


S1_ORACLE = """
SELECT l_orderkey, l_linenumber,
       CAST(l_shipdate AS DATE) AS ship_date,
       CAST(l_extendedprice AS DECIMAL(18,2)) AS price
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-02-01'
"""


def p1_projection_varchar_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1: the reference's ``"c"::VARCHAR AS "c"`` all-columns-to-text
    projection (data_transfer.py:123-131), on stable-to-stringify types."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_orderkey").cast("string").alias("l_orderkey"),
        F.col("l_linenumber").cast("string").alias("l_linenumber"),
        dec("l_quantity").cast("string").alias("l_quantity"),
        F.col("l_returnflag").alias("l_returnflag"),
        F.col("l_shipdate").cast("date").cast("string").alias("l_shipdate"),
    )


P1_ORACLE = """
SELECT CAST(l_orderkey AS VARCHAR) AS l_orderkey,
       CAST(l_linenumber AS VARCHAR) AS l_linenumber,
       CAST(CAST(l_quantity AS DECIMAL(18,2)) AS VARCHAR) AS l_quantity,
       l_returnflag,
       CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS l_shipdate
FROM lineitem
"""


def p2_where_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2: user WHERE predicate (data_transfer.py:133-134) — expressed via
    F.expr so arbitrary `--where` strings work; Catalyst pushes it down."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(F.expr("o_totalprice > 400000 AND o_orderstatus = 'F'")).select(
        "o_orderkey", "o_custkey", dec("o_totalprice").alias("o_totalprice")
    )


P2_ORACLE = """
SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DECIMAL(18,2)) AS o_totalprice
FROM orders WHERE o_totalprice > 400000 AND o_orderstatus = 'F'
"""


def p3_date_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3: half-open ISO date-range predicate (validator.py:581-585)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("o_orderstatus"))
        .agg(F.count("*").alias("cnt"))
    )


P3_ORACLE = """
SELECT o_orderstatus, COUNT(*) AS cnt FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
GROUP BY o_orderstatus
"""


def p4_order_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4: LIMIT n (data_transfer.py:135-136), made deterministic with a
    total order (the reference notes unordered LIMIT is non-deterministic,
    data_transfer.py:33-36)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", dec("o_totalprice").alias("o_totalprice"))
        .limit(10)
    )


P4_ORACLE = """
SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


def p5_offset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5: the OFFSET-resume rewrite (_build_resume_query,
    data_transfer.py:29-57) re-expressed as *deterministic* pagination:
    total ORDER BY + offset + limit. (The reference's unordered OFFSET
    resume is its own documented correctness hole.)"""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy("o_orderkey")
        .select("o_orderkey", "o_orderstatus")
        .offset(500)
        .limit(100)
    )


P5_ORACLE = """
SELECT o_orderkey, o_orderstatus FROM orders ORDER BY o_orderkey LIMIT 100 OFFSET 500
"""


def s10_deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10: sample scan (validator.py:623-631 TABLESAMPLE) — replaced by an
    md5-bucket sample so the oracle sees the identical row set."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(md5_bucket("o_orderkey", "0")).select(
        "o_orderkey", "o_custkey", "o_orderstatus"
    )


S10_ORACLE = """
SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
WHERE md5(CAST(o_orderkey AS VARCHAR)) LIKE '0%'
"""


def s7_row_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7: COUNT(*) row-count scan per table (discovery.py:348-357)."""
    parts = []
    for t in ("region", "nation", "customer", "supplier", "part", "orders", "lineitem"):
        parts.append(
            load_table(spark, sf_dir, t).agg(
                F.lit(t).alias("table_name"), F.count("*").alias("row_count")
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


S7_ORACLE = """
SELECT 'region' AS table_name, COUNT(*) AS row_count FROM region
UNION ALL SELECT 'nation', COUNT(*) FROM nation
UNION ALL SELECT 'customer', COUNT(*) FROM customer
UNION ALL SELECT 'supplier', COUNT(*) FROM supplier
UNION ALL SELECT 'part', COUNT(*) FROM part
UNION ALL SELECT 'orders', COUNT(*) FROM orders
UNION ALL SELECT 'lineitem', COUNT(*) FROM lineitem
"""


def a1_row_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: global COUNT(*) (validator.py:193-215)."""
    return load_table(spark, sf_dir, "lineitem").agg(F.count("*").alias("row_count"))


A1_ORACLE = "SELECT COUNT(*) AS row_count FROM lineitem"


def a2_group_count_by_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: per-date partition counts (validator.py:572-592)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(F.count("*").alias("cnt"))
    )


A2_ORACLE = "SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS cnt FROM orders GROUP BY 1"


def a3_fingerprint_by_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: per-date multi-SUM aggregate fingerprint (validator.py:594-621)
    over the numeric columns — one shuffle for all dates at once instead of
    the reference's monthly chunk loop (validator.py:515-570)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(F.col("l_shipdate").cast("date").alias("d"))
        .agg(
            F.count("*").alias("cnt"),
            F.sum(dec("l_quantity")).cast("decimal(38,2)").alias("s_quantity"),
            F.sum(dec("l_extendedprice")).cast("decimal(38,2)").alias("s_extendedprice"),
            F.sum(dec("l_discount")).cast("decimal(38,2)").alias("s_discount"),
            F.sum(dec("l_tax")).cast("decimal(38,2)").alias("s_tax"),
        )
    )


A3_ORACLE = """
SELECT CAST(l_shipdate AS DATE) AS d, COUNT(*) AS cnt,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS s_quantity,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS s_extendedprice,
       CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS s_discount,
       CAST(SUM(CAST(l_tax AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS s_tax
FROM lineitem GROUP BY 1
"""


def a4_null_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: per-column NULL counts (validator.py:633-673) — the reference
    chunks 50 columns per query; Spark does all columns in ONE pass."""
    li = load_table(spark, sf_dir, "lineitem")
    aggs = [F.count("*").alias("row_count")] + [
        (F.count("*") - F.count(c)).alias(f"nulls_{c}") for c in li.columns
    ]
    return li.agg(*aggs)


A4_ORACLE = "SELECT COUNT(*) AS row_count, " + ", ".join(
    f"COUNT(*) - COUNT({c}) AS nulls_{c}"
    for c in (
        "l_orderkey l_partkey l_suppkey l_linenumber l_quantity l_extendedprice "
        "l_discount l_tax l_returnflag l_linestatus l_shipdate".split()
    )
) + " FROM lineitem"


def a5_minmax_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: per-column MIN/MAX (validator.py:675-718), all in one pass
    instead of 25-pairs-per-query chunks. MIN/MAX of doubles is exact
    (no arithmetic), so raw doubles are safe here."""
    li = load_table(spark, sf_dir, "lineitem")
    num_cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    aggs = []
    for c in num_cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    aggs.append(F.min(F.col("l_shipdate").cast("date")).alias("min_l_shipdate"))
    aggs.append(F.max(F.col("l_shipdate").cast("date")).alias("max_l_shipdate"))
    return li.agg(*aggs)


A5_ORACLE = (
    "SELECT "
    + ", ".join(
        f"MIN({c}) AS min_{c}, MAX({c}) AS max_{c}"
        for c in ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    )
    + ", MIN(CAST(l_shipdate AS DATE)) AS min_l_shipdate"
    + ", MAX(CAST(l_shipdate AS DATE)) AS max_l_shipdate FROM lineitem"
)


def a6_date_chunk_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: MIN/MAX date + month-chunk count (the validator's chunk planner,
    validator.py:515-570). The chunk *loop* itself disappears in Spark; we
    keep the planner math as a query."""
    li = load_table(spark, sf_dir, "lineitem")
    b = li.agg(
        F.min(F.col("l_shipdate").cast("date")).alias("min_d"),
        F.max(F.col("l_shipdate").cast("date")).alias("max_d"),
    )
    return b.select(
        "min_d",
        "max_d",
        (
            (F.year("max_d") * 12 + F.month("max_d"))
            - (F.year("min_d") * 12 + F.month("min_d"))
            + 1
        ).cast("bigint").alias("n_month_chunks"),
    )


A6_ORACLE = """
SELECT min_d, max_d,
       CAST((YEAR(max_d)*12 + MONTH(max_d)) - (YEAR(min_d)*12 + MONTH(min_d)) + 1 AS BIGINT)
         AS n_month_chunks
FROM (SELECT MIN(CAST(l_shipdate AS DATE)) AS min_d, MAX(CAST(l_shipdate AS DATE)) AS max_d
      FROM lineitem)
"""


def a7_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT aggregation + multi-agg rollup stats (beyond-reference
    floor per SURVEY §2.4 note)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.count("*").alias("cnt"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.sum(dec("o_totalprice")).cast("decimal(38,2)").alias("s_totalprice"),
        (F.sum(dec("o_totalprice")).cast("double") / F.count("*")).alias("avg_totalprice"),
    )


A7_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS cnt, COUNT(DISTINCT o_custkey) AS n_customers,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS s_totalprice,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_totalprice
FROM orders GROUP BY o_orderpriority
"""


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H-Q1-flavored pricing summary — the A1+A3 validation
    kernel (counts + multi-SUM fingerprint) as one declarative plan."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    price = dec("l_extendedprice")
    disc_price = (price * (one() - dec("l_discount"))).cast("decimal(18,4)")
    charge = disc_price * (one() + dec("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("decimal(38,2)").alias("sum_qty"),
            F.sum(price).cast("decimal(38,2)").alias("sum_base_price"),
            F.sum(disc_price).cast("decimal(38,4)").alias("sum_disc_price"),
            F.sum(charge).cast("decimal(38,6)").alias("sum_charge"),
            (F.sum(dec("l_quantity")).cast("double") / F.count("*")).alias("avg_qty"),
            (F.sum(price).cast("double") / F.count("*")).alias("avg_price"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_ORACLE = """
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_base_price,
  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST('1.00' AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS sum_disc_price,
  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST('1.00' AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4)) * (CAST('1.00' AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DECIMAL(38,6)) AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------
# J1-J6: joins
# --------------------------------------------------------------------------

def j1_equi_join_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1/J2-style equi join chain over the catalog-shaped dims
    (discovery.py:256-321's INFORMATION_SCHEMA joins re-shaped onto the
    fixture star schema). Both dims are broadcast — no shuffle of customer."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum(dec("c_acctbal")).cast("decimal(38,2)").alias("s_acctbal"),
        )
    )


J1_ORACLE = """
SELECT r_name, COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS s_acctbal
FROM customer JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def j2_multiway_join_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way join + agg + deterministic top-k (TPC-H-Q3 flavor):
    customer ⋈ orders ⋈ lineitem, revenue per order. customer side is
    broadcast; orders⋈lineitem shuffles on the join key only."""
    customer = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    revenue = (dec("l_extendedprice") * (one() - dec("l_discount"))).cast("decimal(18,4)")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("o_orderkey", F.col("o_orderdate").cast("date").alias("o_orderdate"))
        .agg(F.sum(revenue).cast("decimal(38,4)").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


J2_ORACLE = """
SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST('1.00' AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey, CAST(o_orderdate AS DATE)
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


def j3_point_lookup_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: the validator's per-row PK point lookup (validator.py:786-802,
    one query per sampled row) re-expressed as ONE broadcast hash join of
    the deterministic sample against the big table."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    sample = orders.filter(md5_bucket("o_orderkey", "00")).select("o_orderkey")
    return (
        li.join(F.broadcast(sample), li.l_orderkey == sample.o_orderkey)
        .groupBy("o_orderkey")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(dec("l_quantity")).cast("decimal(38,2)").alias("s_qty"),
        )
    )


J3_ORACLE = """
SELECT o_orderkey, COUNT(*) AS n_lines,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS s_qty
FROM lineitem JOIN (
  SELECT o_orderkey FROM orders WHERE md5(CAST(o_orderkey AS VARCHAR)) LIKE '00%'
) s ON l_orderkey = o_orderkey
GROUP BY o_orderkey
"""


def j4_fullouter_key_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: full-outer key alignment of two per-date aggregates
    (validator.py:255-263's Python dict-union compare → one full_outer
    join with COALESCE(cnt, 0))."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    o = orders.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.count("*").alias("order_cnt")
    )
    l = li.groupBy(F.col("l_shipdate").cast("date").alias("d")).agg(
        F.count("*").alias("lineitem_cnt")
    )
    return o.join(l, "d", "full_outer").select(
        "d",
        F.coalesce("order_cnt", F.lit(0)).alias("order_cnt"),
        F.coalesce("lineitem_cnt", F.lit(0)).alias("lineitem_cnt"),
    )


J4_ORACLE = """
SELECT COALESCE(o.d, l.d) AS d,
       COALESCE(order_cnt, 0) AS order_cnt,
       COALESCE(lineitem_cnt, 0) AS lineitem_cnt
FROM (SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS order_cnt FROM orders GROUP BY 1) o
FULL OUTER JOIN (SELECT CAST(l_shipdate AS DATE) AS d, COUNT(*) AS lineitem_cnt FROM lineitem GROUP BY 1) l
ON o.d = l.d
"""


def j5_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: anti-join 'missing rows' semantics (validator.py:433-435) —
    customers with no high-value order."""
    customer = load_table(spark, sf_dir, "customer")
    big_orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 300000
    )
    return (
        customer.join(big_orders, customer.c_custkey == big_orders.o_custkey, "left_anti")
        .select("c_custkey", "c_mktsegment")
    )


J5_ORACLE = """
SELECT c_custkey, c_mktsegment FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000
)
"""


def j6_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join: customers with at least one URGENT order, counted per
    market segment."""
    customer = load_table(spark, sf_dir, "customer")
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        customer.join(urgent, customer.c_custkey == urgent.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


J6_ORACLE = """
SELECT c_mktsegment, COUNT(*) AS n_customers FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
GROUP BY c_mktsegment
"""


# --------------------------------------------------------------------------
# Set operations (SURVEY §2.5)
# --------------------------------------------------------------------------

def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.union(s).distinct()


SET_UNION_ORACLE = """
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey AS nationkey FROM supplier
"""


def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.intersect(s)


SET_INTERSECT_ORACLE = """
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
"""


def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.subtract(s)


SET_EXCEPT_ORACLE = """
SELECT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT s_nationkey AS nationkey FROM supplier
"""


# --------------------------------------------------------------------------
# Window functions (SURVEY §2.5 extension floor)
# --------------------------------------------------------------------------

def w1_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number top-k per group — the dedup-keep-first kernel."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    j = orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "c_mktsegment",
            F.col("rn").cast("bigint").alias("rn"),
            "o_orderkey",
            dec("o_totalprice").alias("o_totalprice"),
        )
    )


W1_ORACLE = """
SELECT c_mktsegment, CAST(rn AS BIGINT) AS rn, o_orderkey,
       CAST(o_totalprice AS DECIMAL(18,2)) AS o_totalprice
FROM (
  SELECT c_mktsegment, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders JOIN customer ON o_custkey = c_custkey
) WHERE rn <= 3
"""


def w2_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag(): days since each customer's previous order."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    d = F.col("o_orderdate").cast("date")
    return (
        orders.withColumn("prev_d", F.lag(d).over(w))
        .select(
            "o_custkey",
            "o_orderkey",
            d.alias("d"),
            F.datediff(d, F.col("prev_d")).cast("bigint").alias("days_since_prev"),
        )
    )


W2_ORACLE = """
SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS d,
       CAST(datediff('day',
            LAG(CAST(o_orderdate AS DATE)) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
            CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since_prev
FROM orders
"""


def w3_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-customer spend (cumulative window sum on exact decimals)."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec("o_totalprice")).over(w).cast("decimal(38,2)").alias("running_spend"),
    )


W3_ORACLE = """
SELECT o_custkey, o_orderkey,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(38,2)) AS running_spend
FROM orders
"""


def w4_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank over a deterministic total order, restricted to
    the top 25. A global window + rank<=25 filter would move ALL data to
    one partition (WindowExec's no-partition warning — the 100 TB
    serial bottleneck); since the order is total (custkey tiebreak),
    rank==row_number, so the top-25 *set* is computed first as a
    distributed `TakeOrderedAndProject` and the window only ranks those
    25 survivors. Same result, no full-data single-partition stage."""
    customer = load_table(spark, sf_dir, "customer")
    order = [F.col("c_acctbal").desc(), F.col("c_custkey")]
    top = customer.orderBy(*order).limit(25)
    w = Window.orderBy(*order)
    return top.select(
        "c_custkey",
        dec("c_acctbal").alias("c_acctbal"),
        F.rank().over(w).cast("bigint").alias("bal_rank"),
        F.dense_rank().over(w).cast("bigint").alias("bal_dense_rank"),
    )


W4_ORACLE = """
SELECT * FROM (
  SELECT c_custkey, CAST(c_acctbal AS DECIMAL(18,2)) AS c_acctbal,
         CAST(RANK() OVER (ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS bal_rank,
         CAST(DENSE_RANK() OVER (ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS bal_dense_rank
  FROM customer
) WHERE bal_rank <= 25
"""


# --------------------------------------------------------------------------
# Grouping sets / rollup / cube (beyond-reference floor)
# --------------------------------------------------------------------------

def g1_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP subtotals — computed over finest-level PARTIALS, not raw
    rows. A naive ``df.rollup(a, b)`` plans Expand×3 over the INPUT
    (every lineitem row triplicated before the hash aggregate — 300 TB
    of expand output on a 100 TB table); count/sum re-aggregate exactly,
    so the rollup here runs on the grouped base (|a|×|b| rows, single
    digits) after ONE ordinary map-side-combined aggregation. Same
    result, one corpus shuffle, Expand cost ~zero."""
    li = load_table(spark, sf_dir, "lineitem")
    base = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("_cnt"),
        F.sum(dec("l_quantity")).alias("_qty"),
    )
    return (
        base.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum("_cnt").alias("cnt"),
            F.sum("_qty").cast("decimal(38,2)").alias("s_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("l_returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("l_linestatus"),
            "cnt",
            "s_qty",
        )
    )


G1_ORACLE = """
SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
       COALESCE(l_linestatus, 'ALL') AS l_linestatus,
       COUNT(*) AS cnt,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS s_qty
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def g2_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("cnt"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("o_orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("o_orderpriority"),
            "cnt",
        )
    )


G2_ORACLE = """
SELECT COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
       COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
       COUNT(*) AS cnt
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


def g3_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY + HAVING (beyond-reference floor)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_partkey")
        .agg(F.count("*").alias("cnt"), F.sum(dec("l_quantity")).cast("decimal(38,2)").alias("s_qty"))
        .filter(F.col("cnt") >= 40)
    )


G3_ORACLE = """
SELECT l_partkey, COUNT(*) AS cnt,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS s_qty
FROM lineitem GROUP BY l_partkey HAVING COUNT(*) >= 40
"""


_PROFILE_COLS = [
    ("o_orderkey", "int"),
    ("o_custkey", "int"),
    ("o_orderstatus", "str"),
    ("o_totalprice", "num"),
    ("o_orderdate", "ts"),
    ("o_orderpriority", "str"),
]


def s13_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generic column profile (the discovery report an ETL tool publishes
    per table): null count, exact distinct count, and canonicalized
    min/max per column — numerics via DECIMAL(28,6) strings, timestamps
    via a fixed format, so the report is engine-portable.

    Two column-pruned passes, both fully parallel:
    * nulls + typed min/max in ONE narrow HashAggregate (every statistic
      map-side combinable; per-column rows from an inline explode of
      the single result row);
    * exact distincts via explode-to-(column, value) + a TWO-PHASE hash
      aggregation. Packing six COUNT(DISTINCT)s into the first pass
      instead planned an Expand (row ×6) feeding SortAggregates — the
      multi-distinct antipattern; measured 3.6 s vs ~1 s at sf0.1, and
      the sort/expand cost scales with the table. Distinctness is
      counted on the string form, which is injective per engine, so the
      counts equal COUNT(DISTINCT col) on the typed values."""
    orders = load_table(spark, sf_dir, "orders")

    def canon(c: str, kind: str, agg) -> Column:
        col = agg(F.col(c))
        if kind == "num":
            return col.cast("decimal(28,6)").cast("string")
        if kind == "ts":
            return F.date_format(col, "yyyy-MM-dd HH:mm:ss")
        return col.cast("string")

    aggs = []
    for c, kind in _PROFILE_COLS:
        aggs += [
            F.count(F.when(F.col(c).isNull(), 1)).cast("bigint").alias(f"{c}__nulls"),
            canon(c, kind, F.min).alias(f"{c}__min"),
            canon(c, kind, F.max).alias(f"{c}__max"),
        ]
    one_row = orders.agg(*aggs)
    structs = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col(f"{c}__nulls").alias("n_nulls"),
                F.col(f"{c}__min").alias("min_s"),
                F.col(f"{c}__max").alias("max_s"),
            )
            for c, _ in _PROFILE_COLS
        ]
    )
    base = one_row.select(F.explode(structs).alias("p")).select("p.*")

    pairs = orders.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column_name"),
                        F.col(c).cast("string").alias("v"),
                    )
                    for c, _ in _PROFILE_COLS
                ]
            )
        ).alias("p")
    ).select("p.*")
    nd = (
        pairs.filter(F.col("v").isNotNull())
        .groupBy("column_name", "v")
        .agg(F.lit(1).alias("_one"))
        .groupBy("column_name")
        .agg(F.count("*").cast("bigint").alias("n_distinct"))
    )
    # LEFT join + coalesce(0): a column whose values are all NULL has no
    # row in nd, and an inner join would silently drop it from the
    # profile while the oracle reports it with n_distinct = 0.
    return base.join(F.broadcast(nd), "column_name", "left").select(
        "column_name",
        "n_nulls",
        F.coalesce(F.col("n_distinct"), F.lit(0).cast("bigint")).alias("n_distinct"),
        "min_s",
        "max_s",
    )


def _profile_oracle() -> str:
    selects = []
    for c, kind in _PROFILE_COLS:
        if kind == "num":
            mn = f"CAST(CAST(MIN({c}) AS DECIMAL(28,6)) AS VARCHAR)"
            mx = f"CAST(CAST(MAX({c}) AS DECIMAL(28,6)) AS VARCHAR)"
        elif kind == "ts":
            mn = f"strftime(MIN({c}), '%Y-%m-%d %H:%M:%S')"
            mx = f"strftime(MAX({c}), '%Y-%m-%d %H:%M:%S')"
        else:
            mn = f"CAST(MIN({c}) AS VARCHAR)"
            mx = f"CAST(MAX({c}) AS VARCHAR)"
        selects.append(
            f"SELECT '{c}' AS column_name,"
            f" CAST(COUNT(CASE WHEN {c} IS NULL THEN 1 END) AS BIGINT) AS n_nulls,"
            f" CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,"
            f" {mn} AS min_s, {mx} AS max_s FROM orders"
        )
    return "\nUNION ALL\n".join(selects)


S13_PROFILE_ORACLE = _profile_oracle()


SPECS = [
    QuerySpec("q1_pricing_summary", q1_pricing_summary, Q1_ORACLE, "flagship A1+A3 kernel"),
    QuerySpec("s1_scan_filter_projection", s1_scan_filter_projection, S1_ORACLE),
    QuerySpec("s7_row_counts", s7_row_counts, S7_ORACLE),
    QuerySpec("s10_deterministic_sample", s10_deterministic_sample, S10_ORACLE),
    QuerySpec("s13_profile_table", s13_profile_table, S13_PROFILE_ORACLE),
    QuerySpec("p1_projection_varchar_cast", p1_projection_varchar_cast, P1_ORACLE),
    QuerySpec("p2_where_pushdown", p2_where_pushdown, P2_ORACLE),
    QuerySpec("p3_date_range", p3_date_range, P3_ORACLE),
    QuerySpec("p4_order_limit", p4_order_limit, P4_ORACLE),
    QuerySpec("p5_offset_pagination", p5_offset_pagination, P5_ORACLE),
    QuerySpec("a1_row_count", a1_row_count, A1_ORACLE),
    QuerySpec("a2_group_count_by_date", a2_group_count_by_date, A2_ORACLE),
    QuerySpec("a3_fingerprint_by_date", a3_fingerprint_by_date, A3_ORACLE),
    QuerySpec("a4_null_counts", a4_null_counts, A4_ORACLE),
    QuerySpec("a5_minmax_stats", a5_minmax_stats, A5_ORACLE),
    QuerySpec("a6_date_chunk_bounds", a6_date_chunk_bounds, A6_ORACLE),
    QuerySpec("a7_distinct_agg", a7_distinct_agg, A7_ORACLE),
    QuerySpec("j1_equi_join_chain", j1_equi_join_chain, J1_ORACLE),
    QuerySpec("j2_multiway_join_topk", j2_multiway_join_topk, J2_ORACLE),
    QuerySpec("j3_point_lookup_join", j3_point_lookup_join, J3_ORACLE),
    QuerySpec("j4_fullouter_key_align", j4_fullouter_key_align, J4_ORACLE),
    QuerySpec("j5_anti_join", j5_anti_join, J5_ORACLE),
    QuerySpec("j6_semi_join", j6_semi_join, J6_ORACLE),
    QuerySpec("set_union_distinct", set_union_distinct, SET_UNION_ORACLE),
    QuerySpec("set_intersect", set_intersect, SET_INTERSECT_ORACLE),
    QuerySpec("set_except", set_except, SET_EXCEPT_ORACLE),
    QuerySpec("w1_topk_per_group", w1_topk_per_group, W1_ORACLE),
    QuerySpec("w2_lag_delta", w2_lag_delta, W2_ORACLE),
    QuerySpec("w3_running_sum", w3_running_sum, W3_ORACLE),
    QuerySpec("w4_rank_dense", w4_rank_dense, W4_ORACLE),
    QuerySpec("g1_rollup", g1_rollup, G1_ORACLE),
    QuerySpec("g2_cube", g2_cube, G2_ORACLE),
    QuerySpec("g3_having", g3_having, G3_ORACLE),
]


def w5_ntile_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile / percent_rank / cume_dist over a deterministic total order
    per nation — the quantile-bucketing window family. One shuffle on
    c_nationkey; with a unique (acctbal, custkey) sort there are no
    peer rows, so the rank-ratio outputs are small-integer ratios and
    bit-identical as doubles on both engines."""
    customer = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return customer.select(
        "c_custkey",
        "c_nationkey",
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )


W5_ORACLE = """
SELECT c_custkey, c_nationkey,
       CAST(ntile(4) OVER w AS BIGINT) AS quartile,
       percent_rank() OVER w AS pr,
       cume_dist() OVER w AS cd
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
"""


def a13_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT discrete percentiles (p50/p90 of l_quantity per returnflag)
    via the row_number-at-index formulation — written identically in the
    oracle so the pick is engine-independent (built-in percentile_disc
    variants disagree across engines on index rounding; approx_percentile
    is sketch-based and not oracle-stable).

    Scale shape: one window sort per group — the standard exact-quantile
    plan. At 100 TB you'd reach for approx_percentile (x_approx_sketches)
    unless exactness is contractual; this operator is the exact
    contract."""
    li = load_table(spark, sf_dir, "lineitem")
    base = li.select("l_returnflag", dec("l_quantity").alias("q"))
    # Histogram formulation: the raw rows reduce to (group, value, count)
    # in one fully-parallel aggregate; the window then walks the
    # *histogram* (≤ |distinct values| rows per group — l_quantity has
    # ~50), not the fact table. A row_number over raw rows would sort
    # each group's full data inside one task at 100 TB; this shape keeps
    # the heavy lifting in the hash aggregate. Value at index k =
    # the histogram row whose cumulative range [cum−c, cum) covers k.
    hist = base.groupBy("l_returnflag", "q").agg(F.count("*").alias("c"))
    w = Window.partitionBy("l_returnflag").orderBy("q")
    wn = Window.partitionBy("l_returnflag")
    t = hist.select(
        "l_returnflag",
        "q",
        F.col("c"),
        F.sum("c").over(w).alias("cum"),
        F.sum("c").over(wn).alias("n"),
    )
    covers = lambda k: (F.col("cum") - F.col("c") < k) & (k <= F.col("cum"))  # noqa: E731
    return t.groupBy("l_returnflag").agg(
        F.max(F.when(covers(F.ceil(F.col("n") * 0.5)), F.col("q"))).alias("p50"),
        F.max(F.when(covers(F.ceil(F.col("n") * 0.9)), F.col("q"))).alias("p90"),
    )


A13_ORACLE = """
WITH t AS (
  SELECT l_returnflag, CAST(l_quantity AS DECIMAL(18,2)) AS q,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag
                            ORDER BY CAST(l_quantity AS DECIMAL(18,2))) AS rn,
         COUNT(*) OVER (PARTITION BY l_returnflag) AS n
  FROM lineitem
)
SELECT l_returnflag,
       MAX(CASE WHEN rn = CAST(ceil(n * 0.5) AS BIGINT) THEN q END) AS p50,
       MAX(CASE WHEN rn = CAST(ceil(n * 0.9) AS BIGINT) THEN q END) AS p90
FROM t GROUP BY l_returnflag
"""


SPECS.append(QuerySpec("w5_ntile_cume", w5_ntile_cume, W5_ORACLE))
SPECS.append(QuerySpec("a13_exact_percentiles", a13_exact_percentiles, A13_ORACLE))


def s11_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sample (the S10 md5-bucket sampler with
    per-stratum rates): the stratum under analysis (AUTOMOBILE) keeps
    ~1/16 of rows, every other segment ~1/256 — the shape used to
    oversample a slice while keeping corpus-wide context. Deterministic
    (hash-bucket, not rand()), so it is oracle-checkable and stable
    across retries — the property the reference's OFFSET-resume sampling
    lacked. Pure filter: pushes to the scan, no shuffle."""
    c = load_table(spark, sf_dir, "customer")
    keep = F.expr(
        "substr(md5(cast(c_custkey as string)), 1, length("
        "CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN '0' ELSE '00' END)) = "
        "CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN '0' ELSE '00' END"
    )
    return (
        c.filter(keep)
        .select("c_custkey", "c_mktsegment", "c_nationkey")
    )


S11_ORACLE = """
SELECT c_custkey, c_mktsegment, c_nationkey
FROM customer
WHERE substr(md5(CAST(c_custkey AS VARCHAR)), 1,
             length(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN '0' ELSE '00' END))
      = CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN '0' ELSE '00' END
"""


SPECS.append(QuerySpec("s11_stratified_sample", s11_stratified_sample, S11_ORACLE))


def w6_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-framed window: per customer, the order count and spend in
    the trailing 30 days of each order (RANGE BETWEEN is value-based —
    peers at the same date share a frame — vs the ROWS frames of
    w1-w5). Ordered by epoch seconds so the frame bound is numeric and
    identical in both engines; one shuffle on o_custkey."""
    orders = load_table(spark, sf_dir, "orders")
    sec = F.unix_timestamp(F.col("o_orderdate").cast("timestamp"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(sec)
        .rangeBetween(-30 * 86400, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("d"),
        F.count("*").over(w).cast("bigint").alias("orders_30d"),
        F.sum(dec("o_totalprice")).over(w).cast("decimal(38,2)").alias("spend_30d"),
    )


W6_ORACLE = """
SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS d,
       CAST(COUNT(*) OVER w AS BIGINT) AS orders_30d,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DECIMAL(38,2)) AS spend_30d
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY epoch(CAST(o_orderdate AS TIMESTAMP))
             RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)
"""


SPECS.append(QuerySpec("w6_range_frame", w6_range_frame, W6_ORACLE))


def w7_value_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value over an explicit full frame
    — the value-function window family. The frame is pinned to the
    whole partition (ROWS UNBOUNDED PRECEDING→FOLLOWING) because
    last_value over the default frame is the classic SQL footgun."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w).alias("last_order"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
    )


W7_ORACLE = """
SELECT o_custkey, o_orderkey,
       first_value(o_orderkey) OVER w AS first_order,
       last_value(o_orderkey) OVER w AS last_order,
       nth_value(o_orderkey, 2) OVER w AS second_order
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


def a14_percentile_cont(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated (PERCENTILE_CONT) p50/p90 of o_totalprice per order
    status, via the explicit rank-interpolation formulation written
    identically in the oracle: h = 1+(n-1)·q; interpolate between the
    values at floor(h) and ceil(h). The interpolation happens in IEEE
    doubles on exact-decimal inputs — identical in both engines —
    rather than trusting each engine's percentile_cont internals."""
    li = load_table(spark, sf_dir, "orders")
    base = li.select("o_orderstatus", dec("o_totalprice").alias("v"))
    w = Window.partitionBy("o_orderstatus").orderBy("v")
    wn = Window.partitionBy("o_orderstatus")
    t = base.select(
        "o_orderstatus",
        "v",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )

    def interp(q: float):
        h = F.lit(1.0) + (F.col("n") - 1).cast("double") * F.lit(q)
        lo = F.max(
            F.when(F.col("rn") == F.floor(h).cast("bigint"), F.col("v"))
        ).cast("double")
        hi = F.max(
            F.when(F.col("rn") == F.ceil(h).cast("bigint"), F.col("v"))
        ).cast("double")
        frac = F.max(h - F.floor(h))
        return lo + (hi - lo) * frac

    # DECIMAL(18,6)-rounded: DuckDB contracts the a+(b-a)*f chain with
    # FMA, which can differ from the JVM's two-rounding result by 1 ULP
    g = t.groupBy("o_orderstatus", "n").agg(
        interp(0.5).cast("decimal(18,6)").alias("p50_cont"),
        interp(0.9).cast("decimal(18,6)").alias("p90_cont"),
    )
    return g.select(
        "o_orderstatus", F.col("n").cast("bigint").alias("n"), "p50_cont", "p90_cont"
    )


_A14_RAW = """
WITH t AS (
  SELECT o_orderstatus, CAST(o_totalprice AS DECIMAL(18,2)) AS v,
         ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                            ORDER BY CAST(o_totalprice AS DECIMAL(18,2))) AS rn,
         COUNT(*) OVER (PARTITION BY o_orderstatus) AS n
  FROM orders
)
SELECT o_orderstatus, CAST(n AS BIGINT) AS n,
       MAX(CASE WHEN rn = CAST(floor(1.0 + (n-1) * 0.5) AS BIGINT) THEN CAST(v AS DOUBLE) END)
         + (MAX(CASE WHEN rn = CAST(ceil(1.0 + (n-1) * 0.5) AS BIGINT) THEN CAST(v AS DOUBLE) END)
            - MAX(CASE WHEN rn = CAST(floor(1.0 + (n-1) * 0.5) AS BIGINT) THEN CAST(v AS DOUBLE) END))
           * MAX((1.0 + (n-1) * 0.5) - floor(1.0 + (n-1) * 0.5)) AS p50_raw,
       MAX(CASE WHEN rn = CAST(floor(1.0 + (n-1) * 0.9) AS BIGINT) THEN CAST(v AS DOUBLE) END)
         + (MAX(CASE WHEN rn = CAST(ceil(1.0 + (n-1) * 0.9) AS BIGINT) THEN CAST(v AS DOUBLE) END)
            - MAX(CASE WHEN rn = CAST(floor(1.0 + (n-1) * 0.9) AS BIGINT) THEN CAST(v AS DOUBLE) END))
           * MAX((1.0 + (n-1) * 0.9) - floor(1.0 + (n-1) * 0.9)) AS p90_raw
FROM t GROUP BY o_orderstatus, n
"""

A14_ORACLE = f"""
SELECT o_orderstatus, n,
       CAST(p50_raw AS DECIMAL(18,6)) AS p50_cont,
       CAST(p90_raw AS DECIMAL(18,6)) AS p90_cont
FROM ({_A14_RAW}) __raw
"""


SPECS.append(QuerySpec("w7_value_functions", w7_value_functions, W7_ORACLE))
SPECS.append(QuerySpec("a14_percentile_cont", a14_percentile_cont, A14_ORACLE))
