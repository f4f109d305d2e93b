"""Breadth operators: pivot/unpivot, bag-semantics set ops, date
arithmetic, schema-full VARIANT parsing, fuzzy string matching.

Fills the remaining vocabulary a reference user could reach for that no
other module covers (SURVEY §2.4/§2.5 'floor' notes)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from snowflake_to_postgres_spark.operators.common import dec
from snowflake_to_postgres_spark.registry import QuerySpec
from snowflake_to_postgres_spark.sources import load_table

_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


def a9_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order counts by status × priority. Pinning the pivot values
    keeps the plan single-pass (no distinct-values pre-scan)."""
    orders = load_table(spark, sf_dir, "orders")
    piv = (
        orders.groupBy("o_orderstatus")
        .pivot("o_orderpriority", _PRIORITIES)
        .agg(F.count(F.lit(1)))
    )
    cols = [F.col("o_orderstatus")] + [
        F.coalesce(F.col(f"`{p}`"), F.lit(0)).cast("bigint").alias(f"p{i + 1}")
        for i, p in enumerate(_PRIORITIES)
    ]
    return piv.select(*cols)


A9_ORACLE = """
SELECT o_orderstatus,
       COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS p1,
       COUNT(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS p2,
       COUNT(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS p3,
       COUNT(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS p4,
       COUNT(*) FILTER (WHERE o_orderpriority = '5-LOW') AS p5
FROM orders GROUP BY o_orderstatus
"""


def a10_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): lineitem money columns to (measure, value) rows."""
    li = load_table(spark, sf_dir, "lineitem")
    narrow = li.select(
        "l_orderkey",
        "l_linenumber",
        dec("l_extendedprice").alias("extendedprice"),
        dec("l_discount").alias("discount"),
        dec("l_tax").alias("tax"),
    )
    melted = narrow.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["extendedprice", "discount", "tax"],
        "measure",
        "value",
    )
    return melted.groupBy("measure").agg(
        F.count("*").alias("cnt"),
        F.sum("value").cast("decimal(38,2)").alias("s_value"),
    )


A10_ORACLE = """
SELECT measure, COUNT(*) AS cnt, CAST(SUM(value) AS DECIMAL(38,2)) AS s_value
FROM (
  SELECT 'extendedprice' AS measure, CAST(l_extendedprice AS DECIMAL(18,2)) AS value FROM lineitem
  UNION ALL SELECT 'discount', CAST(l_discount AS DECIMAL(18,2)) FROM lineitem
  UNION ALL SELECT 'tax', CAST(l_tax AS DECIMAL(18,2)) FROM lineitem
)
GROUP BY measure
"""


def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics UNION ALL (keeps duplicates) — counted per key so
    the multiplicity is visible in the result."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.unionAll(s).groupBy("nationkey").agg(F.count("*").alias("cnt"))


SET_UNION_ALL_ORACLE = """
SELECT nationkey, COUNT(*) AS cnt FROM (
  SELECT c_nationkey AS nationkey FROM customer
  UNION ALL SELECT s_nationkey FROM supplier
) GROUP BY nationkey
"""


def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL bag semantics: each supplier occurrence cancels one
    customer occurrence of the same nationkey."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.exceptAll(s).groupBy("nationkey").agg(F.count("*").alias("cnt"))


SET_EXCEPT_ALL_ORACLE = """
SELECT nationkey, COUNT(*) AS cnt FROM (
  SELECT c_nationkey AS nationkey FROM customer
  EXCEPT ALL
  SELECT s_nationkey FROM supplier
) GROUP BY nationkey
"""


def f13_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic vocabulary: add days/months, month boundaries,
    extraction — on distinct order dates (small output)."""
    orders = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return (
        orders.select(d.alias("d")).distinct()
        .select(
            "d",
            F.date_add("d", 30).alias("plus_30d"),
            F.add_months("d", 2).alias("plus_2m"),
            F.last_day("d").alias("month_end"),
            F.trunc("d", "year").alias("year_start"),
            F.dayofweek("d").cast("bigint").alias("dow"),
            F.weekofyear("d").cast("bigint").alias("iso_week"),
            F.quarter("d").cast("bigint").alias("q"),
        )
    )


F13_ORACLE = """
SELECT d,
       CAST(d + INTERVAL 30 DAY AS DATE) AS plus_30d,
       CAST(d + INTERVAL 2 MONTH AS DATE) AS plus_2m,
       last_day(d) AS month_end,
       CAST(date_trunc('year', d) AS DATE) AS year_start,
       CAST(dayofweek(d) + 1 AS BIGINT) AS dow,
       CAST(weekofyear(d) AS BIGINT) AS iso_week,
       CAST(quarter(d) AS BIGINT) AS q
FROM (SELECT DISTINCT CAST(o_orderdate AS DATE) AS d FROM orders)
"""


def v2_variant_schema_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT with declared schema: from_json(props, 'k BIGINT') — the
    typed parse path (vs v1's path extraction), plus validity flags."""
    events = load_table(spark, sf_dir, "events")
    parsed = events.withColumn("j", F.from_json("props", "k BIGINT"))
    return parsed.groupBy("event_type").agg(
        F.count("j.k").alias("n_parsed"),
        F.sum("j.k").cast("bigint").alias("s_k"),
        F.count(F.when(F.col("j").isNull(), 1)).alias("n_invalid"),
    )


V2_ORACLE = """
SELECT event_type,
       COUNT(CAST(regexp_extract(props, '"k": (-?\\d+)', 1) AS BIGINT)) AS n_parsed,
       CAST(SUM(CAST(regexp_extract(props, '"k": (-?\\d+)', 1) AS BIGINT)) AS BIGINT) AS s_k,
       COUNT(CASE WHEN regexp_extract(props, '"k": (-?\\d+)', 1) = '' THEN 1 END) AS n_invalid
FROM events GROUP BY event_type
"""


def tx_fuzzy_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy matching: supplier-name pairs within edit distance — the
    entity-resolution primitive (cross join bounded to the small dim)."""
    s = load_table(spark, sf_dir, "supplier")
    a = s.select(F.col("s_suppkey").alias("k1"), F.col("s_name").alias("n1"))
    b = s.select(F.col("s_suppkey").alias("k2"), F.col("s_name").alias("n2"))
    return (
        a.crossJoin(b)
        .filter(F.col("k1") < F.col("k2"))
        .select(
            "k1",
            "k2",
            F.levenshtein("n1", "n2").cast("bigint").alias("edit_dist"),
        )
        .filter(F.col("edit_dist") <= 3)
    )


TX_FUZZY_ORACLE = """
SELECT a.s_suppkey AS k1, b.s_suppkey AS k2,
       CAST(levenshtein(a.s_name, b.s_name) AS BIGINT) AS edit_dist
FROM supplier a JOIN supplier b ON a.s_suppkey < b.s_suppkey
WHERE levenshtein(a.s_name, b.s_name) <= 3
"""


SPECS = [
    QuerySpec("a9_pivot", a9_pivot, A9_ORACLE),
    QuerySpec("a10_unpivot", a10_unpivot, A10_ORACLE),
    QuerySpec("set_union_all", set_union_all, SET_UNION_ALL_ORACLE),
    QuerySpec("set_except_all", set_except_all, SET_EXCEPT_ALL_ORACLE),
    QuerySpec("f13_date_arithmetic", f13_date_arithmetic, F13_ORACLE),
    QuerySpec("v2_variant_schema_parse", v2_variant_schema_parse, V2_ORACLE),
    QuerySpec("tx_fuzzy_levenshtein", tx_fuzzy_levenshtein, TX_FUZZY_ORACLE),
]
