"""Salting rewrites must be result-identical to the unsalted plans."""

from __future__ import annotations

import pyspark.sql.functions as F

from snowflake_to_postgres_spark.operators.common import dec
from snowflake_to_postgres_spark.operators.skew import salted_agg, salted_join
from snowflake_to_postgres_spark.sources import load_table


def _sorted_rows(df):
    return sorted(tuple(str(x) for x in r) for r in df.collect())


def test_salted_agg_equals_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    plain = li.groupBy("l_returnflag").agg(
        F.count("*").alias("cnt"),
        F.sum(dec("l_quantity")).cast("decimal(38,2)").alias("s_qty"),
    )
    salted = salted_agg(
        li,
        "l_returnflag",
        "l_orderkey",
        {
            "cnt": F.count("*"),
            "s_qty": F.sum(dec("l_quantity")),
        },
    ).select(
        "l_returnflag",
        F.col("cnt").cast("bigint").alias("cnt"),
        F.col("s_qty").cast("decimal(38,2)").alias("s_qty"),
    )
    assert _sorted_rows(salted) == _sorted_rows(plain)


def test_salted_join_equals_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus"
    )
    plain = li.join(orders, "l_orderkey")
    salted = salted_join(li, orders, "l_orderkey", "l_quantity", buckets=8)
    assert plain.count() == salted.count()
    assert _sorted_rows(salted.select(*sorted(salted.columns))) == _sorted_rows(
        plain.select(*sorted(plain.columns))
    )
