"""Bucketed co-located join: zero Exchange in the join plan."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from snowflake_to_postgres_spark.sources import load_table
from snowflake_to_postgres_spark.sources.bucketed import (
    bucketed_pair_join,
    write_bucketed_table,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    write_bucketed_table(li, "b_lineitem", "l_orderkey", 8, sorted_by="l_orderkey")
    write_bucketed_table(orders, "b_orders", "o_orderkey", 8, sorted_by="o_orderkey")
    yield "b_lineitem", "b_orders"
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")


def test_bucketed_join_has_no_exchange(spark, sf_dir, bucketed_tables):
    lt, rt = bucketed_tables
    # disable auto-broadcast so the small fixture doesn't trivially
    # sidestep the shuffle question
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_pair_join(spark, lt, rt, "l_orderkey", "o_orderkey")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        # and the result is correct
        expected = (
            load_table(spark, sf_dir, "lineitem")
            .join(
                load_table(spark, sf_dir, "orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .count()
        )
        assert j.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_bucketed_groupby_has_no_exchange(spark, bucketed_tables):
    lt, _ = bucketed_tables
    agg = spark.table(lt).groupBy("l_orderkey").agg(F.count("*").alias("c"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
