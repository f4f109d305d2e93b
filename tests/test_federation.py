"""Federated query: one Catalyst plan joining a parquet table with a
live JDBC table (in-process Derby standing in for Postgres/Snowflake).

This is the capability the reference's architecture structurally lacks:
its extract and load sides are separate programs connected by Python
lists (data_transfer.py), so a cross-system query requires a full copy
first. Spark federates at the PLAN level — the JDBC side arrives as a
scan node with predicate pushdown into the database, the parquet side
broadcasts, and Catalyst plans the join like any other."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from snowflake_to_postgres_spark.sources import load_table
from snowflake_to_postgres_spark.sources.jdbc import JdbcConfig, read_jdbc, write_jdbc

_URL = "jdbc:derby:memory:federation"
_DRIVER = "org.apache.derby.iapi.jdbc.AutoloadedDriver"


@pytest.fixture(scope="module")
def derby_cfg(spark):
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(_URL + ";create=true")
    conn.close()
    yield JdbcConfig(url=_URL, driver=_DRIVER, fetchsize=1000, batchsize=500)
    try:
        jvm.java.sql.DriverManager.getConnection(_URL + ";drop=true")
    except Exception:  # noqa: BLE001 — drop raises 08006 on success
        pass


def _rows(df):
    return sorted(tuple(str(x) for x in r) for r in df.collect())


def test_federated_join_matches_local(spark, sf_dir, derby_cfg):
    """parquet customer ⋈ JDBC orders must equal the same join computed
    entirely over parquet — federation changes the physical source, not
    the semantics."""
    orders = load_table(spark, sf_dir, "orders")
    write_jdbc(orders, derby_cfg, "ORDERS_FED", mode="overwrite")

    cust = load_table(spark, sf_dir, "customer")
    jdbc_orders = read_jdbc(spark, derby_cfg, table="ORDERS_FED")

    def top_spenders(o):
        return (
            o.filter(F.col("o_totalprice") > 100_000)
            .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
            .groupBy("c_mktsegment")
            .agg(
                F.count("*").alias("n"),
                F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                .cast("decimal(38,2)")
                .alias("s"),
            )
        )

    assert _rows(top_spenders(jdbc_orders)) == _rows(top_spenders(orders))


def test_federated_filter_pushes_into_jdbc(spark, sf_dir, derby_cfg):
    """The price predicate must reach the JDBC scan node (the DATABASE
    filters, only matching rows cross the wire) — visible as
    PushedFilters on the JDBC relation in the physical plan."""
    orders = load_table(spark, sf_dir, "orders")
    write_jdbc(orders, derby_cfg, "ORDERS_PUSH", mode="overwrite")
    jdbc_orders = read_jdbc(spark, derby_cfg, table="ORDERS_PUSH")
    q = jdbc_orders.filter(F.col("o_totalprice") > 100_000).select(
        "o_orderkey", "o_totalprice"
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    scan_part = plan[plan.find("JDBCRelation"):][:400] if "JDBCRelation" in plan else plan
    assert "PushedFilters" in plan, plan
    assert "o_totalprice" in scan_part or "O_TOTALPRICE" in scan_part, scan_part
    # column pruning: only the two selected columns are requested
    assert "o_orderdate" not in scan_part and "O_ORDERDATE" not in scan_part, scan_part
    # and the filtered count matches the parquet truth
    assert q.count() == orders.filter(F.col("o_totalprice") > 100_000).count()
