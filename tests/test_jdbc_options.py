"""JDBC option construction (no live database in this environment — the
option maps are the contract Spark's JDBC source consumes)."""

import pytest

from snowflake_to_postgres_spark.sources.jdbc import JdbcConfig, read_options


CFG = JdbcConfig(
    url="jdbc:postgresql://localhost:5432/db",
    user="u",
    password="p",
    driver="org.postgresql.Driver",
    fetchsize=50_000,
)


def test_table_read_options():
    opts = read_options(CFG, table="public.orders")
    assert opts["dbtable"] == "public.orders"
    assert opts["fetchsize"] == "50000"
    assert opts["driver"] == "org.postgresql.Driver"


def test_partitioned_read_options():
    opts = read_options(
        CFG, table="public.orders", partition_column="o_orderkey",
        lower_bound=1, upper_bound=6_000_000, num_partitions=64,
    )
    assert opts["numPartitions"] == "64"
    assert opts["partitionColumn"] == "o_orderkey"
    assert opts["lowerBound"] == "1" and opts["upperBound"] == "6000000"


def test_query_read_options():
    opts = read_options(CFG, query="SELECT 1 AS x")
    assert opts["query"] == "SELECT 1 AS x" and "dbtable" not in opts


def test_invalid_combinations():
    with pytest.raises(ValueError):
        read_options(CFG)
    with pytest.raises(ValueError):
        read_options(CFG, table="t", query="q")
    with pytest.raises(ValueError):
        read_options(CFG, table="t", partition_column="c")  # missing bounds
