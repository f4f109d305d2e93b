"""Live JDBC round-trips against Derby (S1 read / S12 batched-INSERT
write): the option maps in test_jdbc_options are the contract; these
tests drive the actual Spark JDBC source/sink end-to-end, including the
partitioned-read path that gives intra-table parallelism (the
reference's documented bottleneck, SURVEY §4)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from snowflake_to_postgres_spark.sources import load_table
from snowflake_to_postgres_spark.sources.jdbc import JdbcConfig, read_jdbc, write_jdbc

_URL = "jdbc:derby:memory:jdbc_roundtrip"
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


def test_write_then_read_roundtrip(spark, sf_dir, derby_cfg):
    """orders → JDBC sink (batched INSERTs, table auto-created) → JDBC
    source → identical rows. Timestamp column exercises type mapping."""
    src = load_table(spark, sf_dir, "orders")
    write_jdbc(src, derby_cfg, "ORDERS_RT", mode="overwrite")
    back = read_jdbc(spark, derby_cfg, table="ORDERS_RT")
    assert sorted(c.lower() for c in back.columns) == sorted(
        c.lower() for c in src.columns
    )
    assert _rows(back.select(*src.columns)) == _rows(src)


def test_partitioned_read_parallelism(spark, sf_dir, derby_cfg):
    """Partitioned JDBC read: same rows, numPartitions input splits —
    the intra-table parallelism the reference lacked."""
    src = load_table(spark, sf_dir, "orders")
    write_jdbc(src, derby_cfg, "ORDERS_PART", mode="overwrite")
    bounds = src.agg(
        F.min("o_orderkey").alias("lo"), F.max("o_orderkey").alias("hi")
    ).collect()[0]
    part = read_jdbc(
        spark,
        derby_cfg,
        table="ORDERS_PART",
        partition_column="o_orderkey",
        lower_bound=int(bounds["lo"]),
        upper_bound=int(bounds["hi"]) + 1,
        num_partitions=4,
    )
    assert part.rdd.getNumPartitions() == 4
    assert part.count() == src.count()
    assert _rows(part.select(*src.columns)) == _rows(src)


def test_append_mode_accumulates(spark, sf_dir, derby_cfg):
    nation = load_table(spark, sf_dir, "nation")
    write_jdbc(nation, derby_cfg, "NATION_APPEND", mode="overwrite")
    write_jdbc(nation, derby_cfg, "NATION_APPEND", mode="append")
    back = read_jdbc(spark, derby_cfg, table="NATION_APPEND")
    assert back.count() == 2 * nation.count()
