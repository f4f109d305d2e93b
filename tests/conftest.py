"""Shared pytest fixtures: one SparkSession + one DuckDB connection with the
fixture tables registered, mirroring the driver's oracle setup."""

from __future__ import annotations

import os

import duckdb
import pytest

from snowflake_to_postgres_spark.session import get_spark
from snowflake_to_postgres_spark.sources import TABLES, table_path

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    yield con
    con.close()
