"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over :mod:`snowflake_to_postgres_spark.registry`, which holds
every implemented operator from SURVEY.md §2 (+ extension operators) as a
(PySpark callable, DuckDB oracle SQL) pair.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from snowflake_to_postgres_spark import registry

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the TPC-H-Q1-flavored
    pricing summary — the reference validator's count+multi-SUM fingerprint
    kernel (validator.py:193-215, :594-621) as one declarative plan."""
    from snowflake_to_postgres_spark.operators.relational import q1_pricing_summary

    return q1_pricing_summary(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
