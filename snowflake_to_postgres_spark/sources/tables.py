"""Parquet table sources for the synthetic TPC-H-ish fixture set.

Replaces the reference's full-table extract scan
(data_transfer.py:98-208: ``SELECT "c"::VARCHAR ... FROM schema.table``
with hand-batched ``fetchmany``): here a scan is ``spark.read.parquet``
— batching, column pruning, and predicate pushdown are Catalyst's job,
and types stay native instead of collapsing to VARCHAR
(data_transfer.py:125-128).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


_CONFS_APPLIED_MARKER = "spark.snowflake_to_postgres_spark.sessionConfsApplied"


def ensure_session_confs(spark: SparkSession) -> None:
    """Make any SparkSession able to read the fixture set deterministically.

    The driver's harness builds its own vanilla session (it never calls
    ``session.get_spark``), so nothing in the query surface may depend on
    builder-time configs. Both confs here are runtime-settable:

    * ``nanosAsLong`` — events.ts is parquet TIMESTAMP(NANOS), which the
      Spark reader otherwise rejects with PARQUET_TYPE_ILLEGAL (round-1
      driver signal: v1_variant_json_extract / x_sessionization errored).
    * UTC session timezone — keeps TimestampType collection instant-based,
      matching the DuckDB oracle's naive timestamps (reference normalizes
      to UTC before comparing, validator.py:888-896).

    Applied ONCE per session (marker conf): after the first load a caller
    who explicitly sets a non-UTC timezone or 200 shuffle partitions is
    respected — with the caveat that timestamp-typed query results are
    only oracle-comparable under UTC. A timezone override is logged."""
    if spark.conf.get(_CONFS_APPLIED_MARKER, "") == "true":
        return
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # no fallback arg: Spark 4 validates the fallback against the conf's
    # type, and timeZone always has a built-in default anyway
    tz = spark.conf.get("spark.sql.session.timeZone")
    if tz != "UTC":
        import logging

        logging.getLogger(__name__).info(
            "overriding spark.sql.session.timeZone=%r with UTC "
            "(required for deterministic timestamp semantics)", tz,
        )
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    # Local-mode nicety only: don't leave the 200-partition default in
    # place for small-SF correctness runs. Respect any explicit setting
    # (an explicit 200 is indistinguishable from the default, accepted).
    if spark.conf.get("spark.sql.shuffle.partitions", "200") == "200":
        spark.conf.set("spark.sql.shuffle.partitions", "32")
    spark.conf.set(_CONFS_APPLIED_MARKER, "true")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_session_confs(spark)
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        df = _normalize_nanos_ts(df)
    return df


def _normalize_nanos_ts(df: DataFrame) -> DataFrame:
    """events.ts is parquet TIMESTAMP(NANOS); with
    ``spark.sql.legacy.parquet.nanosAsLong`` Spark reads it as a raw
    nanos-since-epoch long. Convert to a microsecond TimestampType
    (floor division matches DuckDB's ns→µs truncation)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    if "ts" in df.columns and isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn(
            "ts", F.timestamp_micros(F.floor(F.col("ts") / F.lit(1000)).cast("long"))
        )
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Register each table as a temp view (bare name) so `spark.sql`
    queries mirror the DuckDB oracle's pre-registered views."""
    dfs = load_tables(spark, sf_dir, names)
    for n, df in dfs.items():
        df.createOrReplaceTempView(n)
    return dfs
