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

    * ``nanosAsLong`` — events.ts is parquet TIMESTAMP(NANOS), which
      older Spark readers reject with PARQUET_TYPE_ILLEGAL (round-1
      driver signal: v1_variant_json_extract / x_sessionization errored).
      Spark 4.1.2 ignores this conf and reads nanos natively as
      TIMESTAMP_NTZ; either way ``normalize_external_types`` converts the
      result to instant TimestampType at load.
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


#: Per-(session, path, mtime) memo of ANALYZED DataFrames (round-14
#: optimization, guide §6 "file listing" / §7.3 driver-side planning):
#: every ``spark.read.parquet`` call re-lists the path and re-reads a
#: parquet footer for schema inference — pure driver-side latency that
#: every query pays per referenced table, measured ~40-80 ms per call
#: at sf0.1. The DataFrame is an immutable lazy plan, so reusing it is
#: side-effect-free; execution still scans parquet every time (nothing
#: about query RESULTS is cached). Keyed by applicationId (a stopped
#: session's plans are unusable), absolute path, and the path's
#: st_mtime_ns so an in-place rewrite (corruption-layer tests, tmp-dir
#: fixtures) invalidates naturally.
_LOAD_MEMO: dict[tuple[str, str, int], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_session_confs(spark)
    path = table_path(sf_dir, name)
    try:
        mtime = os.stat(path).st_mtime_ns
    except OSError:
        mtime = -1
    key = (spark.sparkContext.applicationId, os.path.abspath(path), mtime)
    df = _LOAD_MEMO.get(key)
    if df is None:
        if len(_LOAD_MEMO) > 512:
            # bound growth across many short-lived test sessions; the
            # memo is a latency cache, safe to drop wholesale
            _LOAD_MEMO.clear()
        df = normalize_external_types(spark.read.parquet(path), table=name)
        _LOAD_MEMO[key] = df
    return df


#: Tables whose ``ts`` column is parquet TIMESTAMP(NANOS) — the ONLY
#: tables where a raw bigint ``ts`` may be reinterpreted as nanoseconds.
#: The rescale is scoped by table, not by column name: a future table
#: carrying an epoch-seconds/millis bigint named ``ts`` must not be
#: silently divided by 1000.
NANOS_TS_TABLES = frozenset({"events"})


def normalize_external_types(df: DataFrame, table: str | None = None) -> DataFrame:
    """Engine-wide timestamp policy (SURVEY §1.3): external event time
    normalizes to instant ``TimestampType`` at load, whatever shape the
    source delivered it in. Two shapes occur in the wild:

    * parquet TIMESTAMP(NANOS) read as a raw nanos-since-epoch long
      (older Spark with ``nanosAsLong``) → ``timestamp_micros`` with
      floor division, matching DuckDB's ns→µs truncation. Applied only
      when ``table`` is in :data:`NANOS_TS_TABLES` — the branch
      reinterprets a bigint, so it must be opted in per table rather
      than pattern-matched on a column name;
    * ``TimestampNTZType`` (Spark ≥4 reads parquet nanos natively as
      NTZ, micros-truncated; Snowflake TIMESTAMP_NTZ lands here too) →
      cast to TIMESTAMP. The session timezone is pinned UTC
      (``ensure_session_confs``), so the cast is value-preserving.

    Why: ``withWatermark`` rejects NTZ event time
    (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE), and the batch/stream twins
    must agree on schema. A property test asserts no ``TimestampNTZType``
    survives ``load_table`` on any fixture table, so this policy can't
    silently drift on a Spark version bump.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    for field in df.schema.fields:
        if (
            table in NANOS_TS_TABLES
            and field.name == "ts"
            and isinstance(field.dataType, T.LongType)
        ):
            df = df.withColumn(
                "ts", F.timestamp_micros(F.floor(F.col("ts") / F.lit(1000)).cast("long"))
            )
        elif isinstance(field.dataType, T.TimestampNTZType):
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
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
