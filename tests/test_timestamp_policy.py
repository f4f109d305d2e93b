"""Engine-wide timestamp policy (SURVEY §1.3, VERDICT r3 #5).

One rule: external event time — parquet TIMESTAMP(NANOS) read as raw
longs on older Spark, or TIMESTAMP_NTZ on Spark ≥4 — normalizes to
instant ``TimestampType`` inside ``load_table`` / ``read_events_stream``
(session timezone pinned UTC, so the conversion is value-preserving).
These tests make the policy un-driftable: a Spark version bump that
changes parquet timestamp inference fails here, not in a watermark deep
inside the streaming path (the round-3 regression class:
EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE).
"""

from __future__ import annotations

import os

import pytest

from pyspark.sql import types as T

from snowflake_to_postgres_spark.sources import TABLES, load_table


@pytest.mark.parametrize("table", TABLES)
def test_no_ntz_survives_load_table(spark, sf_dir, table):
    df = load_table(spark, sf_dir, table)
    for field in df.schema.fields:
        assert not isinstance(field.dataType, T.TimestampNTZType), (
            f"{table}.{field.name} is TIMESTAMP_NTZ after load_table — "
            "normalize_external_types must convert it to TIMESTAMP"
        )


@pytest.mark.parametrize(
    "other_sf", ["/root/testdata/sf0.01"],
)
def test_no_ntz_at_other_scale_factors(spark, other_sf):
    if not os.path.isdir(other_sf):
        pytest.skip(f"{other_sf} not present")
    for table in TABLES:
        df = load_table(spark, other_sf, table)
        assert not any(
            isinstance(f.dataType, T.TimestampNTZType) for f in df.schema.fields
        ), table


def test_events_ts_is_instant_timestamp(spark, sf_dir):
    """events.ts specifically must be the watermark-compatible type."""
    df = load_table(spark, sf_dir, "events")
    assert isinstance(df.schema["ts"].dataType, T.TimestampType)


def test_stream_schema_equals_batch_schema(spark, sf_dir):
    """The cheap guard VERDICT r3 #2 asked for: the events file stream
    and its batch twin must agree exactly on schema (the in-function
    assert fires too, but this pins it as a named test)."""
    from snowflake_to_postgres_spark.streaming.pipeline import read_events_stream

    stream = read_events_stream(spark, sf_dir)
    batch = load_table(spark, sf_dir, "events")
    assert stream.schema == batch.schema


def test_bigint_ts_outside_events_not_rescaled(spark, tmp_path):
    """The nanos→micros reinterpretation is scoped to NANOS_TS_TABLES: a
    non-events table with an epoch-seconds/millis bigint column named
    'ts' must come through load_table byte-identical, never divided by
    1000."""
    from pyspark.sql import Row

    from snowflake_to_postgres_spark.sources import table_path

    epoch_s = 1_700_000_000  # plausibly epoch-seconds
    df = spark.createDataFrame([Row(id=1, ts=epoch_s)], "id long, ts long")
    df.write.parquet(table_path(str(tmp_path), "ledger"))
    got = load_table(spark, str(tmp_path), "ledger")
    assert isinstance(got.schema["ts"].dataType, T.LongType)
    assert got.collect()[0]["ts"] == epoch_s


def test_session_timezone_is_utc(spark):
    """The NTZ→TIMESTAMP cast is only value-preserving under UTC; the
    session conf layer must have pinned it."""
    load_table(spark, os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"), "region")
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
