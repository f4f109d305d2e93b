"""S4-S6/S8/S9/S15 coverage: constraint round-trip via TBLPROPERTIES,
DESCRIBE-based fetch, schema probe, log tee."""

from __future__ import annotations

import sys

import pytest
from pyspark.sql import types as T

from snowflake_to_postgres_spark.plans.catalog import (
    ColumnInfo,
    ConstraintInfo,
    ConstraintType,
    TableInfo,
    assert_schema_exists,
    constraints_from_properties,
    describe_table,
)
from snowflake_to_postgres_spark.plans.ddl import generate_table_ddl


def test_constraint_roundtrip_through_spark_catalog(spark, tmp_path):
    spark.sql("CREATE DATABASE IF NOT EXISTS ct_rt")
    t = TableInfo(
        "child", "ct_rt",
        [ColumnInfo("c_id", T.LongType(), False), ColumnInfo("p_id", T.LongType())],
        primary_key=ConstraintInfo("pk", ConstraintType.PRIMARY_KEY, ["c_id"]),
        unique_constraints=[ConstraintInfo("uq", ConstraintType.UNIQUE, ["p_id", "c_id"])],
        comment="fixture child table",
    )
    (ddl,) = generate_table_ddl(t, "spark")
    spark.sql("DROP TABLE IF EXISTS ct_rt.child")
    spark.sql(ddl)
    try:
        desc = describe_table(spark, "ct_rt.child")
        assert ("c_id", "bigint") in desc["columns"]
        cons = constraints_from_properties(desc["properties"])
        assert cons["primary_key"] == ["c_id"]
        assert ["p_id", "c_id"] in cons["unique"]
        assert desc["ddl"] and "CREATE TABLE" in desc["ddl"]
    finally:
        spark.sql("DROP TABLE IF EXISTS ct_rt.child")
        spark.sql("DROP DATABASE IF EXISTS ct_rt")


def test_schema_probe(spark):
    assert_schema_exists(spark, "default")
    with pytest.raises(ValueError, match="available"):
        assert_schema_exists(spark, "no_such_schema_xyz")


def test_tee_writer(tmp_path, capsys):
    from snowflake_to_postgres_spark.util.tee import TeeWriter

    log = str(tmp_path / "run.log")
    w = TeeWriter(sys.stdout, log)
    w.write("hello \x1b[31mred\x1b[0m world\n")
    w.flush()
    w.close()
    assert open(log).read() == "hello red world\n"  # ANSI stripped in file


def test_null_byte_scrub_runtime(spark):
    from snowflake_to_postgres_spark.functions import null_byte_scrub
    import pyspark.sql.functions as F

    df = spark.createDataFrame([("a\x00b",), ("clean",)], "s string")
    out = [r[0] for r in df.select(null_byte_scrub(F.col("s")).alias("s")).collect()]
    assert out == ["ab", "clean"]
