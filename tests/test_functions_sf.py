"""Snowflake-compat scalar function wrappers (functions/__init__.py):
value-level unit checks on small in-memory frames."""

from __future__ import annotations

import pyspark.sql.functions as F

from snowflake_to_postgres_spark import functions as sf


def test_null_handling_family(spark):
    df = spark.createDataFrame(
        [(1, None), (0, 5), (None, 0)], "a INT, b INT"
    )
    out = df.select(
        sf.zeroifnull("a").alias("z"),
        sf.nullifzero("a").alias("nz"),
        sf.div0(F.lit(10), "a").alias("d"),
        sf.equal_null("a", "b").alias("eq"),
    ).collect()
    assert [r["z"] for r in out] == [1, 0, 0]
    assert [r["nz"] for r in out] == [1, None, None]
    # DIV0 guards a ZERO divisor; a NULL divisor stays NULL (Snowflake)
    assert [r["d"] for r in out] == [10.0, 0.0, None]
    assert [r["eq"] for r in out] == [False, False, False]
    both_null = spark.createDataFrame([(None, None)], "a INT, b INT")
    assert both_null.select(sf.equal_null("a", "b").alias("e")).collect()[0]["e"]


def test_try_to_number(spark):
    df = spark.createDataFrame([("12.5",), ("abc",), (None,)], "s STRING")
    vals = [r["n"] for r in df.select(sf.try_to_number("s", 10, 2).alias("n")).collect()]
    assert str(vals[0]) == "12.50" and vals[1] is None and vals[2] is None


def test_listagg_deterministic(spark):
    df = spark.createDataFrame([("g", "b"), ("g", "a"), ("g", "c")], "k STRING, v STRING")
    row = df.groupBy("k").agg(sf.listagg("v").alias("l")).collect()[0]
    assert row["l"] == "a,b,c"


def test_object_construct_parse_json_roundtrip(spark):
    df = spark.createDataFrame([(1, "x")], "id INT, name STRING")
    j = df.select(sf.object_construct(i="id", n="name").alias("js"))
    assert j.collect()[0]["js"] == '{"i":1,"n":"x"}'
    back = j.select(sf.parse_json("js", "i INT, n STRING").alias("o"))
    r = back.collect()[0]["o"]
    assert r["i"] == 1 and r["n"] == "x"


def test_string_extraction_family(spark):
    df = spark.createDataFrame([("a-b-c",)], "s STRING")
    out = df.select(
        sf.split_part("s", "-", 2).alias("p2"),
        sf.split_part("s", "-", 9).alias("p9"),
        sf.regexp_substr("s", "([a-z])-([a-z])", 2).alias("re"),
    ).collect()[0]
    assert out["p2"] == "b"
    assert out["p9"] is None
    assert out["re"] == "b"


def test_date_part_and_time_slice(spark):
    df = spark.createDataFrame([("2024-03-15 10:47:12",)], "s STRING").select(
        F.to_timestamp("s").alias("ts")
    )
    out = df.select(
        sf.date_part("year", "ts").alias("y"),
        sf.date_part("hour", "ts").alias("h"),
        sf.time_slice("ts", 15, "minute").cast("string").alias("slice"),
    ).collect()[0]
    assert out["y"] == 2024 and out["h"] == 10
    assert out["slice"] == "2024-03-15 10:45:00"
