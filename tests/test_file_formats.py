"""Format-agnostic sources: parquet/ORC/CSV/JSON round-trips must be
type- and value-faithful when the schema IR travels with the data."""

from __future__ import annotations

import pytest

from snowflake_to_postgres_spark.sources import load_table
from snowflake_to_postgres_spark.sources.files import infer_format, read_any, write_any


def _rows(df):
    return sorted(tuple(str(x) for x in r) for r in df.collect())


@pytest.mark.parametrize("fmt", ["parquet", "orc", "csv", "json"])
def test_roundtrip_type_faithful(spark, sf_dir, tmp_path, fmt):
    src = load_table(spark, sf_dir, "orders")
    target = str(tmp_path / f"orders_{fmt}")
    write_any(src, target, fmt)
    back = read_any(spark, target, fmt, schema=src.schema)
    assert back.schema == src.schema
    assert _rows(back) == _rows(src)


def test_csv_null_token_matches_copy_kernel(spark, tmp_path):
    """CSV writes NULL as \\N (the reference's COPY token) and reads it
    back as a real NULL."""
    df = spark.createDataFrame([(1, None), (2, "x")], "id INT, s STRING")
    target = str(tmp_path / "nulls_csv")
    write_any(df, target, "csv")
    back = read_any(spark, target, "csv", schema=df.schema)
    vals = {r["id"]: r["s"] for r in back.collect()}
    assert vals == {1: None, 2: "x"}


def test_format_inference():
    assert infer_format("/x/t.parquet") == "parquet"
    assert infer_format("/x/t.jsonl") == "json"
    assert infer_format("/x/t.tsv") == "csv"
    assert infer_format("/x/t") == "parquet"
    assert infer_format("/x/t.csv", fmt="json") == "json"


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    """partition_by layout must produce partition-pruned scans on
    re-read (PartitionFilters in the plan)."""
    import pyspark.sql.functions as F

    src = load_table(spark, sf_dir, "orders").withColumn(
        "status", F.col("o_orderstatus")
    )
    target = str(tmp_path / "orders_part")
    write_any(src, target, "parquet", partition_by=["status"])
    back = read_any(spark, target, "parquet").filter(F.col("status") == "F")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "status" in plan.split("PartitionFilters")[1][:200]


def test_read_with_quarantine_splits_bad_lines(spark, tmp_path):
    """PERMISSIVE ingest: good rows parse to the caller's schema, every
    malformed line lands in the quarantine verbatim, nothing vanishes."""
    from pyspark.sql import types as T

    from snowflake_to_postgres_spark.sources.files import read_with_quarantine

    p = tmp_path / "feed.jsonl"
    p.write_text(
        '{"id": 1, "name": "ok-one"}\n'
        '{"id": 2, "name": "ok-two"}\n'
        '{"id": "BROKEN" "name" no-json}\n'
        '{"id": 3, "name": "ok-three"}\n'
    )
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
    ])
    good, quarantine = read_with_quarantine(spark, str(p), schema, fmt="json")
    assert sorted(r["id"] for r in good.collect()) == [1, 2, 3]
    bad = quarantine.collect()
    assert len(bad) == 1 and "BROKEN" in bad[0]["raw_line"]
    # counts add up: no silent drops
    assert good.count() + quarantine.count() == 4


def test_read_evolving_widens_and_nullfills(spark, tmp_path):
    """Three write generations: base (id int, v double), widened
    (id bigint — overflow fix), extended (+ tag string). mergeSchema
    rejects the int→bigint conflict; read_evolving reconciles to the
    widest schema, null-fills the late column, and loses no rows."""
    import pytest as _pytest

    from snowflake_to_postgres_spark.sources.files import read_evolving

    g1 = str(tmp_path / "g1")
    g2 = str(tmp_path / "g2")
    g3 = str(tmp_path / "g3")
    spark.createDataFrame([(1, 1.5), (2, 2.5)], "id int, v double").write.parquet(g1)
    spark.createDataFrame(
        [(3_000_000_000, 3.5)], "id bigint, v double"
    ).write.parquet(g2)
    spark.createDataFrame(
        [(4, 4.5, "x")], "id bigint, v double, tag string"
    ).write.parquet(g3)

    # the stock path really does fail on the widened column
    with _pytest.raises(Exception):
        spark.read.option("mergeSchema", "true").parquet(g1, g2, g3).collect()

    out = read_evolving(spark, [g1, g2, g3])
    assert [f.simpleString() for f in out.schema.fields] == [
        "id:bigint", "v:double", "tag:string"
    ]
    rows = sorted((r["id"], r["v"], r["tag"]) for r in out.collect())
    assert rows == [
        (1, 1.5, None), (2, 2.5, None), (4, 4.5, "x"), (3_000_000_000, 3.5, None)
    ]


def test_read_evolving_decimal_widening(spark, tmp_path):
    """DECIMAL(10,2) + DECIMAL(12,4) reconcile to DECIMAL(12,4): max
    integral digits (8, same on both sides) + max scale (4) — widening
    can never truncate either side."""
    from snowflake_to_postgres_spark.sources.files import read_evolving

    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    spark.sql("SELECT CAST(12345678.99 AS DECIMAL(10,2)) AS amt").write.parquet(a)
    spark.sql("SELECT CAST(123.4567 AS DECIMAL(12,4)) AS amt").write.parquet(b)
    out = read_evolving(spark, [a, b])
    assert out.schema["amt"].dataType.simpleString() == "decimal(12,4)"
    vals = sorted(str(r["amt"]) for r in out.collect())
    assert vals == ["123.4567", "12345678.9900"]


def test_read_evolving_int_meets_float_widens_to_double(spark, tmp_path):
    """bigint meeting float must reconcile to DOUBLE: float32 truncates
    integers above 2^24 — the id-overflow case this exists for."""
    from snowflake_to_postgres_spark.sources.files import read_evolving

    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    spark.createDataFrame([(16_777_217,)], "user_id bigint").write.parquet(a)
    spark.sql("SELECT CAST(1.5 AS FLOAT) AS user_id").write.parquet(b)
    out = read_evolving(spark, [a, b])
    assert out.schema["user_id"].dataType.simpleString() == "double"
    vals = sorted(r["user_id"] for r in out.collect())
    assert vals == [1.5, 16_777_217.0]  # bigint survives exactly


def test_read_evolving_tinyint_smallint_widen(spark, tmp_path):
    """ByteType/ShortType simpleString() is 'tinyint'/'smallint' — the
    round-6 ADVICE found the lattice spelled them 'byte'/'short', so any
    generation with a byte or short column raised 'cannot reconcile'."""
    from snowflake_to_postgres_spark.sources.files import read_evolving

    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    spark.sql("SELECT CAST(7 AS TINYINT) AS lvl").write.parquet(a)
    spark.sql("SELECT CAST(300 AS SMALLINT) AS lvl").write.parquet(b)
    out = read_evolving(spark, [a, b])
    assert out.schema["lvl"].dataType.simpleString() == "smallint"
    assert sorted(r["lvl"] for r in out.collect()) == [7, 300]

    c = str(tmp_path / "c")
    spark.createDataFrame([(70_000,)], "lvl int").write.parquet(c)
    out3 = read_evolving(spark, [a, b, c])
    assert out3.schema["lvl"].dataType.simpleString() == "int"
    assert sorted(r["lvl"] for r in out3.collect()) == [7, 300, 70_000]


def test_widest_decimal_preserves_integral_capacity():
    """DECIMAL(38,0) ∧ DECIMAL(10,9): the old min(38, intd+scale) clamp
    kept scale 9 and silently shrank integral capacity to 29 digits —
    in-range values would cast to NULL. Now scale shrinks to fit
    (38 integral digits demand scale 0)."""
    import pytest as _pytest
    from pyspark.sql import types as T

    from snowflake_to_postgres_spark.sources.files import _widest

    got = _widest(T.DecimalType(38, 0), T.DecimalType(10, 9))
    assert (got.precision, got.scale) == (38, 0)
    # partial shrink: 30 integral + 9 scale → keep all 30, scale drops to 8
    got2 = _widest(T.DecimalType(30, 0), T.DecimalType(10, 9))
    assert (got2.precision, got2.scale) == (38, 8)
    # no shrink needed stays exact
    got3 = _widest(T.DecimalType(10, 2), T.DecimalType(12, 4))
    assert (got3.precision, got3.scale) == (12, 4)
