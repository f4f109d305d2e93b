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
