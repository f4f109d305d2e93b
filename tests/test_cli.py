"""CLI verbs end-to-end through main() (the user-facing surface)."""

from __future__ import annotations

import json

from snowflake_to_postgres_spark.cli import main


def test_cli_migrate_roundtrip(tmp_path, capsys, sf_dir):
    rc = main([
        "migrate", "--source", sf_dir, "--target", str(tmp_path / "out"),
        "--table", "orders", "--workers", "1", "--pk", "o_orderkey",
        "--checkpoint", str(tmp_path / "ckpt.json"),
    ])
    out = capsys.readouterr().out.strip().splitlines()
    assert rc == 0
    roll = json.loads(out[0])
    assert roll["transferred"] == 1 and roll["errors"] == []
    report = json.loads("\n".join(out[1:]))
    assert report[0]["table"] == "orders" and report[0]["passed"]


def test_cli_destroy_confirm_gate(capsys):
    rc = main(["destroy", "--schema", "x", "--confirm", "WRONG"])
    assert rc == 2


def test_cli_build_dry_run(tmp_path, capsys, sf_dir):
    ddl_out = str(tmp_path / "schema.sql")
    rc = main([
        "build", "--source", sf_dir, "--schema", "tpch",
        "--dry-run", "--ddl-out", ddl_out,
    ])
    assert rc == 0
    text = open(ddl_out).read()
    assert "CREATE SCHEMA" in text and 'CREATE TABLE IF NOT EXISTS "tpch"."lineitem"' in text


def test_cli_validate_fails_on_corruption(tmp_path, capsys, spark, sf_dir):
    """validate must exit 1 when the target is corrupted (dropped rows)."""
    import pyspark.sql.functions as F

    from snowflake_to_postgres_spark.sources import load_table

    tgt = str(tmp_path / "out" / "orders")
    load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 7 != 0).write.parquet(tgt)
    rc = main([
        "validate", "--source", sf_dir, "--target", str(tmp_path / "out"),
        "--table", "orders", "--pk", "o_orderkey",
    ])
    assert rc == 1
    report = json.loads(capsys.readouterr().out)
    assert not report[0]["passed"]
