"""COPY sink serialization kernel (pure Python — no live Postgres)."""

from snowflake_to_postgres_spark.sources.pg_copy import copy_sql, rows_to_copy_csv


def test_null_marker_and_nul_strip():
    out = rows_to_copy_csv([(1, None, "a\x00b"), (2, "x", "")])
    lines = out.splitlines()
    assert lines[0] == "1,\\N,ab"
    # empty string survives as quoted-nothing, NOT the NULL marker
    # (data_transfer.py:277-292 distinction)
    assert lines[1] == "2,x,"


def test_csv_quoting():
    out = rows_to_copy_csv([("a,b", 'say "hi"', "line\nbreak")])
    assert out.startswith('"a,b","say ""hi""","line\nbreak"')


def test_copy_sql_shape():
    sql = copy_sql("public", "orders", ["o_orderkey", "o_status"])
    assert sql == (
        'COPY "public"."orders" ("o_orderkey", "o_status") '
        "FROM STDIN WITH (FORMAT csv, NULL '\\N')"
    )
