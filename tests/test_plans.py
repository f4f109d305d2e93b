"""Pure-kernel unit tests: type mapping (SURVEY §1.3), catalog model,
DDL generation + FK topo-sort (O6/O7), dialect rewrites (FIXTURES B5)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from snowflake_to_postgres_spark.plans.catalog import (
    ColumnInfo,
    ConstraintInfo,
    ConstraintType,
    SchemaInfo,
    TableInfo,
    columns_from_struct,
    discover_parquet_schema,
    normalize_identifier,
)
from snowflake_to_postgres_spark.plans.ddl import (
    destroy_ddl,
    execute_ddl,
    generate_fk_ddl,
    generate_schema_ddl,
    generate_table_ddl,
    topo_sort_tables,
)
from snowflake_to_postgres_spark.plans.dialect import (
    ViewTranslationError,
    detect_cross_schema_refs,
    parse_view_ddl,
    qualify_bare_tables,
    rewrite_datetime_formats,
    rewrite_double_colon_casts,
    rewrite_functions,
    rewrite_split_to_table,
    strip_db_prefix,
    translate_procedure_stub,
    translate_view,
)
from snowflake_to_postgres_spark.plans.typemap import (
    parse_snowflake_type,
    snowflake_to_spark,
    spark_to_postgres,
)


# --- typemap (§1.3) -------------------------------------------------------

@pytest.mark.parametrize(
    "sf,expected",
    [
        ("NUMBER(12,2)", T.DecimalType(12, 2)),
        ("NUMBER", T.DecimalType(38, 0)),
        ("DECIMAL(5)", T.DecimalType(5, 0)),
        ("INT", T.IntegerType()),
        ("BIGINT", T.LongType()),
        ("SMALLINT", T.ShortType()),
        ("BYTEINT", T.ByteType()),
        ("FLOAT", T.DoubleType()),
        ("DOUBLE PRECISION", T.DoubleType()),
        ("REAL", T.FloatType()),
        ("VARCHAR(50)", T.StringType()),
        ("TEXT", T.StringType()),
        ("BINARY", T.BinaryType()),
        ("DATE", T.DateType()),
        ("TIMESTAMP_NTZ", T.TimestampNTZType()),
        ("TIMESTAMP_LTZ", T.TimestampType()),
        ("TIMESTAMP_TZ", T.TimestampType()),
        ("TIME", T.StringType()),
        ("BOOLEAN", T.BooleanType()),
        ("VARIANT", T.StringType()),
        ("GEOGRAPHY", T.StringType()),  # unknown → fallback
    ],
)
def test_snowflake_to_spark(sf, expected):
    assert snowflake_to_spark(sf) == expected


def test_parse_type_length():
    t = parse_snowflake_type("VARCHAR(50)")
    assert t.base == "VARCHAR" and t.length == 50


@pytest.mark.parametrize(
    "dt,kw,expected",
    [
        (T.DecimalType(12, 2), {}, "NUMERIC(12,2)"),
        (T.StringType(), {"length": 50}, "VARCHAR(50)"),
        (T.StringType(), {}, "TEXT"),
        (T.TimestampType(), {}, "TIMESTAMP WITH TIME ZONE"),
        (T.TimestampNTZType(), {}, "TIMESTAMP"),
        (T.BinaryType(), {}, "BYTEA"),
        (T.DoubleType(), {}, "DOUBLE PRECISION"),
        (T.ArrayType(T.IntegerType()), {}, "JSONB"),
    ],
)
def test_spark_to_postgres(dt, kw, expected):
    assert spark_to_postgres(dt, **kw) == expected


# --- catalog ----------------------------------------------------------------

def test_identifier_folding():
    assert normalize_identifier('"MY_TABLE"') == "my_table"
    assert normalize_identifier("  Orders ") == "orders"


def test_discovery_over_parquet(spark, sf_dir):
    info = discover_parquet_schema(spark, sf_dir, "tpch", with_row_counts=False)
    names = [t.name for t in info.tables]
    assert "lineitem" in names and "orders" in names
    li = next(t for t in info.tables if t.name == "lineitem")
    assert [c.name for c in li.columns][:2] == ["l_orderkey", "l_partkey"]
    assert li.columns[0].ordinal_position == 1
    roundtrip = li.to_struct()
    assert [f.name for f in roundtrip] == [c.name for c in li.columns]


def test_discovery_table_filter(spark, sf_dir):
    info = discover_parquet_schema(spark, sf_dir, "t", table_filter="ORDERS",
                                   with_row_counts=False)
    assert [t.name for t in info.tables] == ["orders"]


def test_discovery_row_count(spark, sf_dir):
    info = discover_parquet_schema(spark, sf_dir, "t", table_filter="region")
    assert info.tables[0].row_count == 5


# --- DDL (O6/O7/O8) ----------------------------------------------------------

def _fk_graph() -> list[TableInfo]:
    """FIXTURES B2: grandparent ← parent ← child."""
    gp = TableInfo("grandparent", "s", [ColumnInfo("gp_id", T.LongType(), False)],
                   primary_key=ConstraintInfo("pk_gp", ConstraintType.PRIMARY_KEY, ["gp_id"]))
    parent = TableInfo(
        "parent", "s",
        [ColumnInfo("p_id", T.LongType(), False), ColumnInfo("gp_id", T.LongType())],
        primary_key=ConstraintInfo("pk_p", ConstraintType.PRIMARY_KEY, ["p_id"]),
        foreign_keys=[ConstraintInfo("fk_p_gp", ConstraintType.FOREIGN_KEY, ["gp_id"],
                                     "grandparent", ["gp_id"])],
    )
    child = TableInfo(
        "child", "s",
        [ColumnInfo("c_id", T.LongType(), False), ColumnInfo("p_id", T.LongType()),
         ColumnInfo("gp_id", T.LongType())],
        primary_key=ConstraintInfo("pk_c", ConstraintType.PRIMARY_KEY, ["c_id"]),
        foreign_keys=[
            ConstraintInfo("fk_c_p", ConstraintType.FOREIGN_KEY, ["p_id"], "parent", ["p_id"]),
            ConstraintInfo("fk_c_gp", ConstraintType.FOREIGN_KEY, ["gp_id"], "grandparent", ["gp_id"]),
        ],
        unique_constraints=[ConstraintInfo("uq_c", ConstraintType.UNIQUE, ["p_id", "c_id"])],
    )
    return [child, parent, gp]  # deliberately wrong order


def test_topo_sort_parents_first():
    ordered = [t.name for t in topo_sort_tables(_fk_graph())]
    assert ordered.index("grandparent") < ordered.index("parent") < ordered.index("child")


def test_topo_sort_cycle_safe():
    a = TableInfo("a", "s", [ColumnInfo("id", T.LongType())],
                  foreign_keys=[ConstraintInfo("f", ConstraintType.FOREIGN_KEY, ["id"], "b", ["id"])])
    b = TableInfo("b", "s", [ColumnInfo("id", T.LongType())],
                  foreign_keys=[ConstraintInfo("f", ConstraintType.FOREIGN_KEY, ["id"], "a", ["id"])])
    assert {t.name for t in topo_sort_tables([a, b])} == {"a", "b"}


def test_pg_table_ddl():
    child = _fk_graph()[0]
    stmts = generate_table_ddl(child, "postgres")
    assert 'CREATE TABLE IF NOT EXISTS "s"."child"' in stmts[0]
    assert '"c_id" BIGINT NOT NULL' in stmts[0]
    assert 'PRIMARY KEY ("c_id")' in stmts[0]
    assert 'UNIQUE ("p_id", "c_id")' in stmts[0]
    fks = generate_fk_ddl(child)
    assert len(fks) == 2 and "ADD CONSTRAINT" in fks[0]


def test_schema_ddl_order_and_deferred_fks():
    info = SchemaInfo("s", tables=_fk_graph())
    stmts = generate_schema_ddl(info, "postgres")
    assert stmts[0].startswith("CREATE SCHEMA")
    create_idx = {s.split(".")[-1].split(" ")[0].strip('"('): i
                  for i, s in enumerate(stmts) if s.startswith("CREATE TABLE")}
    alter_idx = [i for i, s in enumerate(stmts) if s.startswith("ALTER TABLE")]
    assert alter_idx and min(alter_idx) > max(create_idx.values())


def test_spark_ddl_tblproperties():
    child = _fk_graph()[0]
    (ddl,) = generate_table_ddl(child, "spark")
    assert "USING parquet" in ddl and "'primary_key'='c_id'" in ddl


def test_destroy_and_executor_dry_run(spark):
    assert destroy_ddl("s") == 'DROP SCHEMA IF EXISTS "s" CASCADE'
    res = execute_ddl(spark, ["SELECT 1", "SELECT 2"], dry_run=True)
    assert res["dry_run"] and len(res["executed"]) == 2


def test_executor_stop_on_error(spark):
    res = execute_ddl(spark, ["SELECT 1", "SELECT bogus_col", "SELECT 2"])
    assert len(res["executed"]) == 1 and len(res["errors"]) == 1


# --- dialect (F1-F19, FIXTURES B5) -------------------------------------------

def test_view_parse_forms():
    for ddl in [
        "CREATE VIEW v AS SELECT 1",
        "CREATE OR REPLACE VIEW v AS SELECT 1",
        "CREATE OR REPLACE SECURE VIEW v AS SELECT 1",
        "CREATE SECURE RECURSIVE VIEW v (a, b) AS SELECT 1, 2",
        'CREATE VIEW "DB"."S"."V" AS SELECT 1',
    ]:
        name, cols, body = parse_view_ddl(ddl)
        assert body.startswith("SELECT")
    with pytest.raises(ViewTranslationError):
        parse_view_ddl("CREATE TABLE t (a INT)")


def test_strip_db_prefix():
    assert strip_db_prefix('SELECT * FROM "PROD"."SALES"."ORDERS"') == \
        'SELECT * FROM sales."orders"'
    assert strip_db_prefix("SELECT * FROM prod.sales.orders") == \
        "SELECT * FROM sales.orders"


def test_iff_rewrite_nested():
    out = rewrite_functions("SELECT IFF(a > 1, IFF(b > 2, 'x', 'y'), 'z')")
    assert out == "SELECT IF(a > 1, IF(b > 2, 'x', 'y'), 'z')"


def test_getdate_sysdate():
    out = rewrite_functions("SELECT GETDATE(), SYSDATE()")
    assert out == "SELECT current_timestamp(), current_timestamp()"


def test_datediff_to_timestampdiff():
    out = rewrite_functions("SELECT DATEDIFF(day, a, b)")
    assert out == "SELECT TIMESTAMPDIFF(day, a, b)"


def test_double_colon_casts():
    assert rewrite_double_colon_casts("SELECT a::VARCHAR") == "SELECT CAST(a AS STRING)"
    assert rewrite_double_colon_casts("SELECT a::NUMBER") == "SELECT CAST(a AS DECIMAL(38,0))"
    assert rewrite_double_colon_casts("SELECT a::NUMBER(10,2)") == \
        "SELECT CAST(a AS DECIMAL(10,2))"
    assert rewrite_double_colon_casts("SELECT (a + b)::FLOAT") == \
        "SELECT CAST((a + b) AS DOUBLE)"
    assert rewrite_double_colon_casts("SELECT f(x)::TEXT") == "SELECT CAST(f(x) AS STRING)"


def test_format_token_translation():
    out = rewrite_datetime_formats("SELECT TO_TIMESTAMP(c, 'YYYY-MM-DD HH24:MI:SS')")
    assert out == "SELECT TO_TIMESTAMP(c, 'yyyy-MM-dd HH:mm:ss')"
    out2 = rewrite_datetime_formats("SELECT TO_CHAR(d, 'YYYY-MM')")
    assert out2 == "SELECT DATE_FORMAT(d, 'yyyy-MM')"


def test_split_to_table_rewrite():
    out = rewrite_split_to_table(
        "SELECT t.id, s.value FROM t, LATERAL SPLIT_TO_TABLE(t.tags, ',') s"
    )
    assert "LATERAL VIEW explode(split(t.tags, ','))" in out
    assert out.rstrip().endswith("s AS value")


def test_qualify_bare_tables_cte_exempt():
    sql = "WITH x AS (SELECT 1 FROM t1) SELECT * FROM x JOIN t2 ON x.a = t2.a"
    out = qualify_bare_tables(sql, "myschema")
    assert "FROM t1" not in out and "myschema.t1" in out
    assert "JOIN myschema.t2" in out
    assert "FROM x " in out or "FROM x\n" in out or "FROM x J" in out  # CTE untouched


def test_cross_schema_detection():
    refs = detect_cross_schema_refs(
        "SELECT * FROM other.t1 JOIN home.t2 ON 1=1 JOIN t3 ON 1=1", "home"
    )
    assert refs == ["other.t1"]


def test_translate_view_end_to_end(spark, sf_dir):
    from snowflake_to_postgres_spark.sources import register_views

    register_views(spark, sf_dir, ("orders",))
    ddl = """CREATE OR REPLACE VIEW "DB"."PUBLIC"."ORDER_BUCKETS" AS
        SELECT IFF(o_totalprice > 200000, 'big', 'small') AS bucket,
               o_orderkey::VARCHAR AS key_str,
               DATEDIFF(day, o_orderdate, GETDATE()) AS age_days
        FROM public.orders"""
    tv = translate_view(ddl, home_schema="public")
    assert tv.name == "order_buckets"
    # Spark should accept and execute the translated SQL directly
    # (strip the schema qualifier since orders is a temp view here)
    runnable = tv.spark_sql.replace("public.orders", "orders")
    spark.sql(runnable)
    out = spark.sql("SELECT * FROM order_buckets LIMIT 5").collect()
    assert len(out) == 5 and set(out[0].asDict()) == {"bucket", "key_str", "age_days"}


def test_procedure_stub():
    stub = translate_procedure_stub("p1", "CREATE PROCEDURE p1 AS $$ return 1 $$")
    assert "manual translation" in stub and stub.startswith("-- PROCEDURE p1")


def test_rewrite_qualify_textual():
    from snowflake_to_postgres_spark.plans.dialect import rewrite_qualify

    sql = ("SELECT k, v FROM t "
           "QUALIFY ROW_NUMBER() OVER (PARTITION BY k ORDER BY v DESC) = 1")
    out = rewrite_qualify(sql)
    assert "QUALIFY" not in out.upper().replace("__QUALIFY", "")
    assert "EXCEPT (__qualify_0)" in out
    assert "WHERE __qualify_0 = 1" in out
    # no QUALIFY → untouched
    assert rewrite_qualify("SELECT 1 FROM t WHERE x = 2") == "SELECT 1 FROM t WHERE x = 2"
    # QUALIFY inside a subquery at depth > 0 is not this block's clause
    nested = "SELECT * FROM (SELECT a FROM x QUALIFY RANK() OVER (ORDER BY a) = 1) q WHERE a > 0"
    assert rewrite_qualify(nested) == nested


def test_qualify_view_end_to_end(spark, sf_dir):
    """A Snowflake view using QUALIFY must translate and run on Spark,
    and match the ANSI window-subquery formulation."""
    from snowflake_to_postgres_spark.plans.dialect import translate_view
    from snowflake_to_postgres_spark.sources import register_views

    register_views(spark, sf_dir, ("orders",))
    ddl = (
        'CREATE OR REPLACE VIEW "DB"."PUBLIC"."LATEST_ORDER" AS '
        "SELECT o_custkey, o_orderkey, o_orderdate FROM orders "
        "QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey "
        "ORDER BY o_orderdate DESC, o_orderkey DESC) = 1"
    )
    tv = translate_view(ddl, home_schema="public")
    spark.sql(tv.spark_sql)
    got = {(r[0], r[1]) for r in spark.sql("SELECT o_custkey, o_orderkey FROM latest_order").collect()}
    want = {(r[0], r[1]) for r in spark.sql(
        "SELECT o_custkey, o_orderkey FROM ("
        " SELECT o_custkey, o_orderkey, ROW_NUMBER() OVER (PARTITION BY o_custkey"
        " ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders) WHERE rn = 1"
    ).collect()}
    assert got == want and got
    spark.sql("DROP VIEW IF EXISTS latest_order")


def test_rewrite_top_minus_sample(spark, sf_dir):
    from snowflake_to_postgres_spark.plans.dialect import (
        rewrite_minus,
        rewrite_sample,
        rewrite_top,
    )
    from snowflake_to_postgres_spark.sources import register_views

    assert rewrite_top("SELECT TOP 5 a FROM t ORDER BY a") == \
        "SELECT a FROM t ORDER BY a LIMIT 5"
    assert rewrite_top("SELECT a FROM t") == "SELECT a FROM t"
    assert rewrite_minus("SELECT a FROM x MINUS SELECT a FROM y") == \
        "SELECT a FROM x EXCEPT SELECT a FROM y"
    assert rewrite_sample("SELECT * FROM t SAMPLE (10)") == \
        "SELECT * FROM t TABLESAMPLE (10 PERCENT)"
    assert rewrite_sample("SELECT * FROM t SAMPLE ROW (25 ROWS)") == \
        "SELECT * FROM t TABLESAMPLE (25 ROWS)"

    # the rewritten forms must actually execute on Spark
    register_views(spark, sf_dir, ("nation",))
    assert len(spark.sql(rewrite_top("SELECT TOP 3 n_name FROM nation ORDER BY n_name")).collect()) == 3
    assert spark.sql(rewrite_minus(
        "SELECT n_regionkey FROM nation MINUS SELECT 0 AS n_regionkey"
    )).count() > 0
    assert len(spark.sql(rewrite_sample("SELECT * FROM nation SAMPLE ROW (4 ROWS)")).collect()) == 4
