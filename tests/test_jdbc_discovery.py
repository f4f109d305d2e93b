"""Live-catalog JDBC discovery (S2/S4/S5) against Apache Derby — the
JDBC backend that ships inside Spark's JVM, so the whole path is real:
seeded database → Spark JDBC catalog scans → SchemaInfo.

Covers: table enumeration, column types/nullability/defaults, PK,
multi-column UNIQUE, single- and multi-column FKs (including the
ordinal-descriptor resolution Derby needs), view enumeration, row
counts, table_filter, and shape-parity with the parquet discovery path.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from snowflake_to_postgres_spark.plans.catalog import (
    ConstraintType,
    SchemaInfo,
    TableInfo,
    discover_parquet_schema,
)
from snowflake_to_postgres_spark.plans.jdbc_discovery import (
    DERBY_CATALOG_QUERIES,
    _descriptor_ordinals,
    discover_jdbc_schema,
)
from snowflake_to_postgres_spark.sources.jdbc import JdbcConfig

_DB = "memory:discovery_test"
_URL = f"jdbc:derby:{_DB}"

_SEED = [
    """CREATE TABLE dept (
         dept_id INT NOT NULL,
         dept_name VARCHAR(50) NOT NULL,
         CONSTRAINT pk_dept PRIMARY KEY (dept_id),
         CONSTRAINT uq_dept_name UNIQUE (dept_name))""",
    """CREATE TABLE emp (
         emp_id INT NOT NULL,
         dept_id INT,
         salary DECIMAL(10,2) DEFAULT 0.00,
         hired DATE,
         CONSTRAINT pk_emp PRIMARY KEY (emp_id),
         CONSTRAINT fk_emp_dept FOREIGN KEY (dept_id)
             REFERENCES dept (dept_id))""",
    """CREATE TABLE orderhead (
         region_id INT NOT NULL,
         order_no BIGINT NOT NULL,
         placed TIMESTAMP,
         CONSTRAINT pk_orderhead PRIMARY KEY (region_id, order_no))""",
    """CREATE TABLE orderline (
         region_id INT NOT NULL,
         order_no BIGINT NOT NULL,
         line_no INT NOT NULL,
         amount DOUBLE,
         CONSTRAINT fk_line_head FOREIGN KEY (region_id, order_no)
             REFERENCES orderhead (region_id, order_no))""",
    "CREATE VIEW dept_names AS SELECT dept_name FROM dept",
    # Derby validates the backing Java class at CALL time, not CREATE
    # time — a dangling EXTERNAL NAME is fine for catalog enumeration.
    """CREATE PROCEDURE refresh_dept(IN d INT)
         LANGUAGE JAVA PARAMETER STYLE JAVA
         EXTERNAL NAME 'com.example.DeptJobs.refresh'""",
    "INSERT INTO dept VALUES (1, 'eng'), (2, 'ops')",
    "INSERT INTO emp VALUES (10, 1, 100.50, DATE('2020-01-01')), (11, 2, NULL, NULL)",
    "INSERT INTO orderhead VALUES (1, 100, NULL)",
    "INSERT INTO orderline VALUES (1, 100, 1, 9.5)",
]


@pytest.fixture(scope="module")
def derby_schema(spark):
    """Seed an in-memory Derby catalog (same JVM as Spark's executors)
    and return the discovered SchemaInfo."""
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(_URL + ";create=true")
    st = conn.createStatement()
    try:
        for ddl in _SEED:
            st.execute(ddl)
    finally:
        st.close()
        conn.close()
    cfg = JdbcConfig(url=_URL, driver="org.apache.derby.iapi.jdbc.AutoloadedDriver")
    info = discover_jdbc_schema(
        spark, cfg, "APP", DERBY_CATALOG_QUERIES, with_row_counts=True
    )
    yield info
    try:
        jvm.java.sql.DriverManager.getConnection(_URL + ";drop=true")
    except Exception:  # noqa: BLE001 — drop "succeeds" by raising 08006
        pass


def _table(info: SchemaInfo, name: str) -> TableInfo:
    return next(t for t in info.tables if t.name == name)


def test_tables_enumerated(derby_schema):
    assert isinstance(derby_schema, SchemaInfo)
    assert derby_schema.name == "app"
    assert [t.name for t in derby_schema.tables] == [
        "dept", "emp", "orderhead", "orderline",
    ]


def test_columns_types_nullability_defaults(derby_schema):
    emp = _table(derby_schema, "emp")
    cols = {c.name: c for c in emp.columns}
    assert [c.name for c in emp.columns] == ["emp_id", "dept_id", "salary", "hired"]
    assert cols["emp_id"].data_type == T.IntegerType()
    assert not cols["emp_id"].is_nullable
    assert cols["dept_id"].is_nullable
    assert cols["salary"].data_type == T.DecimalType(10, 2)
    assert cols["salary"].default_value == "0.00"
    assert cols["hired"].data_type == T.DateType()
    assert [c.ordinal_position for c in emp.columns] == [1, 2, 3, 4]


def test_primary_keys(derby_schema):
    assert _table(derby_schema, "dept").primary_key.columns == ["dept_id"]
    # composite PK keeps declaration order
    assert _table(derby_schema, "orderhead").primary_key.columns == [
        "region_id", "order_no",
    ]
    assert (
        _table(derby_schema, "dept").primary_key.type is ConstraintType.PRIMARY_KEY
    )


def test_unique_constraints(derby_schema):
    uq = _table(derby_schema, "dept").unique_constraints
    assert len(uq) == 1
    assert uq[0].name == "uq_dept_name"
    assert uq[0].columns == ["dept_name"]


def test_foreign_keys_single_and_composite(derby_schema):
    emp_fks = _table(derby_schema, "emp").foreign_keys
    assert len(emp_fks) == 1
    assert emp_fks[0].columns == ["dept_id"]
    assert emp_fks[0].referenced_table == "dept"
    assert emp_fks[0].referenced_columns == ["dept_id"]

    line_fks = _table(derby_schema, "orderline").foreign_keys
    assert len(line_fks) == 1
    assert line_fks[0].columns == ["region_id", "order_no"]
    assert line_fks[0].referenced_table == "orderhead"
    assert line_fks[0].referenced_columns == ["region_id", "order_no"]


def test_views_enumerated(derby_schema):
    assert [v.name for v in derby_schema.views] == ["dept_names"]
    assert "dept_name" in derby_schema.views[0].ddl.lower()


def test_procedures_enumerated(derby_schema):
    """Live procedure listing (reference discovery.py:389-441) feeding
    the manual-TODO stub emitter (view_procedure_translator.py:343-383
    parity — both engines punt on procedure translation)."""
    from snowflake_to_postgres_spark.plans.dialect import translate_procedure_stub

    assert [p.name for p in derby_schema.procedures] == ["refresh_dept"]
    assert "com.example.DeptJobs" in derby_schema.procedures[0].ddl
    stub = translate_procedure_stub(
        derby_schema.procedures[0].name, derby_schema.procedures[0].ddl
    )
    assert "refresh_dept" in stub and "manual" in stub.lower()


def test_row_counts(derby_schema):
    assert _table(derby_schema, "dept").row_count == 2
    assert _table(derby_schema, "emp").row_count == 2
    assert _table(derby_schema, "orderline").row_count == 1


def test_table_filter(spark):
    cfg = JdbcConfig(url=_URL, driver="org.apache.derby.iapi.jdbc.AutoloadedDriver")
    info = discover_jdbc_schema(
        spark, cfg, "APP", DERBY_CATALOG_QUERIES, table_filter="EMP"
    )
    assert [t.name for t in info.tables] == ["emp"]
    assert info.views == []  # filtered discovery skips views, like the reference


def test_shape_parity_with_parquet_path(spark, sf_dir, derby_schema):
    """Both discovery paths produce the identical dataclass shape, so
    DDL generation and transfer planning are source-agnostic."""
    pq = discover_parquet_schema(spark, sf_dir, "pq", with_row_counts=False)
    jd = derby_schema
    assert type(pq) is type(jd)
    for info in (pq, jd):
        for t in info.tables:
            assert isinstance(t, TableInfo)
            assert t.to_struct()  # StructType IR builds from both
            assert all(c.name == c.name.lower() for c in t.columns)


def test_descriptor_ordinal_parsing():
    assert _descriptor_ordinals("UNIQUE BTREE (1)") == [1]
    assert _descriptor_ordinals("BTREE (2, 7, 3)") == [2, 7, 3]
    assert _descriptor_ordinals("HEAP") == []
    assert _descriptor_ordinals(None) == []
