"""DDL generation: CREATE SCHEMA/TABLE with constraints, FK topological
ordering, destroy — the reference's translator surface (translator.py:
91-229) targeting either Postgres DDL (JDBC sink) or Spark SQL DDL
(catalog sink).

FKs are emitted as deferred ALTER TABLE statements after all tables
(translator.py:111-117,180-195); table order follows a DFS topo-sort over
FK references (translator.py:197-221). Spark targets carry constraints as
TBLPROPERTIES (Spark has no enforced constraints — the validation engine
is the enforcement mechanism, SURVEY §1.1)."""

from __future__ import annotations

from snowflake_to_postgres_spark.plans.catalog import (
    ColumnInfo,
    ConstraintInfo,
    SchemaInfo,
    TableInfo,
)
from snowflake_to_postgres_spark.plans.typemap import spark_to_postgres, spark_to_spark_ddl


def _q(ident: str) -> str:
    return '"' + ident.replace('"', '""') + '"'


def _esc(text: str) -> str:  # translator.py:223-225
    return text.replace("'", "''")


def topo_sort_tables(tables: list[TableInfo]) -> list[TableInfo]:
    """DFS topo-sort so FK parents precede children (translator.py:197-221).
    Cycles break at the visit point (FKs are deferred anyway)."""
    by_name = {t.name: t for t in tables}
    visited: set[str] = set()
    out: list[TableInfo] = []

    def visit(t: TableInfo, stack: frozenset[str]) -> None:
        if t.name in visited or t.name in stack:
            return
        for fk in t.foreign_keys:
            ref = by_name.get(fk.referenced_table or "")
            if ref is not None and ref.name != t.name:
                visit(ref, stack | {t.name})
        if t.name not in visited:
            visited.add(t.name)
            out.append(t)

    for t in tables:
        visit(t, frozenset())
    return out


def _pg_column_def(c: ColumnInfo) -> str:  # translator.py:163-178
    parts = [_q(c.name), spark_to_postgres(c.data_type, c.character_maximum_length)]
    if not c.is_nullable:
        parts.append("NOT NULL")
    # sequence/CURRENT_* defaults stripped, literal defaults kept
    # (translator.py:172-176)
    if c.default_value and not any(
        k in c.default_value.upper() for k in ("NEXTVAL", ".", "CURRENT_", "SYSDATE")
    ):
        parts.append(f"DEFAULT {c.default_value}")
    return " ".join(parts)


def generate_table_ddl(t: TableInfo, dialect: str = "postgres") -> list[str]:
    """CREATE TABLE IF NOT EXISTS with inline PK/UNIQUE + COMMENT ON
    (translator.py:120-161). ``dialect='spark'`` emits Spark SQL with
    constraints as TBLPROPERTIES."""
    qname = f"{_q(t.schema)}.{_q(t.name)}"
    stmts: list[str] = []
    if dialect == "postgres":
        defs = [_pg_column_def(c) for c in t.columns]
        if t.primary_key:
            defs.append(
                "PRIMARY KEY (" + ", ".join(_q(c) for c in t.primary_key.columns) + ")"
            )
        for u in t.unique_constraints:
            defs.append("UNIQUE (" + ", ".join(_q(c) for c in u.columns) + ")")
        stmts.append(
            f"CREATE TABLE IF NOT EXISTS {qname} (\n    "
            + ",\n    ".join(defs)
            + "\n)"
        )
        if t.comment:
            stmts.append(f"COMMENT ON TABLE {qname} IS '{_esc(t.comment)}'")
        for c in t.columns:
            if c.comment:
                stmts.append(
                    f"COMMENT ON COLUMN {qname}.{_q(c.name)} IS '{_esc(c.comment)}'"
                )
    else:  # spark
        defs = []
        for c in t.columns:
            d = f"{c.name} {spark_to_spark_ddl(c.data_type)}"
            if not c.is_nullable:
                d += " NOT NULL"
            if c.comment:
                d += f" COMMENT '{_esc(c.comment)}'"
            defs.append(d)
        props = []
        if t.primary_key:
            props.append(f"'primary_key'='{','.join(t.primary_key.columns)}'")
        for i, u in enumerate(t.unique_constraints):
            props.append(f"'unique_{i}'='{','.join(u.columns)}'")
        ddl = (
            f"CREATE TABLE IF NOT EXISTS {t.schema}.{t.name} (\n    "
            + ",\n    ".join(defs)
            + "\n) USING parquet"
        )
        if t.comment:
            ddl += f"\nCOMMENT '{_esc(t.comment)}'"
        if props:
            ddl += "\nTBLPROPERTIES (" + ", ".join(props) + ")"
        stmts.append(ddl)
    return stmts


def generate_fk_ddl(t: TableInfo) -> list[str]:
    """Deferred ALTER TABLE ADD FOREIGN KEY (translator.py:180-195);
    Postgres-only (Spark has no FK DDL — recorded in TBLPROPERTIES)."""
    out = []
    for fk in t.foreign_keys:
        cols = ", ".join(_q(c) for c in fk.columns)
        rcols = ", ".join(_q(c) for c in fk.referenced_columns or [])
        out.append(
            f"ALTER TABLE {_q(t.schema)}.{_q(t.name)} "
            f"ADD CONSTRAINT {_q(fk.name)} FOREIGN KEY ({cols}) "
            f"REFERENCES {_q(t.schema)}.{_q(fk.referenced_table)} ({rcols})"
        )
    return out


def generate_schema_ddl(info: SchemaInfo, dialect: str = "postgres") -> list[str]:
    """Full build script: CREATE SCHEMA, topo-ordered CREATE TABLEs,
    deferred FKs (translator.py:91-118)."""
    stmts: list[str] = []
    if dialect == "postgres":
        stmts.append(f"CREATE SCHEMA IF NOT EXISTS {_q(info.name)}")
    else:
        stmts.append(f"CREATE DATABASE IF NOT EXISTS {info.name}")
    ordered = topo_sort_tables(info.tables)
    for t in ordered:
        stmts.extend(generate_table_ddl(t, dialect))
    if dialect == "postgres":
        for t in ordered:
            stmts.extend(generate_fk_ddl(t))
    return stmts


def destroy_ddl(schema: str, dialect: str = "postgres") -> str:
    """O8 (translator.py:227-229) — caller is responsible for the
    typed-name confirmation gate (sf_migrate.py:532-562)."""
    if dialect == "postgres":
        return f"DROP SCHEMA IF EXISTS {_q(schema)} CASCADE"
    return f"DROP DATABASE IF EXISTS {schema} CASCADE"


def execute_ddl(
    spark_or_conn,
    statements: list[str],
    dry_run: bool = False,
    stop_on_error: bool = True,
) -> dict:
    """S13 (executor.py:34-124): run a statement list with dry-run and
    stop-vs-continue semantics. For Spark targets pass a SparkSession;
    the JDBC path takes any DB-API connection."""
    executed, errors = [], []
    for stmt in statements:
        if dry_run:
            executed.append(stmt)
            continue
        try:
            if hasattr(spark_or_conn, "sql"):
                spark_or_conn.sql(stmt)
            else:
                cur = spark_or_conn.cursor()
                cur.execute(stmt)
            executed.append(stmt)
        except Exception as e:  # noqa: BLE001
            errors.append((stmt, str(e)))
            if stop_on_error:
                break
    return {"executed": executed, "errors": errors, "dry_run": dry_run}
