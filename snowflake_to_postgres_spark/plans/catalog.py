"""Schema model + discovery: the reference's dataclass catalog
(discovery.py:19-96) re-expressed around StructType as the single IR
(SURVEY §1.1/§1.4).

Discovery sources: a parquet directory (this environment) or any Spark
catalog/JDBC info-schema (same model, different reader). Identifier
case-folding is one pure function applied at every boundary — the
reference's biggest bug source (SURVEY §7.3 #4; discovery.py:147,237).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from enum import Enum

from pyspark.sql import SparkSession
from pyspark.sql import types as T


def normalize_identifier(name: str) -> str:
    """Snowflake-upper / Postgres-lower folding: one rule, lower-case,
    applied at discovery and DDL time (discovery.py:147,237;
    translator.py:132-144)."""
    return name.strip().strip('"').lower()


class ConstraintType(Enum):  # discovery.py:12-16
    PRIMARY_KEY = "PRIMARY KEY"
    FOREIGN_KEY = "FOREIGN KEY"
    UNIQUE = "UNIQUE"
    CHECK = "CHECK"


@dataclass
class ColumnInfo:  # discovery.py:19-31
    name: str
    data_type: T.DataType
    is_nullable: bool = True
    default_value: str | None = None
    character_maximum_length: int | None = None
    ordinal_position: int = 0
    comment: str | None = None

    def to_struct_field(self) -> T.StructField:
        md = {}
        if self.comment:
            md["comment"] = self.comment
        if self.character_maximum_length:
            md["char_length"] = self.character_maximum_length
        return T.StructField(self.name, self.data_type, self.is_nullable, md)


@dataclass
class ConstraintInfo:  # discovery.py:34-43
    name: str
    type: ConstraintType
    columns: list[str]
    referenced_table: str | None = None
    referenced_columns: list[str] | None = None
    check_clause: str | None = None


@dataclass
class TableInfo:  # discovery.py:56-69 (Index dropped — never populated there)
    name: str
    schema: str
    columns: list[ColumnInfo] = field(default_factory=list)
    primary_key: ConstraintInfo | None = None
    foreign_keys: list[ConstraintInfo] = field(default_factory=list)
    unique_constraints: list[ConstraintInfo] = field(default_factory=list)
    comment: str | None = None
    row_count: int | None = None

    def to_struct(self) -> T.StructType:
        return T.StructType([c.to_struct_field() for c in self.columns])


@dataclass
class ViewInfo:  # discovery.py:72-77
    name: str
    ddl: str


@dataclass
class ProcedureInfo:  # discovery.py:80-85
    name: str
    ddl: str


@dataclass
class SchemaInfo:  # discovery.py:88-96
    name: str
    database: str = ""
    tables: list[TableInfo] = field(default_factory=list)
    views: list[ViewInfo] = field(default_factory=list)
    procedures: list[ProcedureInfo] = field(default_factory=list)


def columns_from_struct(schema: T.StructType) -> list[ColumnInfo]:
    """StructType → catalog columns (S3's inverse direction)."""
    out = []
    for i, f in enumerate(schema.fields, start=1):
        out.append(
            ColumnInfo(
                name=normalize_identifier(f.name),
                data_type=f.dataType,
                is_nullable=f.nullable,
                character_maximum_length=(f.metadata or {}).get("char_length"),
                ordinal_position=i,
                comment=(f.metadata or {}).get("comment"),
            )
        )
    return out


def discover_parquet_schema(
    spark: SparkSession,
    directory: str,
    schema_name: str = "default",
    table_filter: str | None = None,
    with_row_counts: bool = True,
) -> SchemaInfo:
    """Discovery over a parquet directory (S2/S3/S7 — the reference's
    INFORMATION_SCHEMA scans, discovery.py:106-248, against file
    metadata instead). ``table_filter`` mirrors the case-insensitive
    single-table filter (P6, discovery.py:131-141)."""
    info = SchemaInfo(normalize_identifier(schema_name))
    names = sorted(
        f[: -len(".parquet")]
        for f in os.listdir(directory)
        if f.endswith(".parquet")
    )
    if table_filter:
        names = [n for n in names if n.lower() == table_filter.lower()]
    for name in names:
        df = spark.read.parquet(os.path.join(directory, name + ".parquet"))
        t = TableInfo(
            name=normalize_identifier(name),
            schema=info.name,
            columns=columns_from_struct(df.schema),
        )
        if with_row_counts:
            t.row_count = df.count()  # S7, discovery.py:348-357
        info.tables.append(t)
    return info


def assert_schema_exists(spark: SparkSession, db: str) -> None:
    """S9 (sf_migrate.py:909-938): fail fast with the available list."""
    if not spark.catalog.databaseExists(db):
        available = [d.name for d in spark.catalog.listDatabases()]
        raise ValueError(f"schema '{db}' not found; available: {available}")


def constraints_from_properties(props: dict[str, str]) -> dict:
    """S4-S6 on Spark targets: constraints round-trip through
    TBLPROPERTIES (ddl.generate_table_ddl writes them; Spark enforces
    nothing — the validation engine is the enforcement layer). Returns
    {'primary_key': [...], 'unique': [[...], ...]}."""
    out: dict = {"primary_key": None, "unique": []}
    pk = props.get("primary_key")
    if pk:
        out["primary_key"] = [c.strip() for c in pk.split(",")]
    for k in sorted(props):
        if k.startswith("unique_"):
            out["unique"].append([c.strip() for c in props[k].split(",")])
    return out


def describe_table(spark: SparkSession, qualified_name: str) -> dict:
    """S8 (discovery.py:359-441's COMMENT + GET_DDL fetch): DESCRIBE
    TABLE EXTENDED + SHOW CREATE TABLE against the Spark catalog."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {qualified_name}").collect()
    out: dict = {"columns": [], "properties": {}, "comment": None}
    section = "columns"
    for r in rows:
        name = (r["col_name"] or "").strip()
        if not name:
            section = "meta"
            continue
        if section == "columns" and not name.startswith("#"):
            out["columns"].append((name, r["data_type"]))
        elif name == "Comment":
            out["comment"] = r["data_type"]
    try:
        # SHOW TBLPROPERTIES yields one row per property — unlike the
        # DESCRIBE blob, it survives commas inside values
        for r in spark.sql(f"SHOW TBLPROPERTIES {qualified_name}").collect():
            out["properties"][r["key"]] = r["value"]
    except Exception:  # noqa: BLE001 — views have no properties
        pass
    try:
        out["ddl"] = spark.sql(f"SHOW CREATE TABLE {qualified_name}").collect()[0][0]
    except Exception:  # noqa: BLE001 — temp views have no stored DDL
        out["ddl"] = None
    return out
