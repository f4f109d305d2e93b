"""Type mapping: Snowflake type strings ↔ Spark DataTypes ↔ Postgres DDL.

Re-expresses the reference's translation map (translator.py:15-54 with
parameterization rules :56-82) with Spark's type system as the hub IR
(SURVEY §1.3 table). Unknown types fall back to string/TEXT
(translator.py:82).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import types as T


@dataclass(frozen=True)
class ParsedType:
    base: str
    precision: int | None = None
    scale: int | None = None
    length: int | None = None


_TYPE_RE = re.compile(r"^\s*([A-Za-z_ ]+?)\s*(?:\(\s*(\d+)\s*(?:,\s*(\d+)\s*)?\))?\s*$")


def parse_snowflake_type(s: str) -> ParsedType:
    """'NUMBER(12,2)' → (NUMBER, 12, 2); 'VARCHAR(50)' → (VARCHAR, len 50)."""
    m = _TYPE_RE.match(s)
    if not m:
        return ParsedType(s.strip().upper())
    base = m.group(1).strip().upper()
    p1 = int(m.group(2)) if m.group(2) else None
    p2 = int(m.group(3)) if m.group(3) else None
    if base in ("VARCHAR", "CHAR", "CHARACTER", "STRING", "TEXT", "BINARY", "VARBINARY"):
        return ParsedType(base, length=p1)
    return ParsedType(base, precision=p1, scale=p2)


def snowflake_to_spark(type_str: str) -> T.DataType:
    """Snowflake type string → Spark DataType (SURVEY §1.3 mapping)."""
    t = parse_snowflake_type(type_str)
    b = t.base
    if b in ("NUMBER", "DECIMAL", "NUMERIC"):
        if t.precision is None:
            return T.DecimalType(38, 0)
        return T.DecimalType(t.precision, t.scale or 0)
    if b in ("INT", "INTEGER"):
        return T.IntegerType()
    if b == "BIGINT":
        return T.LongType()
    if b == "SMALLINT":
        return T.ShortType()
    if b in ("TINYINT", "BYTEINT"):
        return T.ByteType()
    if b in ("FLOAT", "FLOAT8", "DOUBLE", "DOUBLE PRECISION"):
        return T.DoubleType()
    if b in ("FLOAT4", "REAL"):
        return T.FloatType()
    if b in ("VARCHAR", "CHAR", "CHARACTER", "STRING", "TEXT"):
        return T.StringType()
    if b in ("BINARY", "VARBINARY"):
        return T.BinaryType()
    if b == "DATE":
        return T.DateType()
    if b in ("DATETIME", "TIMESTAMP", "TIMESTAMP_NTZ"):
        return T.TimestampNTZType()
    if b in ("TIMESTAMP_LTZ", "TIMESTAMP_TZ"):
        return T.TimestampType()
    if b == "TIME":
        return T.StringType()  # no native TIME in Spark — documented gap
    if b == "BOOLEAN":
        return T.BooleanType()
    if b in ("VARIANT", "OBJECT", "ARRAY"):
        return T.StringType()  # JSON text + from_json/get_json_object on use
    return T.StringType()  # unknown → TEXT fallback (translator.py:82)


def spark_to_postgres(dt: T.DataType, length: int | None = None) -> str:
    """Spark DataType → Postgres DDL type (the reference's target surface,
    translator.py:15-54 right-hand column)."""
    if isinstance(dt, T.DecimalType):
        return f"NUMERIC({dt.precision},{dt.scale})"
    if isinstance(dt, T.ByteType) or isinstance(dt, T.ShortType):
        return "SMALLINT"
    if isinstance(dt, T.IntegerType):
        return "INTEGER"
    if isinstance(dt, T.LongType):
        return "BIGINT"
    if isinstance(dt, T.FloatType):
        return "REAL"
    if isinstance(dt, T.DoubleType):
        return "DOUBLE PRECISION"
    if isinstance(dt, T.StringType):
        return f"VARCHAR({length})" if length else "TEXT"
    if isinstance(dt, T.BinaryType):
        return "BYTEA"
    if isinstance(dt, T.DateType):
        return "DATE"
    if isinstance(dt, T.TimestampNTZType):
        return "TIMESTAMP"
    if isinstance(dt, T.TimestampType):
        return "TIMESTAMP WITH TIME ZONE"
    if isinstance(dt, T.BooleanType):
        return "BOOLEAN"
    if isinstance(dt, (T.ArrayType, T.MapType, T.StructType)):
        return "JSONB"
    return "TEXT"


def spark_to_spark_ddl(dt: T.DataType) -> str:
    """Spark DataType → Spark SQL DDL type string (for CREATE TABLE
    targets in the Spark catalog)."""
    return dt.simpleString()
