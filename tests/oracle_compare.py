"""Local re-implementation of the driver's Spark-vs-DuckDB comparison:
row count + column names + order-insensitive value comparison, with value
canonicalization (Decimal kept exact, floats compared bit-for-bit, dates
as dates). Stricter than the driver can be assumed to be — if this
passes, the driver's hash check should too."""

from __future__ import annotations

import datetime
import decimal
import math


def _canon(v):
    if v is None:
        return ("null",)
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, int):
        return ("num", decimal.Decimal(v))
    if isinstance(v, decimal.Decimal):
        return ("dec", v)  # keeps scale: 1.50 != 1.5 → exposes scale drift
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        return ("float", v.hex())
    if isinstance(v, datetime.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, datetime.date):
        return ("date", v.isoformat())
    if isinstance(v, (bytes, bytearray)):
        return ("bytes", bytes(v).hex())
    if isinstance(v, list):
        return ("list", tuple(_canon(x) for x in v))
    return ("str", str(v))


def compare_frames(spark_df, duck_rel):
    """Return (ok, message). spark_df: pyspark DataFrame; duck_rel: duckdb
    result of con.execute(sql)."""
    s_cols = list(spark_df.columns)
    d_cols = [d[0] for d in duck_rel.description]
    if sorted(s_cols) != sorted(d_cols):
        return False, f"column mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}"

    s_rows = spark_df.collect()
    d_rows = duck_rel.fetchall()
    if len(s_rows) != len(d_rows):
        return False, f"row count mismatch: spark={len(s_rows)} duck={len(d_rows)}"

    order = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
    d_order = sorted(range(len(d_cols)), key=lambda i: d_cols[i])

    s_set = sorted(
        tuple(_canon(row[s_cols[i]]) for i in order) for row in s_rows
    )
    d_set = sorted(tuple(_canon(row[i]) for i in d_order) for row in d_rows)
    if s_set != d_set:
        for i, (a, b) in enumerate(zip(s_set, d_set)):
            if a != b:
                return False, f"first value mismatch at sorted row {i}:\n spark={a}\n duck ={b}"
        return False, "value mismatch (sets differ)"
    return True, "ok"
