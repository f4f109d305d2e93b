"""Scalar/table function surface as PySpark expressions (SURVEY §2.6
F1-F14) — the programmatic twin of the SQL dialect layer, for users
building DataFrame plans directly.

Production-speed hashing lives here too: the oracle-checked operators use
md5 (engine-portable); ``fast_hash``/``fast_hash64`` are the xxhash64
(JVM codegen) equivalents to swap in on a real cluster.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def iff(cond: Column, a, b) -> Column:
    """F1: Snowflake IFF."""
    return F.when(cond, a).otherwise(b)


def nvl(a: Column, b) -> Column:
    """F2: NVL/IFNULL → coalesce."""
    return F.coalesce(a, F.lit(b) if not isinstance(b, Column) else b)


def split_to_table(col, delim: str) -> Column:
    """F9: SPLIT_TO_TABLE's value column — use inside select() with
    explode fan-out."""
    return F.explode(F.split(col, delim))


def to_timestamp_sf(col, sf_format: str | None = None) -> Column:
    """F5: TO_TIMESTAMP with a Snowflake format string."""
    from snowflake_to_postgres_spark.plans.dialect import translate_format_string

    if sf_format is None:
        return F.to_timestamp(col)
    return F.to_timestamp(col, translate_format_string(sf_format))


def datediff_sf(part: str, start: Column, end: Column) -> Column:
    """F7: Snowflake DATEDIFF(part, a, b) semantics (boundary count, not
    elapsed) — days via datediff, months via months_between floor,
    others via timestampdiff."""
    p = part.lower()
    if p in ("day", "dd", "d"):
        return F.datediff(end.cast("date"), start.cast("date"))
    if p in ("month", "mm", "mon"):
        return (
            (F.year(end) * 12 + F.month(end)) - (F.year(start) * 12 + F.month(start))
        )
    if p in ("year", "yy", "yyyy"):
        return F.year(end) - F.year(start)
    return F.timestamp_diff(part, start, end)


def null_byte_scrub(col) -> Column:
    """P7 (data_transfer.py:343-352): strip NUL bytes — only needed for
    text-protocol legacy sinks."""
    return F.regexp_replace(col, "\x00", "")


def fast_hash(*cols) -> Column:
    """Production 32-bit hash (murmur3, JVM codegen) — the fast-path twin
    of the portable md5 used in oracle-checked operators."""
    return F.hash(*cols)


def fast_hash64(*cols) -> Column:
    """Production 64-bit hash (xxhash64): minhash/simhash/bucketing at
    scale should use this, ~10× cheaper than md5's hex-string path."""
    return F.xxhash64(*cols)


def approx_distinct(col, rsd: float = 0.05) -> Column:
    """HLL++ sketch — the approximate twin of COUNT(DISTINCT) for
    100 TB-scale fingerprinting (SURVEY §2.4 note)."""
    return F.approx_count_distinct(col, rsd)
