"""Data-layout optimization: z-order (Morton) clustering for multi-column
scan locality.

A 100-TB table is usually range- or hash-partitioned on ONE key; queries
filtering on a second dimension then touch every file. Z-ordering
interleaves the bits of two (or more) dimensions into a single sort key
so that files cover compact RECTANGLES of the (x, y) space — parquet
min/max footer stats then prune files for predicates on EITHER
dimension. This is the technique behind Delta Lake's OPTIMIZE ZORDER BY
and the classic UB-tree literature (Bayer 1997); the implementation here
is original and built from Spark built-ins only.

Two layers:

* ``layout_zorder`` — a registered, DuckDB-oracle-checked query that
  computes the per-row z-key over ``orders`` (customer x order-date), so
  the bit-interleave arithmetic itself is verified cross-engine.
* ``write_zordered`` — the sink: range-repartition on the z-key, sort
  within partitions, write parquet. ``tests/test_layout.py`` reads the
  produced footers and asserts every file's min/max box covers a small
  fraction of BOTH dimensions — the property that makes pruning work.

Scale notes: the only pre-pass is a single min/max aggregate per
dimension (one reduced row, broadcast back); binning and interleaving
are pure per-row projections; the range repartition is the same shuffle
any sorted write pays. Equi-WIDTH bins are used for oracle
determinism — for heavily skewed dimensions substitute equi-DEPTH bins
from approxQuantile (driver-bounded, k boundaries) at the same spot.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from snowflake_to_postgres_spark.registry import QuerySpec
from snowflake_to_postgres_spark.sources import load_table

Z_BITS = 8  # bins per dimension = 2^8; z-key space = 2^16


def _interleave_expr(bx: str, by: str, bits: int, int_div: str) -> str:
    """Bit-interleave arithmetic as a SQL expression string.

    Built from integer divide + modulo only (``int_div`` is ``div`` for
    Spark SQL, ``//`` for DuckDB) so both engines evaluate the identical
    integer math: bit k of bx lands at position 2k, of by at 2k+1."""
    terms = []
    for k in range(bits):
        terms.append(f"(({bx} {int_div} {1 << k}) % 2) * {1 << (2 * k)}")
        terms.append(f"(({by} {int_div} {1 << k}) % 2) * {1 << (2 * k + 1)}")
    return " + ".join(terms)


def _binned(col: str, cmin: str, cmax: str, bits: int, int_div: str) -> str:
    """Equi-width bin 0..2^bits-1 via integer arithmetic (no floats —
    float binning rounds differently across engines)."""
    n = 1 << bits
    return f"((({col}) - ({cmin})) * {n}) {int_div} (({cmax}) - ({cmin}) + 1)"


def zorder_key(
    df: DataFrame, col_x: str, col_y: str, bits: int = Z_BITS
) -> DataFrame:
    """Append ``_zx``/``_zy`` (bin ids) and ``_zkey`` (Morton code) for
    two integer-valued columns.

    The min/max pre-pass is ONE reduced row collected to the driver (4
    scalars — same bounded-collect class as the engine's thresholds and
    convergence sums) and re-injected as literals, exactly how
    production z-order sinks stage their stats pass. The key projection
    is then a pure map: no join, no shuffle, nothing for the global
    nested-loop guard to flag."""
    b = df.agg(
        F.min(col_x).alias("xmin"), F.max(col_x).alias("xmax"),
        F.min(col_y).alias("ymin"), F.max(col_y).alias("ymax"),
    ).collect()[0]
    bx = _binned(col_x, str(b["xmin"]), str(b["xmax"]), bits, "div")
    by = _binned(col_y, str(b["ymin"]), str(b["ymax"]), bits, "div")
    return (
        df.withColumn("_zx", F.expr(bx).cast("bigint"))
        .withColumn("_zy", F.expr(by).cast("bigint"))
        .withColumn(
            "_zkey", F.expr(_interleave_expr("_zx", "_zy", bits, "div")).cast("bigint")
        )
    )


def write_zordered(
    df: DataFrame,
    col_x: str,
    col_y: str,
    path: str,
    n_files: int = 16,
    bits: int = Z_BITS,
) -> None:
    """Write ``df`` as parquet clustered on the z-order of (col_x,
    col_y): range-repartition into n_files by z-key, sort within each,
    drop the helper columns. Each output file then covers a compact
    rectangle of the value space, so parquet footer min/max stats prune
    scans filtering on either column."""
    z = zorder_key(df, col_x, col_y, bits)
    (
        z.repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zx", "_zy", "_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def layout_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order key computation over orders: x = o_custkey, y = days
    since epoch of o_orderdate, both equi-width binned to 2^Z_BITS and
    bit-interleaved. The registered query verifies the integer
    bin + interleave math cross-engine; ``write_zordered`` reuses it as
    the clustering sink."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_custkey").cast("bigint").alias("cx"),
        F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("date"))
        .cast("bigint")
        .alias("cy"),
    )
    z = zorder_key(orders, "cx", "cy")
    return z.select(
        "o_orderkey",
        F.col("_zx").alias("bin_cust"),
        F.col("_zy").alias("bin_date"),
        F.col("_zkey").alias("zkey"),
    )


_ZO_BX = _binned("cx", "xmin", "xmax", Z_BITS, "//")
_ZO_BY = _binned("cy", "ymin", "ymax", Z_BITS, "//")
LAYOUT_ZORDER_ORACLE = f"""
WITH base AS (
  SELECT o_orderkey, CAST(o_custkey AS BIGINT) AS cx,
         CAST(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS cy
  FROM orders
),
bounds AS (
  SELECT MIN(cx) AS xmin, MAX(cx) AS xmax, MIN(cy) AS ymin, MAX(cy) AS ymax FROM base
),
binned AS (
  SELECT o_orderkey,
         CAST({_ZO_BX} AS BIGINT) AS bin_cust,
         CAST({_ZO_BY} AS BIGINT) AS bin_date
  FROM base, bounds
)
SELECT o_orderkey, bin_cust, bin_date,
       CAST({_interleave_expr("bin_cust", "bin_date", Z_BITS, "//")} AS BIGINT) AS zkey
FROM binned
"""


SPECS = [
    QuerySpec("layout_zorder", layout_zorder, LAYOUT_ZORDER_ORACLE),
]
