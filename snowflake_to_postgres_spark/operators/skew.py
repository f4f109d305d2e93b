"""Skew mitigation: salted aggregation and salted join.

AQE's skew-join handling (enabled in session.py) covers sort-merge joins
at runtime, but two patterns still need explicit salting at 100 TB:

* **Skewed groupBy** — one hot group key (a viral document hash, a
  default date) lands an entire reduce partition on one task. Two-phase
  salted aggregation splits each key into SALT_BUCKETS partial groups,
  aggregates, then merges — map-side cost unchanged, reduce fanout ×salt.
* **Skewed broadcast-ineligible join** — when the big side's join key is
  skewed and the other side is mid-sized (too big to broadcast), salt the
  skewed side with a random bucket and explode the other side across all
  buckets.

Both are algebraic rewrites that preserve results exactly — asserted in
tests against the unsalted plans. Salting uses a *deterministic* bucket
(hash of a secondary column, not rand()) so results stay reproducible."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_BUCKETS = 16


def _salt(secondary: str | Column, buckets: int) -> Column:
    c = F.col(secondary) if isinstance(secondary, str) else secondary
    return F.pmod(F.hash(c), F.lit(buckets)).alias("_salt")


def salted_agg(
    df: DataFrame,
    group_col: str,
    salt_source: str,
    agg_exprs: dict[str, Column],
    buckets: int = SALT_BUCKETS,
) -> DataFrame:
    """Two-phase aggregation: groupBy(key, salt) → partials, then
    groupBy(key) → merge. ``agg_exprs`` maps output name → a *summable*
    aggregate over input columns (counts/sums; min/max also merge)."""
    partial = (
        df.withColumn("_salt", _salt(salt_source, buckets))
        .groupBy(group_col, "_salt")
        .agg(*[expr.alias(name) for name, expr in agg_exprs.items()])
    )
    merged = partial.groupBy(group_col).agg(
        *[F.sum(name).alias(name) for name in agg_exprs]
    )
    return merged


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    key: str,
    salt_source: str,
    buckets: int = SALT_BUCKETS,
) -> DataFrame:
    """Inner equi-join with the skewed side salted and the other side
    exploded across all salt buckets: the join key becomes (key, salt),
    spreading each hot key over ``buckets`` tasks."""
    s = skewed.withColumn("_salt", _salt(salt_source, buckets))
    o = other.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    return s.join(o, [key, "_salt"]).drop("_salt")
