"""Temporal join operators Spark lacks natively: as-of join and range
(band) join, expressed as compositions of built-in operators (the
strategy the driver north star prescribes: composition first, Pandas
UDF only when semantics can't be expressed).

* **As-of join** — "for each left row, the latest right row at or before
  it" — composed as union → one window pass with `last(..., ignorenulls)`
  carrying the right side forward. One shuffle on (key), no range
  explosion; state per key is O(1). The DuckDB oracle uses its *native*
  ASOF JOIN, so the composition is checked against a first-class
  implementation.
* **Range/band join** — value-to-interval joins. The naive plan is a
  BroadcastNestedLoopJoin; this module never emits one. Aligned
  fixed-width bands reduce to arithmetic band-id derivation + a hash
  equi-join (`xj_range_join`); arbitrary intervals bucket to fixed
  widths, equi-join on bucket id, and refine with the exact predicate
  (`range_join_bucketed`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from snowflake_to_postgres_spark.operators.common import dec
from snowflake_to_postgres_spark.registry import QuerySpec
from snowflake_to_postgres_spark.sources import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_values: list[str],
    direction: str = "backward",
    tolerance_sec: float | None = None,
) -> DataFrame:
    """Generic as-of join (pandas ``merge_asof`` surface, composed from
    built-ins — one shuffle on the key, O(1) window state, no range
    explosion at any scale):

    * ``backward`` (default): greatest ``right_ts`` ≤ ``left_ts``
      (DuckDB/kdb ASOF semantics). Ties match (≥).
    * ``forward``: smallest ``right_ts`` ≥ ``left_ts``. Ties match.
    * ``nearest``: whichever of the two is closer in time; ties prefer
      backward (pandas' rule). Two carries over the SAME exchange —
      Catalyst reuses the partition shuffle, only the in-partition sort
      differs.
    * ``tolerance_sec``: matches farther than this are nulled out (the
      row survives — left-join semantics — its carried values don't).

    Output columns are exactly the left columns plus ``right_values``.
    ``tolerance_sec`` and ``nearest`` need the matched ``right_ts``
    itself; if the caller didn't list it in ``right_values`` it is
    carried internally and dropped from the result (otherwise the
    tolerance filter would read the union's leftover all-null right_ts
    column and silently null every match).
    """
    _appended_rts = False
    if right_ts not in right_values:
        right_values = [*right_values, right_ts]
        _appended_rts = True
    # only the key, the timestamp, and the requested values cross the
    # union — any other right-side column would survive as an all-null
    # phantom in the output
    right = right.select(*dict.fromkeys([key, right_ts, *right_values]))
    if direction == "nearest":
        b = asof_join(
            left, right, key, left_ts, right_ts, right_values, "backward", tolerance_sec
        )
        bb = b.select(
            "*",
            *[F.col(v).alias(f"_b_{v}") for v in right_values],
        ).drop(*right_values)
        f = asof_join(
            bb, right, key, left_ts, right_ts, right_values, "forward", tolerance_sec
        )
        b_delta = F.col(left_ts).cast("double") - F.col(f"_b_{right_ts}").cast("double")
        f_delta = F.col(right_ts).cast("double") - F.col(left_ts).cast("double")
        prefer_b = F.col(f"_b_{right_ts}").isNotNull() & (
            F.col(right_ts).isNull() | (b_delta <= f_delta)
        )
        out = f.select(
            "*",
            *[
                F.when(prefer_b, F.col(f"_b_{v}")).otherwise(F.col(v)).alias(f"_n_{v}")
                for v in right_values
            ],
        ).drop(*right_values, *[f"_b_{v}" for v in right_values])
        for v in right_values:
            out = out.withColumnRenamed(f"_n_{v}", v)
        return out.drop(right_ts) if _appended_rts else out

    backward = direction == "backward"
    # side ordering puts the right row on the matching side of the left
    # row at EQUAL timestamps, so ties always match
    l_tagged = left.withColumn("_side", F.lit(1 if backward else 0)).withColumn(
        "_ts", F.col(left_ts)
    )
    r_tagged = right.withColumn("_side", F.lit(0 if backward else 1)).withColumn(
        "_ts", F.col(right_ts)
    )
    cols = set(l_tagged.columns) | set(r_tagged.columns)
    l_full = l_tagged.select(
        *[c if c in l_tagged.columns else F.lit(None).alias(c) for c in cols]
    )
    r_full = r_tagged.select(
        *[c if c in r_tagged.columns else F.lit(None).alias(c) for c in cols]
    )
    u = l_full.unionByName(r_full)
    if backward:
        w = (
            Window.partitionBy(key)
            .orderBy("_ts", "_side")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carry = lambda v: F.last(v, ignorenulls=True).over(w)  # noqa: E731
    else:
        w = (
            Window.partitionBy(key)
            .orderBy("_ts", "_side")
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        carry = lambda v: F.first(v, ignorenulls=True).over(w)  # noqa: E731
    carried = u.select(
        "*", *[carry(v).alias(f"_asof_{v}") for v in right_values]
    )
    out = carried.filter(F.col("_side") == F.lit(1 if backward else 0)).drop(
        "_side", "_ts", *right_values
    )
    for v in right_values:
        out = out.withColumnRenamed(f"_asof_{v}", v)
    if tolerance_sec is not None:
        delta = (
            (F.col(left_ts).cast("double") - F.col(right_ts).cast("double"))
            if backward
            else (F.col(right_ts).cast("double") - F.col(left_ts).cast("double"))
        )
        in_tol = F.col(right_ts).isNotNull() & (delta <= F.lit(float(tolerance_sec)))
        out = out.select(
            *[c for c in out.columns if c not in right_values],
            *[F.when(in_tol, F.col(v)).alias(v) for v in right_values],
        )
    return out.drop(right_ts) if _appended_rts else out


def xj_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every 'error' event: the same user's most recent 'purchase'
    at or before it (classic point-in-time enrichment)."""
    events = load_table(spark, sf_dir, "events")
    errors = events.filter(F.col("event_type") == "error").select(
        "user_id", F.col("event_id").alias("error_event_id"), F.col("ts").alias("e_ts")
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("p_ts"),
        dec("value").alias("p_value"),
    )
    j = asof_join(errors, purchases, "user_id", "e_ts", "p_ts", ["p_ts", "p_value"])
    return j.select(
        "error_event_id",
        "user_id",
        F.date_format("e_ts", "yyyy-MM-dd HH:mm:ss").alias("error_ts"),
        F.date_format("p_ts", "yyyy-MM-dd HH:mm:ss").alias("last_purchase_ts"),
        "p_value",
    )


XJ_ASOF_ORACLE = """
SELECT e.event_id AS error_event_id, e.user_id,
       strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS error_ts,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS last_purchase_ts,
       p.p_value
FROM (SELECT user_id, event_id, ts FROM events WHERE event_type = 'error') e
ASOF LEFT JOIN (
  SELECT user_id, ts, CAST(value AS DECIMAL(18,2)) AS p_value
  FROM events WHERE event_type = 'purchase'
) p ON e.user_id = p.user_id AND e.ts >= p.ts
"""


def xj_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of with tolerance: for every 'error' event, the same
    user's NEXT purchase within 7 days (the recovery-window question —
    did the user come back?). Exercises direction='forward' +
    tolerance_sec on the composed operator; the oracle is an
    independent formulation (inequality join + row_number, DuckDB
    IEJoin) rather than a restatement of the window composition."""
    events = load_table(spark, sf_dir, "events")
    errors = events.filter(F.col("event_type") == "error").select(
        "user_id", F.col("event_id").alias("error_event_id"), F.col("ts").alias("e_ts")
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("p_ts"),
        dec("value").alias("p_value"),
    )
    j = asof_join(
        errors,
        purchases,
        "user_id",
        "e_ts",
        "p_ts",
        ["p_ts", "p_value"],
        direction="forward",
        tolerance_sec=7 * 86400,
    )
    return j.select(
        "error_event_id",
        "user_id",
        F.date_format("e_ts", "yyyy-MM-dd HH:mm:ss").alias("error_ts"),
        F.date_format("p_ts", "yyyy-MM-dd HH:mm:ss").alias("next_purchase_ts"),
        "p_value",
    )


XJ_ASOF_FORWARD_ORACLE = """
WITH e AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'error'),
p AS (
  SELECT user_id, ts, CAST(value AS DECIMAL(18,2)) AS p_value
  FROM events WHERE event_type = 'purchase'
),
cand AS (
  SELECT e.event_id, p.ts AS p_ts, p.p_value,
         ROW_NUMBER() OVER (PARTITION BY e.event_id ORDER BY p.ts) AS rn
  FROM e JOIN p
    ON e.user_id = p.user_id
   AND p.ts >= e.ts
   AND p.ts <= e.ts + INTERVAL 7 DAY
)
SELECT e.event_id AS error_event_id, e.user_id,
       strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS error_ts,
       strftime(c.p_ts, '%Y-%m-%d %H:%M:%S') AS next_purchase_ts,
       c.p_value
FROM e LEFT JOIN (SELECT * FROM cand WHERE rn = 1) c ON c.event_id = e.event_id
"""


_BAND_WIDTH = 20000
_N_BANDS = 6  # covers l_extendedprice ≤ 120k


def _bands(spark: SparkSession) -> DataFrame:
    return spark.range(_N_BANDS).select(
        F.col("id").alias("band_id"),
        (F.col("id") * _BAND_WIDTH).cast("double").alias("lo"),
        ((F.col("id") + 1) * _BAND_WIDTH).cast("double").alias("hi"),
    )


def xj_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-to-interval (band) join: lineitem prices into half-open
    price bands, counted per band. The bands are fixed-width and
    aligned, so the band id is *computable* — derive it arithmetically
    and equi-join the tiny band table to attach (lo, hi). That turns
    the naive BroadcastNestedLoopJoin into a BroadcastHashJoin; the
    half-open semantics (>= lo AND < hi) are exactly ``floor(x / w)``,
    and the inner join discards out-of-range values just like the range
    predicate did. For arbitrary non-aligned intervals, the same
    rewrite explodes each interval to the fixed buckets it overlaps and
    refines after the equi-join (see :func:`range_join_bucketed`)."""
    li = load_table(spark, sf_dir, "lineitem")
    bands = _bands(spark)
    banded = li.withColumn(
        "band_id",
        F.floor(F.col("l_extendedprice") / F.lit(_BAND_WIDTH)).cast("bigint"),
    )
    j = banded.join(F.broadcast(bands), "band_id")
    return j.groupBy("band_id", "lo", "hi").agg(
        F.count("*").alias("cnt"),
        F.sum(dec("l_extendedprice")).cast("decimal(38,2)").alias("s_price"),
    )


XJ_RANGE_ORACLE = f"""
WITH bands AS (
  SELECT i AS band_id, CAST(i * {_BAND_WIDTH} AS DOUBLE) AS lo,
         CAST((i + 1) * {_BAND_WIDTH} AS DOUBLE) AS hi
  FROM unnest(generate_series(0, {_N_BANDS - 1})) AS g(i)
)
SELECT band_id, lo, hi, COUNT(*) AS cnt,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS s_price
FROM lineitem JOIN bands
  ON l_extendedprice >= lo AND l_extendedprice < hi
GROUP BY band_id, lo, hi
"""


def range_join_bucketed(values: DataFrame, value_col: str, bucket_width: int) -> DataFrame:
    """Scale path for fixed-width band joins: derive the band
    arithmetically — zero join at all. For arbitrary (non-aligned)
    intervals the same idea becomes: explode each interval to the
    buckets it overlaps, equi-join on bucket id, refine with the exact
    predicate — turning a nested-loop into a hash join."""
    return values.withColumn(
        "band_id", F.floor(F.col(value_col) / F.lit(bucket_width)).cast("bigint")
    )


SPECS = [
    QuerySpec("xj_asof_join", xj_asof_join, XJ_ASOF_ORACLE),
    QuerySpec("xj_asof_forward", xj_asof_forward, XJ_ASOF_FORWARD_ORACLE),
    QuerySpec("xj_range_join", xj_range_join, XJ_RANGE_ORACLE),
]
