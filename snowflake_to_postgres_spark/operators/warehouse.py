"""Warehouse-maintenance operators: slowly-changing-dimension (SCD
Type-2) history builds and MERGE INTO / upsert semantics.

The reference is a warehouse migration tool — the queries its users run
against the migrated schema are exactly these maintenance shapes (the
reference's own transfer loop is an overwrite-only special case of the
merge here, data_transfer.py's full-table copy). Spark has no MERGE on
plain parquet frames, so both operators are expressed as window/join
algebra — which is also how MERGE executes on a 1000-executor cluster:
one shuffle on the dimension key, no row-at-a-time driver loop.

The change feed is the orders table read as "customer c set attribute
o_orderpriority on date o_orderdate" — multiple same-day events resolve
to the highest order key (last write wins within the batch, the
standard CDC tie-break).

These are the READ-side analytics of the maintenance story; the
WRITE-side kernels live in operators/transfer.py (scd2_apply,
merge_upsert_partitioned, compact_partitions) behind the scd2 / merge /
compact CLI verbs, and the streaming twin in streaming/pipeline.py
(upsert_latest_stream) — tombstone parity between that pipeline and
x_cdc_apply is pinned in tests/test_round9_ops.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from snowflake_to_postgres_spark.registry import QuerySpec
from snowflake_to_postgres_spark.sources import load_table

#: MERGE batch split: orders strictly before this date build the target
#: dimension; orders on/after it are the incoming change batch.
MERGE_SPLIT_DATE = "1998-06-01"


def _change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(custkey, change_date, priority): one attribute event per
    customer-day — same-day collisions resolved by max order key."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey", "o_orderdate").orderBy(
        F.col("o_orderkey").desc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderdate").alias("change_date"),
            F.col("o_orderpriority").alias("priority"),
        )
    )


def x_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension build: collapse the per-day change feed into
    validity intervals [valid_from, valid_to), opening a new version
    only when the attribute VALUE changes (consecutive identical values
    merge into one row — the part naive interval builders get wrong)
    and leaving valid_to NULL on each key's current version.

    Three window passes over one shuffle on custkey: same-day tie-break
    (in :func:`_change_feed`), lag to find change points, lead for the
    closing date. 100-TB shape: everything partitions by the dimension
    key; per-key history is bounded (one row per change day), so no
    window sees unbounded data and nothing is collected."""
    feed = _change_feed(spark, sf_dir)
    w = Window.partitionBy("custkey").orderBy("change_date")
    changed = feed.withColumn("prev", F.lag("priority").over(w)).filter(
        F.col("prev").isNull() | (F.col("prev") != F.col("priority"))
    )
    return (
        changed.select(
            "custkey",
            "priority",
            F.col("change_date").alias("valid_from"),
            F.lead("change_date")
            .over(Window.partitionBy("custkey").orderBy("change_date"))
            .alias("valid_to"),
        )
        .withColumn("is_current", F.col("valid_to").isNull())
        .orderBy("custkey", "valid_from")
    )


X_SCD2_HISTORY_ORACLE = """
WITH feed AS (
  SELECT custkey, change_date, priority FROM (
    SELECT o_custkey AS custkey, o_orderdate AS change_date,
           o_orderpriority AS priority,
           ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate
                              ORDER BY o_orderkey DESC) AS rn
    FROM orders
  ) WHERE rn = 1
),
changed AS (
  SELECT custkey, change_date, priority FROM (
    SELECT custkey, change_date, priority,
           LAG(priority) OVER (PARTITION BY custkey ORDER BY change_date) AS prev
    FROM feed
  ) WHERE prev IS NULL OR prev <> priority
)
SELECT custkey, priority,
       change_date AS valid_from,
       LEAD(change_date) OVER (PARTITION BY custkey ORDER BY change_date)
         AS valid_to,
       LEAD(change_date) OVER (PARTITION BY custkey ORDER BY change_date)
         IS NULL AS is_current
FROM changed
ORDER BY custkey, valid_from
"""


def _latest_per_key(feed: DataFrame) -> DataFrame:
    """(custkey, priority): each key's last-write-wins current value."""
    w = Window.partitionBy("custkey").orderBy(F.col("change_date").desc())
    return (
        feed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("custkey", "priority")
    )


def x_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics on plain frames: the target dimension is the
    current snapshot from orders before MERGE_SPLIT_DATE; the source
    batch is the change feed on/after it, reduced last-write-wins. One
    full-outer join on the key classifies every row the way MERGE's
    WHEN clauses do — ``insert`` (source only), ``update`` (both,
    value changed), ``unchanged`` (both, same value), ``retain``
    (target only) — and emits the post-merge dimension with its
    audit trail.

    100-TB shape: a single shuffle join on the dimension key (AQE
    broadcasts the batch side when the batch is small — the common
    case); the MERGE never round-trips rows through the driver. This
    is the batch-mode twin of the streaming upsert (st_latest_state)."""
    feed = _change_feed(spark, sf_dir)
    split = F.lit(MERGE_SPLIT_DATE).cast("date")
    target = _latest_per_key(feed.filter(F.col("change_date") < split))
    batch = _latest_per_key(feed.filter(F.col("change_date") >= split))
    t = target.select(
        F.col("custkey"), F.col("priority").alias("old_priority")
    )
    s = batch.select(F.col("custkey"), F.col("priority").alias("new_priority"))
    merged = t.join(s, "custkey", "full_outer")
    action = (
        F.when(F.col("old_priority").isNull(), F.lit("insert"))
        .when(F.col("new_priority").isNull(), F.lit("retain"))
        .when(F.col("old_priority") != F.col("new_priority"), F.lit("update"))
        .otherwise(F.lit("unchanged"))
    )
    return merged.select(
        "custkey",
        action.alias("action"),
        "old_priority",
        "new_priority",
        F.coalesce(F.col("new_priority"), F.col("old_priority")).alias(
            "merged_priority"
        ),
    ).orderBy("custkey")


X_MERGE_UPSERT_ORACLE = f"""
WITH feed AS (
  SELECT custkey, change_date, priority FROM (
    SELECT o_custkey AS custkey, o_orderdate AS change_date,
           o_orderpriority AS priority,
           ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate
                              ORDER BY o_orderkey DESC) AS rn
    FROM orders
  ) WHERE rn = 1
),
target AS (
  SELECT custkey, priority AS old_priority FROM (
    SELECT custkey, priority,
           ROW_NUMBER() OVER (PARTITION BY custkey ORDER BY change_date DESC) AS rn
    FROM feed WHERE change_date < DATE '{MERGE_SPLIT_DATE}'
  ) WHERE rn = 1
),
batch AS (
  SELECT custkey, priority AS new_priority FROM (
    SELECT custkey, priority,
           ROW_NUMBER() OVER (PARTITION BY custkey ORDER BY change_date DESC) AS rn
    FROM feed WHERE change_date >= DATE '{MERGE_SPLIT_DATE}'
  ) WHERE rn = 1
)
SELECT custkey,
       CASE WHEN old_priority IS NULL THEN 'insert'
            WHEN new_priority IS NULL THEN 'retain'
            WHEN old_priority <> new_priority THEN 'update'
            ELSE 'unchanged' END AS action,
       old_priority,
       new_priority,
       COALESCE(new_priority, old_priority) AS merged_priority
FROM target FULL OUTER JOIN batch USING (custkey)
ORDER BY custkey
"""


SPECS = [
    QuerySpec("x_scd2_history", x_scd2_history, X_SCD2_HISTORY_ORACLE),
    QuerySpec("x_merge_upsert", x_merge_upsert, X_MERGE_UPSERT_ORACLE),
]


def x_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC log application with DELETE tombstones: the events stream
    read as a change log keyed by user_id, ordered by (ts, event_id) —
    'error' rows are tombstones, every other type upserts ``value``.
    Each key's final state classifies it live or deleted: the WHEN
    MATCHED THEN DELETE arm of MERGE, which x_merge_upsert
    (insert/update-only) does not exercise, and the tombstone handling
    st_latest_state (streaming latest-state, no deletes) leaves out.

    100-TB shape: one keyed window (last op per key) + one keyed count,
    joined on the key — a single shuffle column, no driver round-trips;
    the CDC log never sorts globally."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    last = ev.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    counts = ev.groupBy("user_id").agg(F.count("*").alias("n_ops"))
    deleted = F.col("event_type") == "error"
    return (
        last.join(counts, "user_id")
        .select(
            "user_id",
            deleted.alias("is_deleted"),
            F.col("event_type").alias("last_type"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
            F.when(~deleted, F.col("value")).alias("last_value"),
            "n_ops",
        )
        .orderBy("user_id")
    )


X_CDC_APPLY_ORACLE = """
WITH last AS (
  SELECT user_id, event_type, ts, value,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
),
counts AS (SELECT user_id, COUNT(*) AS n_ops FROM events GROUP BY user_id)
SELECT l.user_id,
       l.event_type = 'error' AS is_deleted,
       l.event_type AS last_type,
       strftime(l.ts, '%Y-%m-%d %H:%M:%S') AS last_ts,
       CASE WHEN l.event_type = 'error' THEN NULL
            ELSE CAST(l.value AS DECIMAL(18,2)) END AS last_value,
       n_ops
FROM last l JOIN counts USING (user_id)
WHERE rn = 1
ORDER BY l.user_id
"""


SPECS.append(QuerySpec("x_cdc_apply", x_cdc_apply, X_CDC_APPLY_ORACLE))


def xj_scd2_pointintime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (AS OF) dimension join — the query SCD2 history
    exists to serve: every order joins the x_scd2_history version whose
    validity interval [valid_from, valid_to) contains its order date,
    i.e. the attribute value that was CURRENT when the fact happened.
    The result is its own correctness proof: because the history is
    derived from these same orders, the version each order picks must
    carry that day's last-write priority — n_version_correct counts the
    orders whose own priority matches the picked version, and the only
    legitimate misses are same-day writes superseded by a higher order
    key (the feed's documented tie-break). Reading those two numbers
    side by side is the audit a warehouse runs after building any SCD2
    dimension.

    100-TB shape: one equi-join on the dimension key with the interval
    predicate evaluated inside it — per-key history is bounded (one
    row per change day), so the non-equi residual never explodes; the
    summary is a single map-side-combinable aggregate."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderdate").alias("d"),
        F.col("o_orderpriority").alias("p"),
    )
    h = x_scd2_history(spark, sf_dir)
    j = o.join(
        h,
        (o.custkey == h.custkey)
        & (h.valid_from <= o.d)
        & (h.valid_to.isNull() | (o.d < h.valid_to)),
        "left",
    )
    return j.agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.sum(F.when(h.priority.isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_matched"),
        F.sum(F.when(h.priority == F.col("p"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_version_correct"),
        F.sum(
            F.when(h.priority.isNotNull() & (h.priority != F.col("p")), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_same_day_overridden"),
    )


XJ_SCD2_PIT_ORACLE = f"""
WITH hist AS ({X_SCD2_HISTORY_ORACLE}
),
j AS (
  SELECT o.o_orderpriority AS p, h.priority AS hp
  FROM orders o
  LEFT JOIN hist h
    ON h.custkey = o.o_custkey
   AND h.valid_from <= o.o_orderdate
   AND (h.valid_to IS NULL OR o.o_orderdate < h.valid_to)
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CASE WHEN hp IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
       CAST(SUM(CASE WHEN hp = p THEN 1 ELSE 0 END) AS BIGINT) AS n_version_correct,
       CAST(SUM(CASE WHEN hp IS NOT NULL AND hp <> p THEN 1 ELSE 0 END) AS BIGINT)
         AS n_same_day_overridden
FROM j
"""


SPECS.append(
    QuerySpec("xj_scd2_pointintime", xj_scd2_pointintime, XJ_SCD2_PIT_ORACLE)
)


# ---------------------------------------------------------------------------
# Snapshot diff (round 11) — the third leg of the SCD2 read-side story:
# x_scd2_history BUILDS the dimension, xj_scd2_pointintime reads it AS OF
# one instant, this diffs it between TWO instants ("what changed between
# the Jan-97 and Jan-00 snapshots?") — the audit a warehouse runs after a
# backfill or before certifying a historical report.
# ---------------------------------------------------------------------------

SNAP_T1 = "1997-01-01"
SNAP_T2 = "2000-01-01"
SNAP_NEW = "<NEW>"       # key absent from the earlier snapshot


def x_scd2_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transition matrix between the SNAP_T1 and SNAP_T2 snapshots of
    the SCD2 dimension: per (old_priority, new_priority) pair, how many
    keys moved — new keys fold under old_priority='<NEW>'. Keys first
    seen after SNAP_T2 are in neither snapshot and drop out; SCD2 keys
    never disappear (valid_to only closes onto a successor version), so
    the matrix is the complete story of the interval.

    100-TB shape (round-11 verdict #4 — the window-based history build
    was the rehearsal's worst 10× grower at 1.7×): the as-of value at a
    snapshot instant is an ARGMAX over the raw change events — the
    latest (change_date, orderkey)-ordered priority at or before the
    instant — so the whole audit is ONE map-side-combinable hash
    aggregate per key computing both snapshots at once (max_by with a
    NULL ordering key skips rows after the instant), then the bounded
    |values|² matrix fold. No window sort, no history materialization,
    no per-snapshot rebuild, no full-outer join. The DuckDB oracle
    keeps the interval-algebra spec (build history, filter both
    snapshots, full-outer diff) so the argmax plan is proven equivalent
    on values, not just asserted."""
    o = load_table(spark, sf_dir, "orders")

    def as_of(d: str):
        # same-day ties resolve by max orderkey — the _change_feed rule
        ordkey = F.when(
            F.col("o_orderdate") <= F.lit(d),
            F.struct(F.col("o_orderdate"), F.col("o_orderkey")),
        )
        return F.max_by(F.col("o_orderpriority"), ordkey)

    per_key = (
        o.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(as_of(SNAP_T1).alias("p1"), as_of(SNAP_T2).alias("p2"))
        # in neither snapshot (first order after SNAP_T2) -> drops out;
        # p1 set implies p2 set since SNAP_T1 < SNAP_T2
        .filter(F.col("p2").isNotNull())
    )
    return (
        per_key.groupBy(
            F.coalesce(F.col("p1"), F.lit(SNAP_NEW)).alias("old_priority"),
            F.col("p2").alias("new_priority"),
        )
        .agg(
            F.count("*").cast("bigint").alias("n_keys"),
            F.sum(
                F.when(F.col("p1").isNull() | (F.col("p1") != F.col("p2")), 1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("n_changed"),
        )
        .orderBy("old_priority", "new_priority")
    )


X_SCD2_SNAPSHOT_DIFF_ORACLE = f"""
WITH hist AS ({X_SCD2_HISTORY_ORACLE}
),
s1 AS (
  SELECT custkey, priority AS p1 FROM hist
  WHERE valid_from <= DATE '{SNAP_T1}'
    AND (valid_to IS NULL OR DATE '{SNAP_T1}' < valid_to)
),
s2 AS (
  SELECT custkey, priority AS p2 FROM hist
  WHERE valid_from <= DATE '{SNAP_T2}'
    AND (valid_to IS NULL OR DATE '{SNAP_T2}' < valid_to)
)
SELECT COALESCE(p1, '{SNAP_NEW}') AS old_priority,
       p2 AS new_priority,
       CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(CASE WHEN p1 IS NULL OR p1 <> p2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_changed
FROM s1 FULL OUTER JOIN s2 USING (custkey)
GROUP BY 1, 2
ORDER BY old_priority, new_priority
"""

SPECS.append(
    QuerySpec("x_scd2_snapshot_diff", x_scd2_snapshot_diff, X_SCD2_SNAPSHOT_DIFF_ORACLE)
)
