"""Batch-equivalent registrations of the streaming operators.

The driver's oracle harness runs batch SQL, so each streaming operator
registers its batch-equivalent plan here (same transformation code —
``windowed_event_counts`` / ``dedup_events_within_watermark`` degrade to
batch on a non-streaming frame). The actual incremental runs (checkpoint,
watermark, AvailableNow) are exercised in tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from snowflake_to_postgres_spark.operators.validation import PSI_BINS
from snowflake_to_postgres_spark.registry import QuerySpec
from snowflake_to_postgres_spark.sources import load_table


def st_windowed_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from snowflake_to_postgres_spark.streaming.pipeline import windowed_event_counts

    return windowed_event_counts(load_table(spark, sf_dir, "events"))


ST_WINDOWED_ORACLE = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type, COUNT(*) AS cnt,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS s_value
FROM events GROUP BY 1, 2
"""


def st_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from snowflake_to_postgres_spark.streaming.pipeline import (
        dedup_events_within_watermark,
    )

    deduped = dedup_events_within_watermark(load_table(spark, sf_dir, "events"))
    return deduped.groupBy("event_type").count().withColumnRenamed("count", "cnt")


ST_DEDUP_ORACLE = """
SELECT event_type, COUNT(*) AS cnt FROM (
  SELECT DISTINCT ON (event_id) event_id, event_type FROM events ORDER BY event_id
) GROUP BY event_type
"""


def st_enrich_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch equivalent of the stream-static enrichment join: events
    left-join the customer dim, rolled up per market segment (NULL
    segment = unmatched users). The streaming twin is exercised in
    tests/test_streaming.py::test_stream_static_enrichment."""
    from pyspark.sql import functions as F

    from snowflake_to_postgres_spark.streaming.pipeline import enrich_events

    enriched = enrich_events(
        load_table(spark, sf_dir, "events"), load_table(spark, sf_dir, "customer")
    )
    return enriched.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("decimal(38,2)").alias("s_value"),
    )


ST_ENRICH_ORACLE = """
SELECT c_mktsegment, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS s_value
FROM events LEFT JOIN customer ON user_id = c_custkey
GROUP BY c_mktsegment
"""


def st_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the native session-window aggregation. The oracle
    is the classic gaps-and-islands SQL (LAG → break flag → running sum
    → group), at full microsecond precision — Spark opens a new session
    when the gap is ≥ the duration (half-open [start, last+gap) window),
    so the break condition is ``>= gap`` in µs."""
    from snowflake_to_postgres_spark.streaming.pipeline import session_window_agg

    return session_window_agg(load_table(spark, sf_dir, "events"))


ST_SESSION_WINDOW_ORACLE = """
WITH g AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) >= 1800000000
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (
  SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM g)
SELECT user_id,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS s_value
FROM s GROUP BY user_id, sid
"""


def st_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-stream interval join (errors ⋈ same
    user's purchases in the preceding hour). The streaming execution —
    dual watermarks, bounded join state — is exercised in
    tests/test_streaming.py::test_interval_join_stream_equals_batch."""
    from snowflake_to_postgres_spark.streaming.pipeline import interval_join_events

    return interval_join_events(load_table(spark, sf_dir, "events"))


ST_INTERVAL_JOIN_ORACLE = """
SELECT e.event_id AS error_event_id, e.user_id,
       strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS error_ts,
       p.event_id AS purchase_event_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
       CAST(p.value AS DECIMAL(18,2)) AS p_value
FROM (SELECT * FROM events WHERE event_type = 'error') e
JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON e.user_id = p.user_id
 AND p.ts >= e.ts - INTERVAL 1 HOUR
 AND p.ts <= e.ts
"""


def st_interval_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the LEFT OUTER stream-stream interval join (every
    error, purchase context where present, NULLs where absent). The
    streaming execution — null-row emission gated on watermark passage,
    withheld tail at end-of-stream — is pinned in
    tests/test_streaming.py::test_interval_join_outer_stream_equals_batch."""
    from snowflake_to_postgres_spark.streaming.pipeline import (
        interval_join_events_outer,
    )

    return interval_join_events_outer(load_table(spark, sf_dir, "events"))


ST_INTERVAL_JOIN_OUTER_ORACLE = """
SELECT e.event_id AS error_event_id, e.user_id,
       strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS error_ts,
       p.event_id AS purchase_event_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
       CAST(p.value AS DECIMAL(18,2)) AS p_value
FROM (SELECT * FROM events WHERE event_type = 'error') e
LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON e.user_id = p.user_id
 AND p.ts >= e.ts - INTERVAL 1 HOUR
 AND p.ts <= e.ts
"""


def st_ingest_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of streaming incremental ingestion with dedup: the
    md5(event_id) < '8' half of events plays the already-ingested
    corpus; the feed is deduped against its key set and within itself,
    then rolled up per event type. The streaming execution (stream-
    static anti join + watermark dedup, AvailableNow) is exercised in
    tests/test_streaming.py::test_ingest_dedup_stream_equals_batch."""
    from pyspark.sql import functions as F

    from snowflake_to_postgres_spark.streaming.pipeline import (
        ingest_dedup_against_corpus,
    )

    events = load_table(spark, sf_dir, "events")
    ingested = events.filter(F.md5(F.col("event_id").cast("string")) < "8")
    accepted = ingest_dedup_against_corpus(events, ingested)
    return accepted.groupBy("event_type").agg(
        F.count("*").alias("cnt"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("decimal(38,2)").alias("s_value"),
    )


ST_INGEST_DEDUP_ORACLE = """
WITH fresh AS (
  SELECT * FROM events WHERE md5(CAST(event_id AS VARCHAR)) >= '8'
),
ded AS (
  SELECT DISTINCT ON (event_id) event_id, event_type, value FROM fresh ORDER BY event_id
)
SELECT event_type, COUNT(*) AS cnt,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS s_value
FROM ded GROUP BY event_type
"""


def st_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming CDC latest-state table: one row per
    user, the event with the greatest (ts, event_id). The streaming
    path — foreachBatch driving the partition-scoped MERGE sink with a
    version column — is exercised in
    tests/test_streaming.py::test_upsert_latest_stream_equals_batch."""
    from snowflake_to_postgres_spark.streaming.pipeline import latest_state

    return latest_state(load_table(spark, sf_dir, "events"))


ST_LATEST_STATE_ORACLE = """
SELECT user_id, event_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts,
       event_type AS last_type,
       CAST(value AS DECIMAL(18,2)) AS last_value
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


def st_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming SCD2 pipeline (round-9 verdict #6):
    the full-granularity TYPE-2 history of each user's event_type over
    the event log — a new version opens only where the value CHANGES
    under (ts, event_id) arrival order, valid_to closes at the next
    change, the live version stays open. The streaming path —
    foreachBatch folding operators/transfer.scd2_apply per micro-batch
    — is exercised in tests/test_round10_ops.py (batch-fold parity +
    restart idempotence + replay no-op); its end state agrees with this
    twin on every CURRENT version (intermediate versions legitimately
    collapse under batching — per-batch latest-wins is the documented
    CDC contract).

    Validity bounds emit as exact microsecond bigints (the
    st_lateness_audit discipline — no timestamp formatting in the
    hash). 100-TB shape: one shuffle on user_id, two windows over
    per-user history (bounded by each user's change count), nothing
    collected."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("us"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    changed = ev.withColumn("prev", F.lag("event_type").over(w)).filter(
        F.col("prev").isNull() | (F.col("prev") != F.col("event_type"))
    )
    w2 = Window.partitionBy("user_id").orderBy("us", "event_id")
    return (
        changed.select(
            "user_id",
            "event_type",
            F.col("us").alias("valid_from_us"),
            F.lead("us").over(w2).alias("valid_to_us"),
        )
        .withColumn("is_current", F.col("valid_to_us").isNull())
        .orderBy("user_id", "valid_from_us")
    )


ST_SCD2_ORACLE = """
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS us, event_id FROM events
),
changed AS (
  SELECT user_id, event_type, us, event_id FROM (
    SELECT user_id, event_type, us, event_id,
           LAG(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id)
             AS prev
    FROM ev
  ) WHERE prev IS NULL OR prev <> event_type
)
SELECT user_id, event_type,
       us AS valid_from_us,
       LEAD(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS valid_to_us,
       LEAD(us) OVER (PARTITION BY user_id ORDER BY us, event_id) IS NULL AS is_current
FROM changed
ORDER BY user_id, valid_from_us
"""


#: st_drift reference window: the event log's first week freezes the
#: PSI bins; every later day is scored against it.
ST_DRIFT_REF_DATE = "2024-01-08"
ST_DRIFT_COLS = ["value"]


def st_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming drift monitor (round-10 verdict #5):
    per-day PSI of the events `value` column against a FROZEN
    first-week reference — the per-micro-batch drift check a
    training-data pipeline runs on its ingest stream, degraded to batch
    on the same kernel (validation.psi_drift_vs_reference: bins freeze
    at the reference snapshot, later out-of-range values clamp to edge
    bins as drift mass). The real foreachBatch stream
    (streaming/pipeline.drift_stream) emits the SAME schema per
    micro-batch and is exercised in tests (batch parity + restart
    idempotence, the st_scd2 discipline).

    100-TB shape: one bounds pass over the bounded reference, one
    (day, bin) map-side-combinable aggregate over the stream side, psi
    fold over days×bins metadata rows."""
    from snowflake_to_postgres_spark.operators.validation import (
        psi_drift_vs_reference,
    )

    ev = load_table(spark, sf_dir, "events")
    split = F.lit(ST_DRIFT_REF_DATE).cast("date")
    ref = ev.filter(F.col("ts").cast("date") < split)
    cur = ev.filter(~(F.col("ts").cast("date") < split)).withColumn(
        "day", F.col("ts").cast("date")
    )
    return psi_drift_vs_reference(ref, cur, ST_DRIFT_COLS, "day")


ST_DRIFT_ORACLE = f"""
WITH ev AS (
  SELECT CAST(ts AS DATE) AS d, value AS x FROM events WHERE value IS NOT NULL
),
ref AS (SELECT x FROM ev WHERE d < DATE '{ST_DRIFT_REF_DATE}'),
bounds AS (SELECT MIN(x) AS mn, MAX(x) AS mx FROM ref),
refb AS (
  SELECT CASE WHEN mx = mn THEN 0
              ELSE CAST(GREATEST(0, LEAST({{bins1}},
                   floor((x - mn) / (mx - mn) * {{bins}}))) AS INT) END AS bin,
         COUNT(*) AS ca
  FROM ref, bounds GROUP BY 1
),
refmeta AS (SELECT SUM(ca) AS na, COUNT(*) AS ref_bins FROM refb),
cur AS (SELECT d, x FROM ev WHERE NOT (d < DATE '{ST_DRIFT_REF_DATE}')),
curb AS (
  SELECT d, CASE WHEN mx = mn THEN 0
                 ELSE CAST(GREATEST(0, LEAST({{bins1}},
                      floor((x - mn) / (mx - mn) * {{bins}}))) AS INT) END AS bin,
         COUNT(*) AS cb
  FROM cur, bounds GROUP BY 1, 2
),
curtot AS (SELECT d, SUM(cb) AS nb FROM curb GROUP BY d),
terms AS (
  SELECT curb.d, ca, cb, nb, na, ref_bins,
         CASE WHEN ca IS NOT NULL
              THEN CAST(floor((CAST(ca AS DOUBLE) / na - CAST(cb AS DOUBLE) / nb)
                     * ln((CAST(ca AS DOUBLE) / na) / (CAST(cb AS DOUBLE) / nb))
                     * 1000000.0 + 0.5) AS BIGINT)
              ELSE NULL END AS term_scaled
  FROM curb
  LEFT JOIN refb USING (bin)
  JOIN curtot USING (d)
  CROSS JOIN refmeta
)
SELECT d AS day, 'value' AS column_name,
       CAST(SUM(term_scaled) AS DOUBLE) / 1000000.0 AS psi,
       CAST(SUM(CASE WHEN term_scaled IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS bins_used,
       CAST(SUM(CASE WHEN ca IS NULL THEN 1 ELSE 0 END)
            + MAX(ref_bins)
            - SUM(CASE WHEN term_scaled IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS bins_dropped,
       CAST(MAX(na) AS BIGINT) AS n_ref,
       CAST(MAX(nb) AS BIGINT) AS n_cur
FROM terms
GROUP BY d
ORDER BY day, column_name
""".replace("{bins}", str(PSI_BINS)).replace("{bins1}", str(PSI_BINS - 1))


def st_orphan_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming referential monitor (round-11: the
    ref-check gate for data in motion): per event day, how many rows
    arrived whose ``user_id`` has no customer row — the FK audit a
    warehouse runs CONTINUOUSLY on its ingest stream rather than once
    after a transfer. The real foreachBatch stream
    (streaming/pipeline.orphan_audit_stream) emits the SAME counts per
    micro-batch via the shared kernel
    (validation.fk_orphan_counts), exercised in tests with batch
    parity, planted orphans, and restart idempotence (the st_scd2 /
    st_drift discipline).

    100-TB shape: one left join of the stream's (day, key) projection
    against the dimension's distinct key set (broadcast when the dim is
    broadcast-sized, key hash join otherwise) and one |days|-bounded
    fold."""
    from snowflake_to_postgres_spark.operators.validation import fk_orphan_counts

    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.col("ts").cast("date")
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_custkey").alias("k"))
        .distinct()
    )
    out = fk_orphan_counts(ev, "user_id", cust, "day")
    return (
        out.select(
            "day",
            F.col("n_rows").alias("n_events"),
            "n_orphan_rows",
            "n_null_key_rows",
            ((F.col("n_orphan_rows") == 0) & (F.col("n_null_key_rows") == 0)).alias(
                "ref_intact"
            ),
        )
        .orderBy("day")
    )


ST_ORPHAN_AUDIT_ORACLE = """
WITH ev AS (
  SELECT CAST(ts AS DATE) AS day, user_id AS k FROM events
),
marked AS (
  SELECT day, ev.k, hit FROM ev
  LEFT JOIN (SELECT DISTINCT c_custkey AS k, 1 AS hit FROM customer) p USING (k)
)
SELECT day,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN k IS NOT NULL AND hit IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_orphan_rows,
       CAST(SUM(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_key_rows,
       (SUM(CASE WHEN k IS NOT NULL AND hit IS NULL THEN 1 ELSE 0 END) = 0
        AND SUM(CASE WHEN k IS NULL THEN 1 ELSE 0 END) = 0) AS ref_intact
FROM marked
GROUP BY day
ORDER BY day
"""


SPECS = [
    QuerySpec("st_orphan_audit", st_orphan_audit, ST_ORPHAN_AUDIT_ORACLE),
    QuerySpec("st_drift", st_drift, ST_DRIFT_ORACLE),
    QuerySpec("st_windowed_agg", st_windowed_agg, ST_WINDOWED_ORACLE),
    QuerySpec("st_latest_state", st_latest_state, ST_LATEST_STATE_ORACLE),
    QuerySpec("st_dedup_events", st_dedup_events, ST_DEDUP_ORACLE),
    QuerySpec("st_enrich_rollup", st_enrich_rollup, ST_ENRICH_ORACLE),
    QuerySpec("st_session_window", st_session_window, ST_SESSION_WINDOW_ORACLE),
    QuerySpec("st_interval_join", st_interval_join, ST_INTERVAL_JOIN_ORACLE),
    QuerySpec(
        "st_interval_join_outer",
        st_interval_join_outer,
        ST_INTERVAL_JOIN_OUTER_ORACLE,
    ),
    QuerySpec("st_ingest_dedup", st_ingest_dedup, ST_INGEST_DEDUP_ORACLE),
    QuerySpec("st_scd2", st_scd2, ST_SCD2_ORACLE),
]


#: Watermark candidate audited by st_lateness_audit (seconds).
LATENESS_WATERMARK_SEC = 7200
_LATENESS_BUCKET = 4096  # arrival-order bucket width for the two-level prefix max


def st_lateness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark sizing from data: for every event, lateness = how far
    its event time sits behind the maximum event time already seen in
    ARRIVAL order (event_id) — the exact quantity a Structured
    Streaming watermark drops on. Per event type: events, how many a
    2-hour watermark would drop, and the worst lateness observed. Run
    BEFORE picking `withWatermark` instead of guessing; the streaming
    queries above consume the chosen bound.

    100-TB shape: the naive form is one GLOBAL ordered prefix-max —
    unbounded data through one task. This is the THREE-level
    decomposition instead (the x_concurrency_curve / dense_ids
    pattern, prefix-MAX this time, recursed once more per the round-9
    review): a running max within each arrival-order bucket, a
    running max over bucket maxima WITHIN each superbucket (window
    partitioned by superbucket — ≤4096 rows per task), and a global
    prefix-max over per-superbucket maxima only (rows/4096² — 6×10^4
    rows even at 10^12 events, genuinely bounded metadata). The carry
    join back to events is UNHINTED and keyed on ``bkt``, the same
    key the within-bucket window already shuffles on. The oracle
    replays the naive global window, so the value-hash gate itself
    proves the decomposition. All comparisons in exact microsecond
    bigints."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("us"),
    )
    ev = ev.withColumn("bkt", F.expr(f"event_id div {_LATENESS_BUCKET}"))
    within = Window.partitionBy("bkt").orderBy("event_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    bucket_max = ev.groupBy("bkt").agg(F.max("us").alias("bmax")).withColumn(
        "sbkt", F.expr(f"bkt div {_LATENESS_BUCKET}")
    )
    within_super = Window.partitionBy("sbkt").orderBy("bkt").rowsBetween(
        Window.unboundedPreceding, -1
    )
    super_max = bucket_max.groupBy("sbkt").agg(F.max("bmax").alias("smax"))
    super_carry = super_max.select(
        "sbkt",
        F.max("smax")
        .over(Window.orderBy("sbkt").rowsBetween(Window.unboundedPreceding, -1))
        .alias("scarry_us"),
    )
    carry = (
        bucket_max.withColumn("in_super_us", F.max("bmax").over(within_super))
        .join(super_carry, "sbkt")
        .select("bkt", F.greatest("in_super_us", "scarry_us").alias("carry_us"))
    )
    lateness = (
        ev.withColumn("run_us", F.max("us").over(within))
        .join(carry, "bkt")
        .withColumn("prior_us", F.greatest(F.coalesce("run_us", F.lit(None)), F.col("carry_us")))
        .withColumn(
            "late_us",
            F.greatest(F.lit(0), F.coalesce(F.col("prior_us") - F.col("us"), F.lit(0))),
        )
    )
    thr = LATENESS_WATERMARK_SEC * 1_000_000
    return (
        lateness.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.when(F.col("late_us") > thr, 1).otherwise(0))
            .cast("bigint")
            .alias("n_dropped_at_watermark"),
            F.expr(f"CAST(max(late_us) div 1000000 AS BIGINT)").alias(
                "max_lateness_sec"
            ),
        )
        .orderBy("event_type")
    )


ST_LATENESS_ORACLE = f"""
WITH ev AS (
  SELECT event_id, event_type, epoch_us(ts) AS us FROM events
),
l AS (
  SELECT event_type,
         GREATEST(0, COALESCE(MAX(us) OVER (ORDER BY event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) - us, 0)) AS late_us
  FROM ev
)
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN late_us > {LATENESS_WATERMARK_SEC * 1_000_000} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dropped_at_watermark,
       CAST(MAX(late_us) // 1000000 AS BIGINT) AS max_lateness_sec
FROM l
GROUP BY event_type
ORDER BY event_type
"""


SPECS.append(QuerySpec("st_lateness_audit", st_lateness_audit, ST_LATENESS_ORACLE))


def st_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming heavy-keys monitor (round-11 verdict
    #6 — the skew early-warning the drift/orphan/SCD2 observability set
    lacked): per event day, the HH_TOP heaviest ``user_id`` keys with
    exact count, CMS estimate (the a19 hash family, so the sketch
    replays in the oracle), integer parts-per-million share of the
    day's rows, and the never-undercounts guarantee bit. The number a
    100-TB ingest reads before deciding to salt a join or repartition —
    pair with diag_heavy_keys / the skew tooling. The real foreachBatch
    stream (streaming/pipeline.heavy_hitters_stream) emits the SAME
    schema per micro-batch via the shared kernel
    (analytics_ext.cms_heavy_hitters_by_group), exercised in tests with
    batch parity, planted skew, and restart idempotence (the st_scd2 /
    st_drift / st_orphan_audit discipline).

    100-TB shape: one map-side-combinable (day, key) pre-aggregation is
    the only key-domain-sized frame; sketch state is d·w cells per day;
    the probe hash-joins on (day, i, b); output is |days|·HH_TOP rows."""
    from snowflake_to_postgres_spark.operators.analytics_ext import (
        cms_heavy_hitters_by_group,
    )

    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.col("ts").cast("date")
    )
    out = cms_heavy_hitters_by_group(ev, "user_id", "day")
    return out.select(
        "day",
        "rank",
        F.col("v").alias("user_id"),
        "exact_cnt",
        "cms_estimate",
        "share_ppm",
        "never_undercounts",
    ).orderBy("day", "rank")


ST_HEAVY_HITTERS_ORACLE = """
WITH ev AS (
  SELECT CAST(ts AS DATE) AS day, user_id AS v FROM events
  WHERE user_id IS NOT NULL
),
per_v AS (SELECT day, v, COUNT(*) AS exact_cnt FROM ev GROUP BY 1, 2),
tot AS (SELECT day, SUM(exact_cnt) AS n_rows FROM per_v GROUP BY day),
cells AS (
  SELECT day, i,
         CAST('0x' || substr(md5(CAST(i AS VARCHAR) || '|' || CAST(v AS VARCHAR)), 1, 8)
              AS BIGINT) % {w} AS b,
         SUM(exact_cnt) AS c
  FROM per_v, unnest([{seeds}]) AS s(i)
  GROUP BY 1, 2, 3
),
cand AS (
  SELECT day, v, exact_cnt, rn FROM (
    SELECT day, v, exact_cnt,
           ROW_NUMBER() OVER (PARTITION BY day ORDER BY exact_cnt DESC, v) AS rn
    FROM per_v
  ) WHERE rn <= {top}
),
probes AS (
  SELECT day, v, exact_cnt, rn, i,
         CAST('0x' || substr(md5(CAST(i AS VARCHAR) || '|' || CAST(v AS VARCHAR)), 1, 8)
              AS BIGINT) % {w} AS b
  FROM cand, unnest([{seeds}]) AS s(i)
),
est AS (
  SELECT probes.day AS day, v, exact_cnt, rn, MIN(c) AS cms_estimate
  FROM probes JOIN cells
    ON cells.day = probes.day AND cells.i = probes.i AND cells.b = probes.b
  GROUP BY 1, 2, 3, 4
)
SELECT est.day,
       CAST(rn AS BIGINT) AS rank,
       v AS user_id,
       CAST(exact_cnt AS BIGINT) AS exact_cnt,
       CAST(cms_estimate AS BIGINT) AS cms_estimate,
       CAST((exact_cnt * 1000000) // n_rows AS BIGINT) AS share_ppm,
       cms_estimate >= exact_cnt AS never_undercounts
FROM est JOIN tot ON tot.day = est.day
ORDER BY 1, 2
"""


def _st_hh_oracle() -> str:
    from snowflake_to_postgres_spark.operators.analytics_ext import (
        _CMS_SEEDS_SQL,
        CMS_W,
        HH_TOP,
    )

    return (
        ST_HEAVY_HITTERS_ORACLE
        .replace("{w}", str(CMS_W))
        .replace("{seeds}", _CMS_SEEDS_SQL)
        .replace("{top}", str(HH_TOP))
    )


SPECS.append(QuerySpec("st_heavy_hitters", st_heavy_hitters, _st_hh_oracle()))


def st_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming cardinality monitor — the fifth leg
    of the observability set (volume = st_heavy_hitters, quality =
    st_drift, integrity = st_orphan_audit, history = st_scd2): per
    event day, the DETERMINISTIC-HLL distinct-user estimate (the a18
    register algebra, so the sketch replays in the oracle) next to the
    exact truth. The unique-visitors / key-cardinality panel every
    ingest dashboard carries, sketch-priced. foreachBatch twin:
    streaming/pipeline.cardinality_stream (same grouped kernel,
    restart-idempotent).

    100-TB shape: two map-side-combinable aggregates — (day, register)
    max then a |days|×256-bounded fold — plus the estimator as column
    expressions (no driver collect); the exact COUNT(DISTINCT) baseline
    is eval-time truth, sampled or dropped at real scale."""
    from snowflake_to_postgres_spark.operators.analytics_ext import (
        HLL_M,
        hll_estimate_cols,
        hll_fold_by_group,
    )

    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.col("ts").cast("date")
    )
    folded = hll_estimate_cols(hll_fold_by_group(ev, "user_id", "day"))
    exact = (
        ev.filter(F.col("user_id").isNotNull())
        .groupBy("day")
        .agg(F.count_distinct("user_id").alias("exact_distinct"))
    )
    return (
        folded.join(exact, "day")
        .select(
            "day",
            F.lit(HLL_M).cast("int").alias("m"),
            "v_zero",
            "s_scaled",
            "hll_estimate",
            F.col("exact_distinct").cast("bigint").alias("exact_distinct"),
        )
        .orderBy("day")
    )


def _st_cardinality_oracle() -> str:
    from snowflake_to_postgres_spark.operators.analytics_ext import (
        _HLL_SCALE,
        _HLL_WBITS,
        _HLL_WMOD,
        HLL_EST_GRID,
        HLL_M,
    )

    est_sql = f"""CASE
  WHEN ((0.7213 / (1.0 + 1.079 / 256.0)) * 256.0 * 256.0
        * CAST({_HLL_SCALE} AS DOUBLE) / CAST(s_scaled AS DOUBLE))
         <= {2.5 * HLL_M}
       AND v_zero > 0
  THEN floor({HLL_M} * ln({HLL_M} / CAST(v_zero AS DOUBLE))
             * {HLL_EST_GRID} + 0.5) / {HLL_EST_GRID}
  ELSE floor(((0.7213 / (1.0 + 1.079 / 256.0)) * 256.0 * 256.0
              * CAST({_HLL_SCALE} AS DOUBLE) / CAST(s_scaled AS DOUBLE))
             * {HLL_EST_GRID} + 0.5) / {HLL_EST_GRID}
END"""
    return f"""
WITH ev AS (
  SELECT CAST(ts AS DATE) AS day, user_id AS v FROM events
  WHERE user_id IS NOT NULL
),
h AS (
  SELECT day, CAST('0x' || substr(md5(CAST(v AS VARCHAR)), 1, 15) AS BIGINT) AS h
  FROM ev
),
rho AS (
  SELECT day, h // {_HLL_WMOD} AS j,
         CASE WHEN h % {_HLL_WMOD} = 0 THEN {_HLL_WBITS + 1}
              ELSE {_HLL_WBITS + 1} - length(bin(h % {_HLL_WMOD})) END AS r
  FROM h
),
regs AS (SELECT day, j, MAX(r) AS mj FROM rho GROUP BY day, j),
folded AS (
  SELECT day, COUNT(*) AS k_used,
         COALESCE(SUM(CAST(1 AS BIGINT) << CAST({_HLL_WBITS + 1} - mj AS INT)), 0) AS s_hit
  FROM regs GROUP BY day
),
scalars AS (
  SELECT day,
         CAST({HLL_M} - k_used AS BIGINT) AS v_zero,
         CAST(s_hit + ({HLL_M} - k_used) * {_HLL_SCALE} AS BIGINT) AS s_scaled
  FROM folded
),
ex AS (SELECT day, COUNT(DISTINCT v) AS exact_distinct FROM ev GROUP BY day)
SELECT scalars.day AS day,
       CAST({HLL_M} AS INT) AS m,
       v_zero, s_scaled,
       {est_sql} AS hll_estimate,
       CAST(exact_distinct AS BIGINT) AS exact_distinct
FROM scalars JOIN ex ON ex.day = scalars.day
ORDER BY 1
"""


SPECS.append(QuerySpec("st_cardinality", st_cardinality, _st_cardinality_oracle()))


def st_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming mixture monitor (round-12 verdict #7
    — the sixth leg of the observability set: volume = st_heavy_hitters,
    quality = st_drift, integrity = st_orphan_audit, history = st_scd2,
    cardinality = st_cardinality, MIX = this): per document source, the
    observed char share of the corpus next to the tx_mixture_plan target
    share, with the deviation in exact integer ppm. The panel a 100-TB
    ingest reads to see source-mix drift BEFORE the corpus is built —
    pairs with pipe_quota_sample (the enforcement side of the same
    targets). foreachBatch twin: streaming/pipeline.mixture_stream (same
    grouped kernel over frozen targets, restart-idempotent).

    100-TB shape: one map-side-combinable (source) aggregate; targets
    broadcast (catalog-sized source domain); all arithmetic integer ppm
    so both engines and every micro-batch replay it exactly."""
    from snowflake_to_postgres_spark.operators.pipeline_ext import (
        mixture_share_by_group,
        mixture_targets,
    )

    docs = load_table(spark, sf_dir, "documents")
    out = mixture_share_by_group(
        docs.withColumn("corpus_window", F.lit(0).cast("bigint")),
        "corpus_window",
        mixture_targets(docs),
    )
    return out.select(
        "source",
        "n_docs",
        "obs_chars",
        "obs_share_ppm",
        "target_share_ppm",
        "dev_ppm",
        "over_target",
    ).orderBy("source")


ST_MIXTURE_ORACLE = """
WITH per AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS obs_chars,
         CAST(1 + CAST(substr(source, 4) AS INT) % 3 AS BIGINT) AS weight
  FROM documents GROUP BY source),
tot AS (SELECT CAST(SUM(obs_chars) AS BIGINT) AS t FROM per),
sw AS (SELECT CAST(SUM(weight) AS BIGINT) AS s FROM per)
SELECT source, n_docs, obs_chars,
       CAST(obs_chars * 1000000 // NULLIF((SELECT t FROM tot), 0) AS BIGINT) AS obs_share_ppm,
       CAST(weight * 1000000 // (SELECT s FROM sw) AS BIGINT) AS target_share_ppm,
       CAST(obs_chars * 1000000 // NULLIF((SELECT t FROM tot), 0)
            - weight * 1000000 // (SELECT s FROM sw) AS BIGINT) AS dev_ppm,
       (obs_chars * 1000000 // NULLIF((SELECT t FROM tot), 0)
            - weight * 1000000 // (SELECT s FROM sw)) > 0 AS over_target
FROM per
ORDER BY source
"""


SPECS.append(QuerySpec("st_mixture", st_mixture, ST_MIXTURE_ORACLE))
