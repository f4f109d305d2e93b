"""Breadth operators: pivot/unpivot, bag-semantics set ops, date
arithmetic, schema-full VARIANT parsing, fuzzy string matching.

Fills the remaining vocabulary a reference user could reach for that no
other module covers (SURVEY §2.4/§2.5 'floor' notes)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from snowflake_to_postgres_spark.operators.common import dec
from snowflake_to_postgres_spark.registry import QuerySpec
from snowflake_to_postgres_spark.sources import load_table

_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


def a9_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order counts by status × priority. Pinning the pivot values
    keeps the plan single-pass (no distinct-values pre-scan)."""
    orders = load_table(spark, sf_dir, "orders")
    piv = (
        orders.groupBy("o_orderstatus")
        .pivot("o_orderpriority", _PRIORITIES)
        .agg(F.count(F.lit(1)))
    )
    cols = [F.col("o_orderstatus")] + [
        F.coalesce(F.col(f"`{p}`"), F.lit(0)).cast("bigint").alias(f"p{i + 1}")
        for i, p in enumerate(_PRIORITIES)
    ]
    return piv.select(*cols)


A9_ORACLE = """
SELECT o_orderstatus,
       COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS p1,
       COUNT(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS p2,
       COUNT(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS p3,
       COUNT(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS p4,
       COUNT(*) FILTER (WHERE o_orderpriority = '5-LOW') AS p5
FROM orders GROUP BY o_orderstatus
"""


def a10_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): lineitem money columns to (measure, value) rows."""
    li = load_table(spark, sf_dir, "lineitem")
    narrow = li.select(
        "l_orderkey",
        "l_linenumber",
        dec("l_extendedprice").alias("extendedprice"),
        dec("l_discount").alias("discount"),
        dec("l_tax").alias("tax"),
    )
    melted = narrow.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["extendedprice", "discount", "tax"],
        "measure",
        "value",
    )
    return melted.groupBy("measure").agg(
        F.count("*").alias("cnt"),
        F.sum("value").cast("decimal(38,2)").alias("s_value"),
    )


A10_ORACLE = """
SELECT measure, COUNT(*) AS cnt, CAST(SUM(value) AS DECIMAL(38,2)) AS s_value
FROM (
  SELECT 'extendedprice' AS measure, CAST(l_extendedprice AS DECIMAL(18,2)) AS value FROM lineitem
  UNION ALL SELECT 'discount', CAST(l_discount AS DECIMAL(18,2)) FROM lineitem
  UNION ALL SELECT 'tax', CAST(l_tax AS DECIMAL(18,2)) FROM lineitem
)
GROUP BY measure
"""


def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics UNION ALL (keeps duplicates) — counted per key so
    the multiplicity is visible in the result."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.unionAll(s).groupBy("nationkey").agg(F.count("*").alias("cnt"))


SET_UNION_ALL_ORACLE = """
SELECT nationkey, COUNT(*) AS cnt FROM (
  SELECT c_nationkey AS nationkey FROM customer
  UNION ALL SELECT s_nationkey FROM supplier
) GROUP BY nationkey
"""


def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL bag semantics: each supplier occurrence cancels one
    customer occurrence of the same nationkey."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.exceptAll(s).groupBy("nationkey").agg(F.count("*").alias("cnt"))


SET_EXCEPT_ALL_ORACLE = """
SELECT nationkey, COUNT(*) AS cnt FROM (
  SELECT c_nationkey AS nationkey FROM customer
  EXCEPT ALL
  SELECT s_nationkey FROM supplier
) GROUP BY nationkey
"""


def f13_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic vocabulary: add days/months, month boundaries,
    extraction — on distinct order dates (small output)."""
    orders = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return (
        orders.select(d.alias("d")).distinct()
        .select(
            "d",
            F.date_add("d", 30).alias("plus_30d"),
            F.add_months("d", 2).alias("plus_2m"),
            F.last_day("d").alias("month_end"),
            F.trunc("d", "year").alias("year_start"),
            F.dayofweek("d").cast("bigint").alias("dow"),
            F.weekofyear("d").cast("bigint").alias("iso_week"),
            F.quarter("d").cast("bigint").alias("q"),
        )
    )


F13_ORACLE = """
SELECT d,
       CAST(d + INTERVAL 30 DAY AS DATE) AS plus_30d,
       CAST(d + INTERVAL 2 MONTH AS DATE) AS plus_2m,
       last_day(d) AS month_end,
       CAST(date_trunc('year', d) AS DATE) AS year_start,
       CAST(dayofweek(d) + 1 AS BIGINT) AS dow,
       CAST(weekofyear(d) AS BIGINT) AS iso_week,
       CAST(quarter(d) AS BIGINT) AS q
FROM (SELECT DISTINCT CAST(o_orderdate AS DATE) AS d FROM orders)
"""


def v2_variant_schema_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT with declared schema: from_json(props, 'k BIGINT') — the
    typed parse path (vs v1's path extraction), plus validity flags."""
    events = load_table(spark, sf_dir, "events")
    parsed = events.withColumn("j", F.from_json("props", "k BIGINT"))
    return parsed.groupBy("event_type").agg(
        F.count("j.k").alias("n_parsed"),
        F.sum("j.k").cast("bigint").alias("s_k"),
        F.count(F.when(F.col("j").isNull(), 1)).alias("n_invalid"),
    )


V2_ORACLE = """
SELECT event_type,
       COUNT(CAST(regexp_extract(props, '"k": (-?\\d+)', 1) AS BIGINT)) AS n_parsed,
       CAST(SUM(CAST(regexp_extract(props, '"k": (-?\\d+)', 1) AS BIGINT)) AS BIGINT) AS s_k,
       COUNT(CASE WHEN regexp_extract(props, '"k": (-?\\d+)', 1) = '' THEN 1 END) AS n_invalid
FROM events GROUP BY event_type
"""


#: Max edit distance for tx_fuzzy_levenshtein and its blocking scheme.
_FUZZY_D = 3
#: Number of signature segments (= _FUZZY_D + 1, pigeonhole).
_FUZZY_NSEG = _FUZZY_D + 1


def tx_fuzzy_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy matching: supplier-name pairs within edit distance ≤ 3 — the
    entity-resolution primitive, blocked PassJoin-style so the plan is an
    EQUI-join, never a cartesian product.

    Losslessness argument (PassJoin segment lemma, Li et al. 2011): split
    string x into D+1 = 4 contiguous segments. Any alignment with ≤ D
    edits leaves at least one segment untouched (pigeonhole), and that
    segment appears verbatim in y at its original start position shifted
    by at most D (net insertions−deletions before it). So emitting, per
    row, its 4 segments keyed by (segment_idx, own_length, text) on one
    side, and every substring y[p_i(L)+δ : +len_i(L)] for candidate
    source lengths L ∈ [len(y)−D, len(y)+D] and shifts |δ| ≤ D on the
    other, guarantees every true pair meets on ≥ 1 key. Candidates are
    then verified with a real ``levenshtein`` call. False positives are
    filtered; false negatives are impossible.

    100 TB shape: only (key, id, name) tuples shuffle — constant ≤ 4 keys
    per row on the segment side, ≤ (2D+1)²·(D+1) short keys on the probe
    side. Candidate volume is bounded by segment-bucket co-occurrence,
    not n²; the physical plan contains no CartesianProduct /
    BroadcastNestedLoopJoin node (asserted for every registered query in
    tests/test_plan_quality.py)."""
    d, ns = _FUZZY_D, _FUZZY_NSEG
    s = load_table(spark, sf_dir, "supplier").where(F.col("s_name").isNotNull())

    # Segment side: 4 signature segments of the row's own name.
    # Segment i of a length-L string spans [i*L div ns, (i+1)*L div ns).
    a = s.select(F.col("s_suppkey").alias("k1"), F.col("s_name").alias("n1"))
    seg_side = a.select(
        "k1",
        "n1",
        F.explode(
            F.expr(
                f"""transform(sequence(0, {ns - 1}), i -> struct(
                      i AS i,
                      length(n1) AS L,
                      substring(n1, i * length(n1) div {ns} + 1,
                                (i + 1) * length(n1) div {ns}
                                  - i * length(n1) div {ns}) AS seg))"""
            )
        ).alias("sk"),
    ).select("k1", "n1", "sk.i", "sk.L", "sk.seg")

    # Probe side: for every candidate partner length L within ±d and every
    # shift |δ| ≤ d, the substring where partner-segment i could land.
    b = s.select(F.col("s_suppkey").alias("k2"), F.col("s_name").alias("n2"))
    probe_side = b.select(
        "k2",
        "n2",
        F.explode(
            F.expr(
                f"""array_distinct(flatten(transform(
                      sequence(greatest(length(n2) - {d}, 0), length(n2) + {d}), L ->
                      flatten(transform(sequence(0, {ns - 1}), i ->
                        transform(
                          filter(sequence(-{d}, {d}), dd ->
                            i * L div {ns} + 1 + dd >= 1
                            AND i * L div {ns} + dd
                                + ((i + 1) * L div {ns} - i * L div {ns})
                                <= length(n2)),
                          dd -> struct(
                            i AS i,
                            L AS L,
                            substring(n2, i * L div {ns} + 1 + dd,
                                      (i + 1) * L div {ns}
                                        - i * L div {ns}) AS seg)))))))"""
            )
        ).alias("pk"),
    ).select("k2", "n2", "pk.i", "pk.L", "pk.seg")

    candidates = (
        seg_side.join(probe_side, ["i", "L", "seg"])
        .where(F.col("k1") < F.col("k2"))
        .select("k1", "k2", "n1", "n2")
        .distinct()
    )
    return (
        candidates.select(
            "k1",
            "k2",
            F.levenshtein("n1", "n2").cast("bigint").alias("edit_dist"),
        )
        .filter(F.col("edit_dist") <= d)
    )


TX_FUZZY_ORACLE = """
SELECT a.s_suppkey AS k1, b.s_suppkey AS k2,
       CAST(levenshtein(a.s_name, b.s_name) AS BIGINT) AS edit_dist
FROM supplier a JOIN supplier b ON a.s_suppkey < b.s_suppkey
WHERE levenshtein(a.s_name, b.s_name) <= 3
"""


SPECS = [
    QuerySpec("a9_pivot", a9_pivot, A9_ORACLE),
    QuerySpec("a10_unpivot", a10_unpivot, A10_ORACLE),
    QuerySpec("set_union_all", set_union_all, SET_UNION_ALL_ORACLE),
    QuerySpec("set_except_all", set_except_all, SET_EXCEPT_ALL_ORACLE),
    QuerySpec("f13_date_arithmetic", f13_date_arithmetic, F13_ORACLE),
    QuerySpec("v2_variant_schema_parse", v2_variant_schema_parse, V2_ORACLE),
    QuerySpec("tx_fuzzy_levenshtein", tx_fuzzy_levenshtein, TX_FUZZY_ORACLE),
]


def a11_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG/STRING_AGG): region → sorted
    nation list. Sorting inside the aggregate makes it deterministic."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations"),
            F.count("*").alias("n_nations"),
        )
    )


A11_ORACLE = """
SELECT r_name,
       string_agg(n_name, ',' ORDER BY n_name) AS nations,
       COUNT(*) AS n_nations
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def a12_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample stddev and Pearson correlation derived from EXACT decimal
    sums (Σx, Σx², Σxy) — the built-in stddev/corr aggregates stream
    float partials in engine-specific order and are not oracle-stable;
    the moment formulas on exact sums are."""
    li = load_table(spark, sf_dir, "lineitem")
    x = dec("l_quantity")
    y = dec("l_extendedprice")
    agg = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(x).cast("decimal(38,2)").alias("sx"),
        F.sum(y).cast("decimal(38,2)").alias("sy"),
        F.sum((x * x).cast("decimal(28,4)")).cast("decimal(38,4)").alias("sxx"),
        F.sum((y * y).cast("decimal(28,4)")).cast("decimal(38,4)").alias("syy"),
        F.sum((x * y).cast("decimal(28,4)")).cast("decimal(38,4)").alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    var_x = (n * sxx - sx * sx) / (n * (n - F.lit(1.0)))
    std_x = F.sqrt(var_x)
    corr = (n * sxy - sx * sy) / (
        F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    )
    # DECIMAL-rounded outputs: DuckDB's wide-decimal→double conversion can
    # differ from the JVM's by 1 ULP (same issue as similarity cosines)
    return agg.select(
        "l_returnflag",
        "n",
        std_x.cast("decimal(18,6)").alias("stddev_qty"),
        corr.cast("decimal(10,8)").alias("corr_qty_price"),
    )


A12_ORACLE = """
WITH m AS (
  SELECT l_returnflag, COUNT(*) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sy,
         CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(28,4))) AS DECIMAL(38,4)) AS sxx,
         CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(28,4))) AS DECIMAL(38,4)) AS syy,
         CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(28,4))) AS DECIMAL(38,4)) AS sxy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
  CAST(sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
       / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))) AS DECIMAL(18,6)) AS stddev_qty,
  CAST((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
    / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
       * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS DECIMAL(10,8)) AS corr_qty_price
FROM m
"""


SPECS.append(QuerySpec("a11_string_agg", a11_string_agg, A11_ORACLE))
SPECS.append(QuerySpec("a12_stats_moments", a12_stats_moments, A12_ORACLE))


def v4_quarantine_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming DLQ split, value-hash-gated: corrupt
    a deterministic 1-in-8 slice of props (prefix injection keyed on
    event_id), parse with the corrupt-record column, and report
    per-event-type routing counts — the monitoring query a quarantine
    pipeline alerts on. Cross-engine semantics pinned (round-6 ADVICE):
    "quarantined" = payload present but not a parseable JSON OBJECT.
    Spark parses to ``k STRING`` so a type-drifted-but-valid object
    (k as a string) stays clean, matching the oracle's json_valid +
    json_type='OBJECT'; NULL payloads are clean on both sides (Spark's
    PERMISSIVE from_json yields a NULL struct, the oracle handles NULL
    explicitly instead of letting json_valid(NULL) fall in neither
    bucket). Adversarial payload shapes (NULL, drifted k, arrays,
    scalars, and the literal document ``null`` — quarantined on BOTH
    sides: this Spark's from_json records a corrupt record for a root
    VALUE_NULL against a struct schema, and the oracle's
    json_type='NULL' != 'OBJECT') are parity-tested in
    tests/test_round7_ops.py."""
    events = load_table(spark, sf_dir, "events")
    corrupted = F.when(
        F.col("event_id") % 8 == 0,
        F.concat(F.lit("{corrupt::"), F.col("props")),
    ).otherwise(F.col("props"))
    parsed = events.select(
        "event_type",
        F.from_json(
            corrupted,
            "k STRING, _corrupt STRING",
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"},
        ).alias("_j"),
    )
    failed = F.col("_j._corrupt").isNotNull()
    return parsed.groupBy("event_type").agg(
        F.count("*").alias("n_rows"),
        F.sum(failed.cast("bigint")).alias("n_quarantined"),
        F.sum((~failed).cast("bigint")).alias("n_clean"),
    )


V4_QUARANTINE_ORACLE = """
WITH c AS (
  SELECT event_type,
         CASE WHEN event_id % 8 = 0 THEN '{corrupt::' || props ELSE props END AS p
  FROM events)
SELECT event_type,
       COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN p IS NOT NULL AND trim(p) != ''
                      AND COALESCE(json_type(TRY_CAST(p AS JSON)), '') != 'OBJECT'
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_quarantined,
       CAST(SUM(CASE WHEN p IS NULL OR trim(p) = ''
                       OR COALESCE(json_type(TRY_CAST(p AS JSON)), '') = 'OBJECT'
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_clean
FROM c GROUP BY event_type
"""


SPECS.append(QuerySpec("v4_quarantine_stats", v4_quarantine_stats, V4_QUARANTINE_ORACLE))
