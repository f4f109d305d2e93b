"""Scalar-function surface (SURVEY.md §2.6, F1-F14) as data queries.

The reference's dialect layer rewrites these Snowflake constructs to
Postgres SQL (view_procedure_translator.py); here each construct is a
native Spark expression, exercised over the fixture tables with a DuckDB
oracle. The *textual* rewrite engine (F15-F18) lives in
``plans/dialect.py``; these queries prove the runtime semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from snowflake_to_postgres_spark.operators.common import dec
from snowflake_to_postgres_spark.registry import QuerySpec
from snowflake_to_postgres_spark.sources import load_table


def f1_iff_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1: IFF(c, a, b) → CASE WHEN (view_procedure_translator.py:146-166);
    Spark's F.when is the native form."""
    orders = load_table(spark, sf_dir, "orders")
    bucket = F.when(F.col("o_totalprice") > 200000, F.lit("big")).otherwise(F.lit("small"))
    return orders.groupBy(bucket.alias("bucket")).agg(F.count("*").alias("cnt"))


F1_ORACLE = """
SELECT CASE WHEN o_totalprice > 200000 THEN 'big' ELSE 'small' END AS bucket,
       COUNT(*) AS cnt
FROM orders GROUP BY 1
"""


def f2_nvl_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2: NVL/IFNULL → COALESCE (view_procedure_translator.py:308-309).
    NULLIF manufactures NULLs (the fixtures have none), COALESCE fills."""
    li = load_table(spark, sf_dir, "lineitem")
    discounted = F.nullif(dec("l_discount"), F.lit("0.00").cast("decimal(18,2)"))
    return li.groupBy("l_returnflag").agg(
        F.count(discounted).alias("n_discounted"),
        F.sum(F.coalesce(discounted, F.lit("-1.00").cast("decimal(18,2)")))
        .cast("decimal(38,2)")
        .alias("s_disc_nvl"),
    )


F2_ORACLE = """
SELECT l_returnflag,
       COUNT(NULLIF(CAST(l_discount AS DECIMAL(18,2)), CAST('0.00' AS DECIMAL(18,2)))) AS n_discounted,
       CAST(SUM(COALESCE(NULLIF(CAST(l_discount AS DECIMAL(18,2)), CAST('0.00' AS DECIMAL(18,2))),
                         CAST('-1.00' AS DECIMAL(18,2)))) AS DECIMAL(38,2)) AS s_disc_nvl
FROM lineitem GROUP BY l_returnflag
"""


def f4_to_date_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4/F5: TO_DATE / TO_TIMESTAMP parsing — format a timestamp to an ISO
    string, parse it back (the reference's crude TO_DATE→TO_TIMESTAMP rewrite,
    view_procedure_translator.py:302,318-327, is replaced by real parsing)."""
    orders = load_table(spark, sf_dir, "orders")
    s = F.date_format("o_orderdate", "yyyy-MM-dd")
    return (
        orders.select(
            s.alias("d_str"),
            F.to_date(s, "yyyy-MM-dd").alias("d_parsed"),
            F.to_timestamp(s, "yyyy-MM-dd").cast("date").alias("ts_parsed_date"),
        )
        .groupBy("d_str", "d_parsed", "ts_parsed_date")
        .agg(F.count("*").alias("cnt"))
    )


F4_ORACLE = """
SELECT strftime(o_orderdate, '%Y-%m-%d') AS d_str,
       CAST(strptime(strftime(o_orderdate, '%Y-%m-%d'), '%Y-%m-%d') AS DATE) AS d_parsed,
       CAST(strptime(strftime(o_orderdate, '%Y-%m-%d'), '%Y-%m-%d') AS DATE) AS ts_parsed_date,
       COUNT(*) AS cnt
FROM orders GROUP BY 1, 2, 3
"""


def f6_date_trunc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6: DATE_TRUNC (view_procedure_translator.py:303) — per-month and
    per-quarter rollup of orders."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.trunc(F.col("o_orderdate").cast("date"), "month").alias("month_start"),
            F.trunc(F.col("o_orderdate").cast("date"), "quarter").alias("quarter_start"),
        )
        .agg(
            F.count("*").alias("cnt"),
            F.sum(dec("o_totalprice")).cast("decimal(38,2)").alias("s_total"),
        )
    )


F6_ORACLE = """
SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
       CAST(date_trunc('quarter', o_orderdate) AS DATE) AS quarter_start,
       COUNT(*) AS cnt,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS s_total
FROM orders GROUP BY 1, 2
"""


def f7_datediff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7: DATEDIFF(day, a, b) — the reference's rewrite is knowingly wrong
    (view_procedure_translator.py:304 'may need manual adjustment'); Spark's
    datediff gives Snowflake's day-diff semantics natively. Ship lag per
    order = days from order date to first ship date."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    first_ship = li.groupBy("l_orderkey").agg(
        F.min(F.col("l_shipdate").cast("date")).alias("first_ship_d")
    )
    j = orders.join(first_ship, orders.o_orderkey == first_ship.l_orderkey)
    lag_days = F.datediff(F.col("first_ship_d"), F.col("o_orderdate").cast("date"))
    return j.groupBy("o_orderpriority").agg(
        F.count("*").alias("cnt"),
        F.sum(lag_days).cast("bigint").alias("s_lag_days"),
        F.min(lag_days).cast("bigint").alias("min_lag_days"),
        F.max(lag_days).cast("bigint").alias("max_lag_days"),
    )


F7_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS cnt,
       CAST(SUM(datediff('day', CAST(o_orderdate AS DATE), first_ship_d)) AS BIGINT) AS s_lag_days,
       CAST(MIN(datediff('day', CAST(o_orderdate AS DATE), first_ship_d)) AS BIGINT) AS min_lag_days,
       CAST(MAX(datediff('day', CAST(o_orderdate AS DATE), first_ship_d)) AS BIGINT) AS max_lag_days
FROM orders JOIN (
  SELECT l_orderkey, MIN(CAST(l_shipdate AS DATE)) AS first_ship_d FROM lineitem GROUP BY 1
) f ON o_orderkey = l_orderkey
GROUP BY o_orderpriority
"""


def f8_concat_ws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8: CONCAT_WS (view_procedure_translator.py:307)."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select(
            F.concat_ws("|", "r_name", "n_name").alias("region_nation"),
            "n_nationkey",
        )
    )


F8_ORACLE = """
SELECT concat_ws('|', r_name, n_name) AS region_nation, n_nationkey
FROM nation JOIN region ON n_regionkey = r_regionkey
"""


def f9_split_to_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9: SPLIT_TO_TABLE → LATERAL UNNEST(STRING_TO_ARRAY(...))
    (view_procedure_translator.py:282-295) → Spark explode(split(...)) —
    the one table-function (UDTF-shaped) construct in the surface."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.select(F.explode(F.split("p_name", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


F9_ORACLE = """
SELECT word, COUNT(*) AS cnt
FROM (SELECT unnest(string_split(p_name, ' ')) AS word FROM part)
GROUP BY word
"""


def f10_lpad_rpad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10: LPAD/RPAD with a non-string first arg
    (view_procedure_translator.py:168-234's ::text wrapping is unneeded —
    we cast explicitly once)."""
    supplier = load_table(spark, sf_dir, "supplier")
    return supplier.select(
        F.lpad(F.col("s_suppkey").cast("string"), 10, "0").alias("padded_key"),
        F.rpad("s_name", 30, ".").alias("padded_name"),
    )


F10_ORACLE = """
SELECT lpad(CAST(s_suppkey AS VARCHAR), 10, '0') AS padded_key,
       rpad(s_name, 30, '.') AS padded_name
FROM supplier
"""


def f11_trim_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11: TRIM with stable alias (view_procedure_translator.py:329-338)."""
    customer = load_table(spark, sf_dir, "customer")
    return (
        customer.select(F.trim(F.col("c_mktsegment")).alias("c_mktsegment"))
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("cnt"))
    )


F11_ORACLE = """
SELECT trim(c_mktsegment) AS c_mktsegment, COUNT(*) AS cnt FROM customer GROUP BY 1
"""


def f12_casts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F12: ::VARCHAR / ::NUMBER cast surface
    (view_procedure_translator.py:310-312). NUMBER defaults to (38,0)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.col("o_totalprice").cast("decimal(38,0)").alias("price_number"),
        dec("o_totalprice").cast("decimal(38,4)").alias("price_numeric_38_4"),
    )


F12_ORACLE = """
SELECT CAST(o_orderkey AS VARCHAR) AS key_str,
       CAST(o_totalprice AS DECIMAL(38,0)) AS price_number,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(38,4)) AS price_numeric_38_4
FROM orders
"""


def f14_upper_lower(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F14: UPPER/LOWER case folding (data_transfer.py:529 uses UPPER() for
    identifier lookups; here as data functions)."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.select(
            F.upper("p_brand").alias("brand_upper"),
            F.lower("p_type").alias("type_lower"),
        )
        .groupBy("brand_upper", "type_lower")
        .agg(F.count("*").alias("cnt"))
    )


F14_ORACLE = """
SELECT upper(p_brand) AS brand_upper, lower(p_type) AS type_lower, COUNT(*) AS cnt
FROM part GROUP BY 1, 2
"""


def v1_variant_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT-as-JSON handling (SURVEY §1.3: VARIANT/OBJECT/ARRAY → JSON
    text + get_json_object on use). Extracts props.k from events."""
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return events.groupBy("event_type").agg(
        F.count(k).alias("n_k"),
        F.sum(k).cast("bigint").alias("s_k"),
        F.min(k).cast("bigint").alias("min_k"),
        F.max(k).cast("bigint").alias("max_k"),
    )


V1_ORACLE = """
SELECT event_type,
       COUNT(CAST(regexp_extract(props, '"k": (-?\\d+)', 1) AS BIGINT)) AS n_k,
       CAST(SUM(CAST(regexp_extract(props, '"k": (-?\\d+)', 1) AS BIGINT)) AS BIGINT) AS s_k,
       CAST(MIN(CAST(regexp_extract(props, '"k": (-?\\d+)', 1) AS BIGINT)) AS BIGINT) AS min_k,
       CAST(MAX(CAST(regexp_extract(props, '"k": (-?\\d+)', 1) AS BIGINT)) AS BIGINT) AS max_k
FROM events GROUP BY event_type
"""


def v3_variant_typed_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT on the TYPED path (Spark 4 ``VariantType``): props parses
    once into a binary variant (``try_parse_json`` — malformed rows
    yield NULL, Snowflake's lenient semantics) and fields extract with
    ``variant_get``, which reads the shredded encoding directly instead
    of re-tokenizing JSON text per access — the engine-native successor
    to v1's ``get_json_object`` string path (same aggregate, same
    oracle). Falls back to the string path on Spark builds without
    variant support, so the query surface is version-portable.

    100-TB shape: identical to v1 (one scan, one map-side-combined
    aggregate); the win is CPU per row when a document is probed for
    multiple fields — parse once, extract many."""
    events = load_table(spark, sf_dir, "events")
    if hasattr(F, "try_parse_json") and hasattr(F, "variant_get"):
        v = events.withColumn("_v", F.try_parse_json("props"))
        k = F.variant_get("_v", "$.k", "bigint")
    else:  # pragma: no cover — exercised only on Spark < 4.0
        v = events
        k = F.get_json_object("props", "$.k").cast("bigint")
    return v.groupBy("event_type").agg(
        F.count(k).alias("n_k"),
        F.sum(k).cast("bigint").alias("s_k"),
        F.min(k).cast("bigint").alias("min_k"),
        F.max(k).cast("bigint").alias("max_k"),
    )


def f3_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function bundle: substring, length, replace, position —
    the remaining scalar vocabulary of translated views."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.regexp_replace("p_type", " ", "_").alias("type_snake"),
        F.instr("p_type", "BRASS").cast("bigint").alias("brass_pos"),
    )


F3_ORACLE = """
SELECT p_partkey,
       substring(p_name, 1, 5) AS name_prefix,
       CAST(length(p_name) AS BIGINT) AS name_len,
       replace(p_type, ' ', '_') AS type_snake,
       CAST(strpos(p_type, 'BRASS') AS BIGINT) AS brass_pos
FROM part
"""


SPECS = [
    QuerySpec("f1_iff_case", f1_iff_case, F1_ORACLE),
    QuerySpec("f2_nvl_coalesce", f2_nvl_coalesce, F2_ORACLE),
    QuerySpec("f3_string_funcs", f3_string_funcs, F3_ORACLE),
    QuerySpec("f4_to_date_roundtrip", f4_to_date_roundtrip, F4_ORACLE),
    QuerySpec("f6_date_trunc", f6_date_trunc, F6_ORACLE),
    QuerySpec("f7_datediff", f7_datediff, F7_ORACLE),
    QuerySpec("f8_concat_ws", f8_concat_ws, F8_ORACLE),
    QuerySpec("f9_split_to_table", f9_split_to_table, F9_ORACLE),
    QuerySpec("f10_lpad_rpad", f10_lpad_rpad, F10_ORACLE),
    QuerySpec("f11_trim_alias", f11_trim_alias, F11_ORACLE),
    QuerySpec("f12_casts", f12_casts, F12_ORACLE),
    QuerySpec("f14_upper_lower", f14_upper_lower, F14_ORACLE),
    QuerySpec("v1_variant_json_extract", v1_variant_json_extract, V1_ORACLE),
    QuerySpec("v3_variant_typed_extract", v3_variant_typed_extract, V1_ORACLE),
]


_F20_SNOWFLAKE_DDL = """CREATE OR REPLACE VIEW "DB"."PUBLIC"."CUST_LATEST" AS
SELECT o_custkey,
       o_orderkey::VARCHAR AS key_str,
       IFF(o_totalprice > 200000, 'big', 'small') AS bucket,
       DATEDIFF(day, o_orderdate, '1998-01-01'::DATE) AS age_days,
       NVL(NULL, o_orderpriority) AS prio
FROM public.orders
QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey) = 1"""


def f20_translated_view_exec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end dialect-translation EXECUTION, value-hash-gated: a
    Snowflake-dialect view DDL (3-part name, IFF, ``::`` casts,
    Snowflake DATEDIFF argument order, NVL, QUALIFY) goes through the
    full F18 translator, the translated SQL runs on Spark, and the
    RESULT is compared against a hand-written ANSI oracle. The pytest
    suite already proves the translator's output parses; this row
    proves the translated semantics produce the same VALUES — the
    strongest form of translator parity, continuously checked."""
    from snowflake_to_postgres_spark.plans.dialect import translate_view
    from snowflake_to_postgres_spark.sources import register_views

    register_views(spark, sf_dir, ("orders",))
    tv = translate_view(_F20_SNOWFLAKE_DDL, home_schema="public")
    # temp views are unqualified; strip the home-schema prefix the
    # translator correctly added for a real catalog
    spark.sql(tv.spark_sql.replace("public.orders", "orders"))
    return spark.table(tv.name).select(
        "o_custkey",
        "key_str",
        "bucket",
        F.col("age_days").cast("bigint").alias("age_days"),
        "prio",
    )


F20_ORACLE = """
SELECT o_custkey,
       CAST(o_orderkey AS VARCHAR) AS key_str,
       CASE WHEN o_totalprice > 200000 THEN 'big' ELSE 'small' END AS bucket,
       CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS BIGINT) AS age_days,
       COALESCE(NULL, o_orderpriority) AS prio
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn = 1
"""


SPECS.append(QuerySpec("f20_translated_view_exec", f20_translated_view_exec, F20_ORACLE))
