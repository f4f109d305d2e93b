"""Bucketed co-located join: zero Exchange in the join plan."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from snowflake_to_postgres_spark.sources import load_table
from snowflake_to_postgres_spark.sources.bucketed import (
    bucketed_pair_join,
    write_bucketed_table,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    write_bucketed_table(li, "b_lineitem", "l_orderkey", 8, sorted_by="l_orderkey")
    write_bucketed_table(orders, "b_orders", "o_orderkey", 8, sorted_by="o_orderkey")
    yield "b_lineitem", "b_orders"
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")


def test_bucketed_join_has_no_exchange(spark, sf_dir, bucketed_tables):
    lt, rt = bucketed_tables
    # disable auto-broadcast so the small fixture doesn't trivially
    # sidestep the shuffle question
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_pair_join(spark, lt, rt, "l_orderkey", "o_orderkey")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        # and the result is correct
        expected = (
            load_table(spark, sf_dir, "lineitem")
            .join(
                load_table(spark, sf_dir, "orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .count()
        )
        assert j.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_bucketed_groupby_has_no_exchange(spark, bucketed_tables):
    lt, _ = bucketed_tables
    agg = spark.table(lt).groupBy("l_orderkey").agg(F.count("*").alias("c"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_digest_index_probe_shuffles_only_the_feed(spark, sf_dir):
    """The persisted digest index must be read in place: the probe join
    plans with NO Exchange on the index subtree — only the feed side
    shuffles into the index's bucketing — and verdicts match a direct
    recompute."""
    from snowflake_to_postgres_spark.operators.dedup import (
        build_digest_index,
        probe_digest_index,
    )

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        tbl = build_digest_index(spark, sf_dir, "t_digest_idx", num_buckets=8)
        docs = load_table(spark, sf_dir, "documents")
        feed = docs.filter(F.col("doc_id") < 40).select(
            "doc_id", F.md5("text").alias("text_md5")
        )
        probed = probe_digest_index(spark, tbl, feed)
        plan = probed._jdf.queryExecution().executedPlan().toString()
        # exactly one Exchange: the feed repartitioning (the distinct on
        # the bucketed index and the join both reuse its bucketing)
        assert plan.count("Exchange") == 1, plan
        # every feed doc IS in the corpus here -> all dup_of_corpus
        rows = probed.collect()
        assert len(rows) == 40 and all(r["dup_of_corpus"] for r in rows)
        # a novel digest is not flagged
        novel = spark.createDataFrame(
            [(999999, "0" * 32)], "doc_id long, text_md5 string"
        )
        got = probe_digest_index(spark, tbl, novel).collect()
        assert len(got) == 1 and not got[0]["dup_of_corpus"]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
        spark.sql("DROP TABLE IF EXISTS t_digest_idx")
