"""Round-8 pins: regression tests for this round's ADVICE fixes and
verdict items (Hilbert overflow guard, decimal scale-shrink warning,
bucketed/converged PageRank twins, gridded dense top-k oracle)."""

from __future__ import annotations

import warnings

import pytest
from pyspark.sql import functions as F


def test_hilbert_key_rejects_bits_over_31(spark):
    """Round-7 ADVICE: the fold fallback removed the LUT cap but left
    hilbert_key unbounded — at bits >= 32 the key reaches 4^bits - 1 >
    2^63 - 1 and silently wraps the bigint under non-ANSI Spark. The
    guard must fire BEFORE any stats pass or fold construction."""
    from snowflake_to_postgres_spark.operators.layout import hilbert_key

    df = spark.createDataFrame([(1, 2, 3)], "id bigint, cx bigint, cy bigint")
    with pytest.raises(ValueError, match="Hilbert key"):
        hilbert_key(df, "cx", "cy", bits=32)
    # bits=31 stays accepted (fold path, no driver LUT, no overflow)
    keyed = hilbert_key(df, "cx", "cy", bits=31)
    assert "_hkey" in keyed.columns


def test_widest_decimal_scale_shrink_warns():
    """Round-7 ADVICE: preserving integral capacity by shrinking scale
    rounds the higher-scale generation's values at read — that loss must
    be visible, not silent."""
    from pyspark.sql import types as T

    from snowflake_to_postgres_spark.sources.files import _widest

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = _widest(T.DecimalType(38, 0), T.DecimalType(10, 9))
    assert out == T.DecimalType(38, 0)
    assert any("scale" in str(x.message) for x in w), [str(x.message) for x in w]

    # the non-shrinking path stays silent
    with warnings.catch_warnings(record=True) as w2:
        warnings.simplefilter("always")
        out2 = _widest(T.DecimalType(20, 2), T.DecimalType(10, 4))
    assert out2 == T.DecimalType(22, 4)
    assert not w2


def test_sim_ann_index_search_registered_matches_in_query(spark, sf_dir):
    """The registered materialized-index search must reproduce the
    in-query sim_ivf_pq_topk row for row, reuse the session fixture on a
    second call (write-once), and keep the cell partition filter."""
    from snowflake_to_postgres_spark.operators.similarity import (
        _ANN_INDEX_FIXTURES,
        sim_ann_index_search,
        sim_ivf_pq_topk,
    )

    got = sorted(tuple(r) for r in sim_ann_index_search(spark, sf_dir).collect())
    exp = sorted(tuple(r) for r in sim_ivf_pq_topk(spark, sf_dir).collect())
    assert got == exp
    n_fixtures = len(_ANN_INDEX_FIXTURES)
    again = sim_ann_index_search(spark, sf_dir)
    assert len(_ANN_INDEX_FIXTURES) == n_fixtures  # no rebuild
    plan = again._jdf.queryExecution().executedPlan().toString()
    # non-empty filter naming the cell column — `PartitionFilters: [` alone
    # would also match an empty list and could never fail
    import re

    assert any(
        "cell" in m for m in re.findall(r"PartitionFilters: \[([^\]]+)\]", plan)
    ), plan[:800]


def test_gopher_gate_splits_and_signal_sanity(spark, sf_dir):
    """The composed Gopher gate must produce both verdicts on the
    fixture (thresholds are tuned for that) and its signals must be
    internally consistent."""
    from snowflake_to_postgres_spark.operators.text import tx_gopher_gate

    rows = tx_gopher_gate(spark, sf_dir).collect()
    verdicts = {r["keep"] for r in rows}
    assert verdicts == {True, False}
    for r in rows:
        assert 0.0 <= r["top_2gram_frac"] <= 1.0
        assert 0.0 <= r["dup_3gram_frac"] < 1.0
        assert r["n_tokens"] > 0


def test_pagerank_bucketed_fixture_drops_edge_exchange(spark, sf_dir):
    """Round-7 verdict #3: the REGISTERED bucketed query (not just a
    synthetic test table) must read a bucketed scan and plan fewer
    exchanges per round than the unbucketed twin."""
    from snowflake_to_postgres_spark.operators.pipeline_ext import (
        _bucketed_trade_edges,
        _trade_edges,
        _pagerank_round_plan,
    )

    plain = _pagerank_round_plan(_trade_edges(spark, sf_dir))
    buck_edges = _bucketed_trade_edges(spark, sf_dir)
    buck = _pagerank_round_plan(buck_edges)
    p_plain = plain._jdf.queryExecution().executedPlan().toString()
    p_buck = buck._jdf.queryExecution().executedPlan().toString()
    assert "Bucketed: true" in p_buck
    assert p_buck.count("Exchange") < p_plain.count("Exchange"), (
        p_buck.count("Exchange"),
        p_plain.count("Exchange"),
    )


def test_pagerank_converged_early_exit_and_tol0_parity(spark, sf_dir):
    """Round-7 verdict #7: the converged variant must genuinely exit
    before the cap on the real trade graph, and the early exit must
    change only WHEN it stops — a tol=0 run of the same iteration count
    reproduces the ranks bit-for-bit."""
    from snowflake_to_postgres_spark.operators.pipeline_ext import (
        PR_MAX_ITERS,
        _bucketed_trade_edges,
        graph_pagerank_converged,
        pagerank,
    )

    got = graph_pagerank_converged(spark, sf_dir)
    rows = got.collect()
    iters = rows[0]["iters"]
    assert 0 < iters < PR_MAX_ITERS, iters
    assert all(r["iters"] == iters for r in rows)

    fixed = pagerank(_bucketed_trade_edges(spark, sf_dir), iters=iters, tol=0.0)
    exact = {r["node"]: r["rank"] for r in fixed.collect()}
    for r in rows:
        node = r["key"] * 2 + (0 if r["node_kind"] == "customer" else 1)
        assert exact[node] == r["rank"], (node, exact[node], r["rank"])
