"""Round-13 operator tests: direction-aware bench drift, parameterized
CMS join-cardinality width, vectorized media decode parity, palette
PNG, zero-dimension guards, AVI bit-depth gating, the RP-LSH ladder
kernel, and the st_mixture monitor family."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


class TestBenchDriftDirection:
    """Round-12 verdict #3: the drift flag must be one-sided — a
    uniformly FASTER run is not suspect."""

    def _assess(self, per_query, committed):
        import bench

        return bench.assess_drift(per_query, committed)

    def test_faster_run_not_suspect(self):
        r = self._assess({"a": 0.8, "b": 0.85}, {"a": 1.0, "b": 1.0})
        assert r["direction"] == "faster"
        assert r["suspect"] is False
        assert r["geomean"] < 0.90

    def test_slower_run_suspect(self):
        r = self._assess({"a": 1.3, "b": 1.25}, {"a": 1.0, "b": 1.0})
        assert r["direction"] == "slower"
        assert r["suspect"] is True

    def test_stable_run(self):
        r = self._assess({"a": 1.02, "b": 0.98}, {"a": 1.0, "b": 1.0})
        assert r["direction"] == "stable"
        assert r["suspect"] is False

    def test_no_common_keys(self):
        r = self._assess({"a": 1.0}, {})
        assert r == {"geomean": None, "suspect": False, "direction": None}
        # zero-valued medians are excluded, not divided by
        r = self._assess({"a": 0.0}, {"a": 1.0})
        assert r["geomean"] is None


class TestCmsJoinCardinalityWidth:
    """Round-12 verdict #5: ``w`` is a kernel parameter and the sizing
    rule is measurable — rel_err_ppm tightens as w grows."""

    def test_rel_err_tightens_with_w(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from snowflake_to_postgres_spark.operators.analytics_ext import (
            CMS_W,
            cms_join_cardinality,
        )
        from snowflake_to_postgres_spark.sources import load_table

        o = load_table(spark, sf_dir, "orders").select(
            F.col("o_orderkey").alias("k")
        )
        li = load_table(spark, sf_dir, "lineitem").select(
            F.col("l_orderkey").alias("k")
        )
        narrow = cms_join_cardinality(o, li, w=CMS_W).first()
        wide = cms_join_cardinality(o, li, w=4096).first()
        # same exact truth, both never undercount
        assert narrow["exact_pairs"] == wide["exact_pairs"] > 0
        assert narrow["never_undercounts"] and wide["never_undercounts"]
        # the additive slack is ~‖a‖₁·‖b‖₁/w: 16× wider ⇒ materially
        # tighter (assert ≥4× to stay robust to hash-bucket luck)
        assert wide["rel_err_ppm"] * 4 <= narrow["rel_err_ppm"]

    def test_degenerate_empty_join_pins_null(self, spark, duck):
        """ADVICE r12: disjoint key sets (empty join) must yield NULL
        exact/ratio columns in BOTH engines, not a div-by-zero error."""
        from snowflake_to_postgres_spark.operators.analytics_ext import (
            cms_join_cardinality,
        )

        a = spark.createDataFrame([(1,), (2,)], ["k"])
        b = spark.createDataFrame([(1_000_001,), (1_000_002,)], ["k"])
        row = cms_join_cardinality(a, b).first()
        assert row["exact_pairs"] is None
        assert row["rel_err_ppm"] is None
        # the DuckDB idiom the oracle uses survives the same degenerate case
        got = duck.execute(
            "SELECT (10 - e) * 1000000 // NULLIF(e, 0) FROM "
            "(SELECT CAST(NULL AS BIGINT) AS e)"
        ).fetchone()
        assert got[0] is None
