"""asof_join direction/tolerance semantics, pinned against pandas
``merge_asof`` — an independent reference implementation of the exact
surface the operator copies (backward / forward / nearest, tolerance,
tie handling)."""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F

from snowflake_to_postgres_spark.operators.temporal_joins import asof_join


def _frames(spark):
    left = pd.DataFrame(
        {
            "k": [1, 1, 1, 2, 2, 3],
            "lts": [10.0, 55.0, 100.0, 7.0, 8.0, 1.0],
            "lv": ["a", "b", "c", "d", "e", "f"],
        }
    )
    right = pd.DataFrame(
        {
            "k": [1, 1, 1, 2, 9],
            "rts": [10.0, 50.0, 120.0, 9.0, 5.0],
            "rv": [100.0, 200.0, 300.0, 400.0, 500.0],
        }
    )
    return left, right, spark.createDataFrame(left), spark.createDataFrame(right)


def _expected(left, right, direction, tolerance=None):
    exp = pd.merge_asof(
        left.sort_values("lts"),
        right.sort_values("rts"),
        left_on="lts",
        right_on="rts",
        by="k",
        direction=direction,
        tolerance=tolerance,
        allow_exact_matches=True,
    )
    return {
        (r.k, r.lts): (None if pd.isna(r.rts) else r.rts,
                       None if pd.isna(r.rv) else r.rv)
        for r in exp.itertuples()
    }


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
@pytest.mark.parametrize("tolerance", [None, 10.0])
def test_asof_matches_pandas_merge_asof(spark, direction, tolerance):
    left, right, sl, sr = _frames(spark)
    got = asof_join(
        sl, sr, "k", "lts", "rts", ["rts", "rv"],
        direction=direction, tolerance_sec=tolerance,
    )
    got_map = {
        (r["k"], r["lts"]): (r["rts"], r["rv"]) for r in got.collect()
    }
    assert got_map == _expected(left, right, direction, tolerance)


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
@pytest.mark.parametrize("tolerance", [None, 10.0])
def test_asof_without_right_ts_in_values(spark, direction, tolerance):
    """tolerance/nearest need the matched right_ts internally; a caller
    asking only for ['rv'] must get the same rv matches as one asking
    for ['rts', 'rv'] — previously the tolerance filter read the union's
    all-null right_ts column and nulled every match — and the result
    must NOT grow an rts column the caller never requested."""
    left, right, sl, sr = _frames(spark)
    got = asof_join(
        sl, sr, "k", "lts", "rts", ["rv"],
        direction=direction, tolerance_sec=tolerance,
    )
    assert "rts" not in got.columns
    got_map = {(r["k"], r["lts"]): r["rv"] for r in got.collect()}
    expected = {
        kk: rv for kk, (_rts, rv) in _expected(left, right, direction, tolerance).items()
    }
    assert got_map == expected


def test_asof_left_rows_always_survive(spark):
    _, _, sl, sr = _frames(spark)
    for direction in ("backward", "forward", "nearest"):
        got = asof_join(
            sl, sr, "k", "lts", "rts", ["rts", "rv"],
            direction=direction, tolerance_sec=0.5,
        )
        assert got.count() == sl.count()
        # key 3 has no right rows at all: carried values are null
        r3 = got.filter(F.col("k") == 3).collect()
        assert len(r3) == 1 and r3[0]["rts"] is None and r3[0]["rv"] is None
