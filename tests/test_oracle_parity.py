"""The local twin of the driver's CORRECTNESS gate: every registered query
with an oracle must match DuckDB exactly at the test scale factor."""

from __future__ import annotations

import pytest

from snowflake_to_postgres_spark.registry import _all_specs
from tests.oracle_compare import compare_frames

SPECS = [s for s in _all_specs() if s.oracle is not None]


@pytest.mark.parametrize("spec", SPECS, ids=[s.name for s in SPECS])
def test_query_matches_oracle(spark, duck, sf_dir, spec):
    sdf = spec.fn(spark, sf_dir)
    rel = duck.execute(spec.oracle)
    ok, msg = compare_frames(sdf, rel)
    assert ok, f"{spec.name}: {msg}"


def test_all_queries_run(spark, sf_dir):
    """Queries without an oracle must still execute and have a stable schema."""
    from snowflake_to_postgres_spark.registry import queries

    for name, fn in queries().items():
        df = fn(spark, sf_dir)
        assert df.columns, name
        df.limit(1).collect()
