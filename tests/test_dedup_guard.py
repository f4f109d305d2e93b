"""Runtime guard on the exact (all-pairs-within-candidates) Jaccard
path: it must refuse oversized candidate volumes and point at LSH."""

from __future__ import annotations

import pytest

from snowflake_to_postgres_spark.operators.dedup import dedup_ngram_jaccard_pairs


def test_guard_allows_small_data(spark, sf_dir):
    df = dedup_ngram_jaccard_pairs(spark, sf_dir)
    assert {"d1", "d2", "jaccard"} <= set(df.columns)
    df.count()  # executes fine under the default limit


def test_guard_raises_above_limit(spark, sf_dir):
    with pytest.raises(ValueError, match="dedup_minhash_lsh_pairs"):
        dedup_ngram_jaccard_pairs(spark, sf_dir, max_candidate_pairs=0)
