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


def test_cluster_components_invariants(spark, sf_dir):
    """Structural invariants of duplicate-cluster resolution, independent
    of the oracle: the canonical id is the cluster minimum, both ends of
    every verified LSH pair land in the same component, and cluster
    sizes partition the corpus exactly."""
    from snowflake_to_postgres_spark.operators.dedup import (
        dedup_cluster_components,
        dedup_minhash_lsh_pairs,
    )
    from snowflake_to_postgres_spark.sources import load_table

    comp = {
        r["doc_id"]: (r["component_id"], r["cluster_size"])
        for r in dedup_cluster_components(spark, sf_dir).collect()
    }
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(comp) == n_docs
    assert all(cid <= d for d, (cid, _) in comp.items())
    for p in dedup_minhash_lsh_pairs(spark, sf_dir).collect():
        assert comp[p["d1"]][0] == comp[p["d2"]][0]
    from collections import Counter

    sizes = Counter(cid for cid, _ in comp.values())
    assert all(sizes[cid] == sz for cid, sz in comp.values())
    assert sum(sizes.values()) == n_docs
