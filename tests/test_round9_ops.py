"""Round-9 pins: regression tests for the round-8 ADVICE fixes — exact
dense-id bucketing over the full bigint domain, and degenerate
empty-input contracts for the temperature mixture plan, the centroid
drift monitor, and personalized PageRank."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def empty_sf_dir(spark, sf_dir, tmp_path_factory):
    """A fixture dir whose tables carry the real schemas but zero rows."""
    out = tmp_path_factory.mktemp("empty_sf")
    for t in ("documents", "embeddings", "orders", "lineitem"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").limit(0).write.mode(
            "overwrite"
        ).parquet(str(out / f"{t}.parquet"))
    return str(out)


def test_dense_bucket_exact_above_2_53(spark):
    """Round-8 ADVICE: floor(key / 64) routes through double and rounds
    keys above 2^53 (granularity 512 at 2^62), merging up to ~512
    buckets into one. The bucket expression must be exact integer
    division for the whole bigint domain."""
    from snowflake_to_postgres_spark.operators.pipeline_ext import (
        DENSE_ID_BUCKET,
        _dense_bucket,
    )

    big = 2**62
    keys = [big - 1, big, big + DENSE_ID_BUCKET - 1, big + DENSE_ID_BUCKET]
    df = spark.createDataFrame([(k,) for k in keys], "k bigint")
    got = {
        r["k"]: r["b"]
        for r in df.select("k", _dense_bucket("k").alias("b")).collect()
    }
    for k in keys:
        # the old double path puts big-1 into bucket big//64 (it rounds
        # the key up to 2^62 before dividing); exact div keeps it in
        # bucket (big-1)//64 = big//64 - 1.
        assert got[k] == k // DENSE_ID_BUCKET


def test_dense_ids_rank_contract_on_huge_keys(spark):
    """dense_id must equal the 0..N-1 rank of the key even when keys sit
    far above 2^53 and straddle bucket boundaries."""
    from snowflake_to_postgres_spark.operators.pipeline_ext import dense_ids

    big = 2**62
    keys = [3, 64, big - 65, big - 64, big - 1, big, big + 63, big + 64]
    df = spark.createDataFrame([(k,) for k in keys], "k bigint")
    got = {r["k"]: r["dense_id"] for r in dense_ids(df, "k").collect()}
    for rank, k in enumerate(sorted(keys)):
        assert got[k] == rank


def test_mixture_temperature_empty_corpus(spark, empty_sf_dir):
    """Round-8 ADVICE: an empty documents table made float(None) raise.
    The plan must come back well-formed and empty."""
    from snowflake_to_postgres_spark.operators.pipeline_ext import (
        tx_mixture_temperature,
    )

    out = tx_mixture_temperature(spark, empty_sf_dir)
    assert out.count() == 0
    assert out.columns == [
        "source",
        "n_docs",
        "actual_chars",
        "w_sqrt",
        "share",
        "target_chars",
        "rate",
        "planned_chars",
    ]


def test_centroid_drift_empty_corpus(spark, empty_sf_dir):
    """Round-8 ADVICE: int(None) raised on an empty embeddings table and
    a one-sided split divided by zero. Empty input → empty monitor."""
    from snowflake_to_postgres_spark.operators.similarity import (
        emb_centroid_drift,
    )

    out = emb_centroid_drift(spark, empty_sf_dir)
    assert out.count() == 0
    assert out.columns == [
        "cell",
        "n_a",
        "n_b",
        "share_a",
        "share_b",
        "drift",
        "flagged",
    ]


def test_ppr_empty_seed_set(spark, empty_sf_dir):
    """Round-8 ADVICE: ppr() crashed with ZeroDivisionError on an empty
    seed set; graph_ppr must return a well-formed empty frame on the
    degenerate fixture the graph CLI verb claims to handle."""
    from snowflake_to_postgres_spark.operators.pipeline_ext import (
        graph_ppr,
        ppr,
    )

    edges = spark.createDataFrame([(1, 2), (2, 1)], "src bigint, dst bigint")
    with pytest.raises(ValueError, match="seed_nodes"):
        ppr(edges, [])

    out = graph_ppr(spark, empty_sf_dir)
    assert out.count() == 0
    assert out.columns == ["node_kind", "key", "rank"]
    assert [f.dataType.simpleString() for f in out.schema.fields] == [
        "string",
        "bigint",
        "double",
    ]
