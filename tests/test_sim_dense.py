"""Dense numpy similarity path must agree with the exact decimal path on
neighbor sets (cosine values differ only by float noise)."""

from snowflake_to_postgres_spark.operators.similarity import (
    sim_topk_bruteforce,
    sim_topk_dense,
)


def test_dense_matches_exact_neighbors(spark, sf_dir):
    exact = {
        (r["qid"], r["rank"]): r["neighbor_id"]
        for r in sim_topk_bruteforce(spark, sf_dir).collect()
    }
    dense = {
        (r["qid"], r["rank"]): r["neighbor_id"]
        for r in sim_topk_dense(spark, sf_dir).collect()
    }
    assert exact == dense
