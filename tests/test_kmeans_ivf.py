"""k-means IVF training: Lloyd iterations must not increase SSE, and
trained centroids must beat the seed centroids."""

from snowflake_to_postgres_spark.operators.similarity import (
    kmeans_sse,
    train_ivf_centroids,
)
from snowflake_to_postgres_spark.sources import load_table


def test_kmeans_converges(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding").cache()
    seed = [list(r["embedding"]) for r in emb.orderBy("vec_id").limit(8).collect()]
    sse_seed = kmeans_sse(emb, seed)
    c1 = train_ivf_centroids(emb, k=8, iterations=1)
    c3 = train_ivf_centroids(emb, k=8, iterations=3)
    sse1 = kmeans_sse(emb, c1)
    sse3 = kmeans_sse(emb, c3)
    assert sse1 <= sse_seed
    assert sse3 <= sse1 + 1e-9
    assert sse3 < sse_seed * 0.99  # training actually moved the centroids
