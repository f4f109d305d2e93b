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


def test_power_iteration_matches_numpy(spark, tmp_path):
    """On a corpus with a PLANTED dominant direction (large eigengap),
    the in-engine power iteration must align with numpy's top
    eigenvector (|cosine| -> 1) and match the top eigenvalue. (The
    fixture embeddings are i.i.d., so their eigengap is Marchenko-
    Pastur-tiny and NO power method converges quickly there — the
    planted corpus is the honest convergence test.)"""
    import numpy as np

    from snowflake_to_postgres_spark.operators.similarity import emb_top_component

    rng = np.random.RandomState(7)
    u = rng.randn(64)
    u /= np.linalg.norm(u)
    X = rng.randn(400, 64) * 0.1 + np.outer(rng.randn(400) * 2.0, u)
    rows = [(i, [float(x) for x in X[i]]) for i in range(400)]
    df = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<FLOAT>")
    sf_dir = str(tmp_path / "planted")
    df.write.parquet(sf_dir + "/embeddings.parquet")

    # numpy truth on the SAME float32-rounded, 1e-9-gridded values the
    # engine reads (parquet stores float32)
    Xr = np.array([[float(np.float32(x)) for x in row] for row in X])
    Xr = np.floor(Xr * 1e9 + 0.5) / 1e9
    Xc = Xr - Xr.mean(axis=0)
    evals, evecs = np.linalg.eigh(Xc.T @ Xc)
    top_vec, top_val = evecs[:, -1], evals[-1]
    assert evals[-1] / evals[-2] > 50  # the plant worked: big eigengap

    vec, eig = emb_top_component(spark, sf_dir)
    v = np.array(vec)
    assert abs(np.linalg.norm(v) - 1.0) < 1e-9
    assert abs(abs(v @ top_vec) - 1.0) < 1e-9
    assert abs(eig - top_val) / top_val < 1e-9


def test_remove_top_component_kills_dominant_variance(spark, tmp_path):
    """After all-but-the-top removal on the planted corpus: variance
    along the planted direction collapses to ~0, every other direction
    keeps its variance, and total variance drops by the top eigenvalue."""
    import numpy as np

    from snowflake_to_postgres_spark.operators.similarity import (
        emb_remove_top_component,
        emb_top_component,
    )

    rng = np.random.RandomState(11)
    u = rng.randn(64)
    u /= np.linalg.norm(u)
    X = rng.randn(300, 64) * 0.1 + np.outer(rng.randn(300) * 2.0, u)
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(300)],
        "vec_id BIGINT, embedding ARRAY<FLOAT>",
    )
    sf_dir = str(tmp_path / "planted2")
    df.write.parquet(sf_dir + "/embeddings.parquet")

    vec, eig = emb_top_component(spark, sf_dir)
    rows = emb_remove_top_component(spark, sf_dir).collect()
    Y = np.zeros((300, 64))
    for r in rows:
        Y[r["vec_id"], r["idx"]] = r["val"]
    v = np.array(vec)
    along = Y @ v
    assert float(np.max(np.abs(along))) < 1e-9  # nothing left along v
    # total SS drops by exactly the removed eigenvalue (Pythagoras)
    # vs the centered original
    Xg = np.floor(np.array([[float(np.float32(x)) for x in row] for row in X]) * 1e9 + 0.5) / 1e9
    Xc = Xg - Xg.mean(axis=0)
    assert abs((Xc ** 2).sum() - (Y ** 2).sum() - eig) / eig < 1e-9
