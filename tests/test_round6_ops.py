"""Round-6 operator pins: numpy parity for the iterative rows-only ops
(graph_pagerank) and semantics checks that the driver's rows-only gate
can't see."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from tests.conftest import table_path  # noqa: F401  (fixture import side)


def test_pagerank_numpy_parity(spark, sf_dir):
    """Distributed PageRank must match a dense numpy reference run of the
    same iteration on the same graph to float tolerance."""
    from snowflake_to_postgres_spark.operators.pipeline_ext import (
        PR_DAMP,
        PR_ITERS,
        _trade_edges,
        pagerank,
    )

    edges = _trade_edges(spark, sf_dir)
    e = [(r["src"], r["dst"]) for r in edges.collect()]
    nodes = sorted({s for s, _ in e} | {d for _, d in e})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    a = np.zeros((n, n))
    deg = np.zeros(n)
    for s, d in e:
        deg[idx[s]] += 1
    for s, d in e:
        a[idx[d], idx[s]] = 1.0 / deg[idx[s]]
    r = np.full(n, 1.0 / n)
    for _ in range(PR_ITERS):
        r = (1.0 - PR_DAMP) / n + PR_DAMP * (a @ r)
        # mirror the engine's per-iteration PR_GRID snap (round 7): the
        # gridded recurrence is the operator's defined semantics
        r = np.floor(r * 1e9 + 0.5) / 1e9

    got = {row["node"]: row["rank"] for row in pagerank(edges).collect()}
    assert set(got) == set(nodes)
    bad = [n for n in nodes if got[n] != pytest.approx(r[idx[n]], abs=1e-9)]
    if bad:
        # Diagnostic path (round-7 ADVICE): a mismatch here is most likely
        # a grid-boundary flip (see PR_GRID's comment — ~1e-9 probability
        # per snap, not impossible). Localize it: replay the engine at
        # increasing iteration counts and report the FIRST iteration where
        # the offending node diverges from the numpy mirror, so the flip
        # is attributable instead of a bare hash-fail.
        first_div = {}
        for it in range(1, PR_ITERS + 1):
            eng = {row["node"]: row["rank"] for row in pagerank(edges, iters=it).collect()}
            ref = np.full(n, 1.0 / n)
            for _ in range(it):
                ref = (1.0 - PR_DAMP) / n + PR_DAMP * (a @ ref)
                ref = np.floor(ref * 1e9 + 0.5) / 1e9
            for node in bad:
                if node not in first_div and eng[node] != pytest.approx(
                    ref[idx[node]], abs=1e-9
                ):
                    first_div[node] = (it, eng[node], ref[idx[node]])
            if len(first_div) == len(bad):
                break
        raise AssertionError(
            f"pagerank diverged on {len(bad)} node(s); first diverging "
            f"iteration per node (node -> (iter, engine, numpy)): {first_div}"
        )
    # probability mass conserved (undirected graph has no dangling loss)
    # up to the per-node grid snap: n nodes × half-grid 5e-10 each
    assert sum(got.values()) == pytest.approx(1.0, abs=5e-10 * len(nodes) + 1e-9)


def test_pagerank_hub_ranks_higher(spark, sf_dir):
    """A supplier trading with more customers must outrank one trading
    with fewer (monotonicity sanity on the registered output)."""
    from snowflake_to_postgres_spark.registry import queries

    df = queries()["graph_pagerank"](spark, sf_dir)
    sup = {r["key"]: r["rank"] for r in df.filter(F.col("node_kind") == "supplier").collect()}
    from snowflake_to_postgres_spark.operators.pipeline_ext import _trade_edges

    edges = _trade_edges(spark, sf_dir)
    degs = {
        r["src"]: r["cnt"]
        for r in edges.filter(F.col("src") % 2 == 1)
        .groupBy("src")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    by_deg = sorted(degs.items(), key=lambda kv: kv[1])
    lo, hi = by_deg[0], by_deg[-1]
    if hi[1] > lo[1] * 2:  # only assert when degrees clearly separate
        assert sup[hi[0] // 2] > sup[lo[0] // 2]


def test_mmr_rerank_parity(spark):
    """The applyInPandas greedy must match an independently written
    pure-python MMR over the same candidate frame."""
    from snowflake_to_postgres_spark.operators.similarity import (
        MMR_K,
        MMR_LAMBDA,
        _mmr_candidates,
        sim_mmr_rerank,
    )

    sf = "/root/testdata/sf0.01"
    cands = _mmr_candidates(spark, sf).collect()
    by_q = {}
    for r in cands:
        by_q.setdefault(r["qid"], []).append(
            (r["neighbor_id"], r["cosine"], np.asarray(r["embedding"], dtype=np.float64))
        )

    expected = {}
    for qid, items in by_q.items():
        vecs = {n: v / np.linalg.norm(v) for n, _, v in items}
        rel = {n: c for n, c, _ in items}
        chosen = []
        pool = sorted(rel)
        while pool and len(chosen) < MMR_K:
            scored = []
            for n in pool:
                # mirror the engine's 1e-8 pair-similarity grid (round 8
                # — what makes the greedy SQL-oracle-able)
                div = max(
                    (
                        float(np.floor(float(vecs[n] @ vecs[m]) * 1e8 + 0.5) / 1e8)
                        for m in chosen
                    ),
                    default=0.0,
                )
                scored.append((MMR_LAMBDA * rel[n] - (1 - MMR_LAMBDA) * div, -n, n))
            scored.sort(reverse=True)
            s, _, n = scored[0]
            chosen.append(n)
            pool.remove(n)
            expected[(qid, len(chosen))] = (n, float(np.floor(s * 1e8 + 0.5) / 1e8))

    got = {
        (r["qid"], r["sel_rank"]): (r["neighbor_id"], r["mmr_score"])
        for r in sim_mmr_rerank(spark, sf).collect()
    }
    assert got.keys() == expected.keys()
    for k in expected:
        assert got[k][0] == expected[k][0], (k, got[k], expected[k])
        assert got[k][1] == pytest.approx(expected[k][1], abs=1e-7)
    # diversity sanity: the reranked set is never identical to the plain
    # top-k head unless the head is already diverse; assert the FORM
    # instead — scores are non-increasing within each query
    for qid in by_q:
        scores = [got[(qid, r)][1] for r in range(1, MMR_K + 1)]
        assert scores == sorted(scores, reverse=True)
