"""Triangle-counting kernel: independent pure-python parity (the
rows-only-style pin the other families carry), known-structure checks,
and the fixture-threshold degenerate case."""

from __future__ import annotations

import hashlib
import itertools

from pyspark.sql import functions as F

from snowflake_to_postgres_spark.operators.graph import (
    graph_clustering_coeff,
    graph_triangles,
    triangles,
    triangles_per_node,
)


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in pairs], "u bigint, v bigint"
    )


def _brute_per_node(pairs):
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    counts: dict[int, int] = {}
    for a, b, c in itertools.combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for n in (a, b, c):
                counts[n] = counts.get(n, 0) + 1
    return counts


def test_triangles_known_structures(spark):
    """K5 (10 triangles, 6 per node), C4 (none), a pendant path (none).
    Also pins the exactly-once guarantee: K5 emits 10 distinct ordered
    triples, not 10 x 3! permutations."""
    k5 = list(itertools.combinations(range(5), 2))
    c4 = [(10, 11), (11, 12), (12, 13), (10, 13)]
    path = [(20, 21), (21, 22)]
    edges = _edges_df(spark, k5 + c4 + path)

    tri = triangles(edges).collect()
    assert len(tri) == 10
    assert len({tuple(sorted((r["a"], r["b"], r["c"]))) for r in tri}) == 10

    per_node = {
        r["node"]: r["triangles"] for r in triangles_per_node(edges).collect()
    }
    assert per_node == {n: 6 for n in range(5)}


def test_triangles_brute_force_parity(spark):
    """Deterministic pseudo-random graph over 30 nodes (md5-derived edge
    selection, ~25% density) vs an adjacency-set brute force."""
    nodes = range(30)
    pairs = [
        (a, b)
        for a, b in itertools.combinations(nodes, 2)
        if int(hashlib.md5(f"{a}-{b}".encode()).hexdigest(), 16) % 4 == 0
    ]
    expected = _brute_per_node(pairs)
    assert sum(expected.values()) > 30  # non-trivial graph
    got = {
        r["node"]: r["triangles"]
        for r in triangles_per_node(_edges_df(spark, pairs)).collect()
    }
    assert got == expected


def test_triangle_closure_requires_orientation_order(spark):
    """A wedge whose closing edge exists but in the 'wrong' raw (u, v)
    spelling is still found: orientation is by (degree, id), not by the
    input ordering. Star + rim: node 0 joined to 1..4, rim edges (1,2),
    (3,4) -> triangles {0,1,2} and {0,3,4} regardless of tuple order."""
    pairs = [(0, 1), (2, 0), (0, 3), (4, 0), (2, 1), (3, 4)]
    tri = {
        tuple(sorted((r["a"], r["b"], r["c"])))
        for r in triangles(_edges_df(spark, pairs)).collect()
    }
    assert tri == {(0, 1, 2), (0, 3, 4)}


def test_fixture_threshold_degenerate_at_sf0001(spark, sf_dir):
    """sf0.001 has 10 suppliers whose co-occurrence graph is complete;
    the mean+2*sqrt(mean) upper tail keeps nothing -> both registered
    queries must return their well-defined empty/degenerate shapes
    (this is the shape the clustering query's zero-wedge guard exists
    for)."""
    assert graph_triangles(spark, sf_dir).count() == 0
    row = graph_clustering_coeff(spark, sf_dir).collect()[0]
    assert row["nodes"] == 0
    assert row["edges"] == 0
    assert row["wedges"] == 0
    assert row["triangles"] == 0
    assert row["global_clustering"] is None


def test_clustering_identity_on_known_graph(spark):
    """global_clustering == 3*tri/wedges with wedges = sum C(deg, 2):
    K4 has 4 triangles' worth of corners... checked exactly: K4 union
    one pendant edge -> tri=4, degs (3,3,3,4,1) -> wedges=3+3+3+6+0=15?
    No: K4 nodes have deg 3 (one also pendant -> deg 4). wedges =
    C(3,2)*3 + C(4,2) + C(1,2) = 9 + 6 + 0 = 15, clustering = 12/15."""
    k4 = list(itertools.combinations(range(4), 2))
    pairs = k4 + [(0, 9)]
    edges = _edges_df(spark, pairs)
    tri = triangles(edges).count()
    assert tri == 4
    per_node = triangles_per_node(edges)
    total_corners = per_node.agg(F.sum("triangles").alias("s")).collect()[0]["s"]
    assert total_corners == 3 * tri


def test_rolling_dau_python_parity(spark, sf_dir):
    """Recompute DAU/WAU per day from raw events in Python (set algebra
    over distinct (user, day)) and compare every row — pins the banded
    week-bucket join against the plain-language definition 'distinct
    users in the trailing 7 days'."""
    from collections import defaultdict

    from snowflake_to_postgres_spark.operators.analytics_ext import (
        ROLLING_WINDOW_DAYS,
        x_rolling_dau,
    )
    from snowflake_to_postgres_spark.sources import load_table

    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("d"))
        .distinct()
        .collect()
    )
    by_day = defaultdict(set)
    for r in ev:
        by_day[r["d"]].add(r["user_id"])
    days = sorted(by_day)
    expected = {}
    for d in days:
        window = set()
        for off in range(ROLLING_WINDOW_DAYS):
            window |= by_day.get(d - __import__("datetime").timedelta(days=off), set())
        expected[d] = (len(by_day[d]), len(window))

    got = x_rolling_dau(spark, sf_dir).collect()
    assert {r["d"] for r in got} == set(days)
    for r in got:
        dau, wau = expected[r["d"]]
        assert (r["dau"], r["wau"]) == (dau, wau), r["d"]
        assert r["stickiness"] == dau / wau


def test_jaccard_links_known_graph(spark):
    """K4 plus pendant edge (0, 9): the only non-adjacent pairs with a
    common neighbor are (1,9), (2,9), (3,9) — each shares exactly node
    0 — with jaccard 1 / (3 + 1 - 1) = 1/3. K4-internal pairs are
    adjacent and must be anti-joined away."""
    from snowflake_to_postgres_spark.operators.graph import jaccard_links

    k4 = list(itertools.combinations(range(4), 2))
    got = jaccard_links(_edges_df(spark, k4 + [(0, 9)])).collect()
    assert [(r["u"], r["v"], r["common_neighbors"]) for r in got] == [
        (1, 9, 1),
        (2, 9, 1),
        (3, 9, 1),
    ]
    for r in got:
        assert r["jaccard"] == 1 / 3


def test_jaccard_links_brute_force_parity(spark):
    """Same md5-random 30-node graph as the triangle parity test,
    scored by a set-algebra brute force."""
    from snowflake_to_postgres_spark.operators.graph import jaccard_links

    nodes = range(30)
    pairs = [
        (a, b)
        for a, b in itertools.combinations(nodes, 2)
        if int(hashlib.md5(f"{a}-{b}".encode()).hexdigest(), 16) % 4 == 0
    ]
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    edge_set = {(min(a, b), max(a, b)) for a, b in pairs}
    expected = []
    for a, b in itertools.combinations(sorted(adj), 2):
        if (a, b) in edge_set:
            continue
        cn = len(adj[a] & adj[b])
        if cn:
            expected.append((-cn / len(adj[a] | adj[b]), a, b, cn))
    expected.sort()
    top = [(a, b, cn, -j) for j, a, b, cn in expected[:20]]

    got = [
        (r["u"], r["v"], r["common_neighbors"], r["jaccard"])
        for r in jaccard_links(_edges_df(spark, pairs)).collect()
    ]
    assert got == top


def test_kcore_kernel_known_and_random(spark):
    """K4 plus a pendant chain peels down to exactly K4 at k=2 (the
    chain strips one node per round — exercises multi-round cascade);
    md5-random-graph parity against a set-algebra brute force at k=3."""
    from snowflake_to_postgres_spark.operators.graph import kcore

    k4 = list(itertools.combinations(range(4), 2))
    chain = [(0, 9), (9, 10), (10, 11)]
    got = {
        r["node"]: r["core_deg"]
        for r in kcore(_edges_df(spark, k4 + chain), k=2).collect()
    }
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}

    nodes = range(30)
    pairs = [
        (a, b)
        for a, b in itertools.combinations(nodes, 2)
        if int(hashlib.md5(f"{a}-{b}".encode()).hexdigest(), 16) % 10 == 0
    ]
    def brute(rounds_cap):
        adj = {}
        for a, b in pairs:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        rounds = 0
        while rounds < rounds_cap:
            peel = [n for n, s in adj.items() if len(s) < 3]
            if not peel:
                break
            rounds += 1
            for n in peel:
                for m in adj[n]:
                    adj[m].discard(n)
                del adj[n]
        return {n: len(s) for n, s in adj.items() if s}, rounds

    # the registered contract: exactly KCORE_ROUNDS peel rounds — this
    # sparse graph (mean deg ~3) deliberately does NOT converge in 8,
    # so the fixed-round semantics are what the parity must mirror
    from snowflake_to_postgres_spark.operators.graph import KCORE_ROUNDS

    expected_fixed, _ = brute(KCORE_ROUNDS)
    got_fixed = {
        r["node"]: r["core_deg"]
        for r in kcore(_edges_df(spark, pairs), k=3).collect()
    }
    assert got_fixed == expected_fixed

    # and with enough rounds the kernel reaches the true converged core
    expected_conv, conv_rounds = brute(10**6)
    assert conv_rounds > KCORE_ROUNDS  # the case above was genuinely truncated
    got_conv = {
        r["node"]: r["core_deg"]
        for r in kcore(
            _edges_df(spark, pairs), k=3, rounds=conv_rounds
        ).collect()
    }
    assert got_conv == expected_conv


def test_ppr_numpy_parity(spark, sf_dir):
    """Personalized PageRank must match a dense numpy mirror of the
    seeded gridded recurrence, and its mass must concentrate on/near
    the seeds (the property that makes it a recommender primitive)."""
    import numpy as np
    import pytest

    from snowflake_to_postgres_spark.operators.pipeline_ext import (
        PR_DAMP,
        PR_ITERS,
        _ppr_seed_nodes,
        _trade_edges,
        ppr,
    )

    edges = _trade_edges(spark, sf_dir)
    seeds = _ppr_seed_nodes(spark, sf_dir)
    assert len(seeds) == 5 and all(s % 2 == 0 for s in seeds)

    e = [(r["src"], r["dst"]) for r in edges.collect()]
    nodes = sorted({s for s, _ in e} | {d for _, d in e})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    a = np.zeros((n, n))
    deg = np.zeros(n)
    for s, _ in e:
        deg[idx[s]] += 1
    for s, d in e:
        a[idx[d], idx[s]] = 1.0 / deg[idx[s]]
    tp = np.zeros(n)
    tpv = (1.0 - PR_DAMP) / len(seeds)
    for s in seeds:
        tp[idx[s]] = tpv
    r = tp.copy()
    for _ in range(PR_ITERS):
        r = tp + PR_DAMP * (a @ r)
        r = np.floor(r * 1e9 + 0.5) / 1e9

    got = {row["node"]: row["rank"] for row in ppr(edges, seeds).collect()}
    assert set(got) == set(nodes)
    for node in nodes:
        assert got[node] == pytest.approx(r[idx[node]], abs=1e-9), node
    # personalization: every seed outranks the global median node
    ranks_sorted = sorted(got.values())
    median = ranks_sorted[len(ranks_sorted) // 2]
    for s in seeds:
        assert got[s] > median


def test_modularity_kernel_known_communities(spark):
    """Two K3s bridged by one edge, communities = the triangles:
    m=7, intra each 3, degrees (2,2,3)x2 -> d_c = 7 per side,
    Q_c = 3/7 - (7/14)^2 = 3/7 - 1/4; global Q = 2*Q_c ~ 0.357."""
    from snowflake_to_postgres_spark.operators.graph import modularity

    k3a = [(0, 1), (1, 2), (0, 2)]
    k3b = [(10, 11), (11, 12), (10, 12)]
    bridge = [(2, 10)]
    edges = _edges_df(spark, k3a + k3b + bridge)
    comm = spark.createDataFrame(
        [(n, 0) for n in (0, 1, 2)] + [(n, 1) for n in (10, 11, 12)],
        "node bigint, c int",
    )
    rows = {r["community"]: r for r in modularity(edges, comm).collect()}
    for c in (0, 1):
        assert rows[c]["n_nodes"] == 3
        assert rows[c]["intra_edges"] == 3
        assert rows[c]["total_deg"] == 7
        assert rows[c]["contribution"] == 3 / 7 - (7 / 14) ** 2
    q = sum(r["contribution"] for r in rows.values())
    assert 0.3 < q < 0.4  # clearly community-structured


def test_assortativity_kernel_parity(spark):
    """Star graph is maximally disassortative (r = -1); the md5-random
    graph matches a numpy Pearson over edge-endpoint degree pairs."""
    import numpy as np

    from snowflake_to_postgres_spark.operators.graph import assortativity

    star = [(0, i) for i in range(1, 6)]
    r_star = assortativity(_edges_df(spark, star)).collect()[0]
    assert r_star["assortativity"] == -1.0

    nodes = range(30)
    pairs = [
        (a, b)
        for a, b in itertools.combinations(nodes, 2)
        if int(hashlib.md5(f"{a}-{b}".encode()).hexdigest(), 16) % 4 == 0
    ]
    degc: dict[int, int] = {}
    for a, b in pairs:
        degc[a] = degc.get(a, 0) + 1
        degc[b] = degc.get(b, 0) + 1
    # numpy Pearson over the symmetrized endpoint pairs == Newman's r
    xs = [degc[a] for a, b in pairs] + [degc[b] for a, b in pairs]
    ys = [degc[b] for a, b in pairs] + [degc[a] for a, b in pairs]
    expected = float(np.corrcoef(np.array(xs), np.array(ys))[0, 1])
    got = assortativity(_edges_df(spark, pairs)).collect()[0]["assortativity"]
    assert abs(got - expected) < 1e-9


def test_jaccard_links_noncanonical_edge_spelling(spark):
    """Round-8 review regression: an adjacency row spelled (v, u) must
    still be anti-joined away. Triangle {1,2,3} plus pendant (1,0):
    the only valid prediction is (0,2)/(0,3)-style via node 1 — pairs
    inside the triangle are adjacent regardless of tuple spelling."""
    from snowflake_to_postgres_spark.operators.graph import jaccard_links

    # deliberately NON-canonical spellings
    pairs = [(3, 1), (2, 1), (3, 2), (1, 0)]
    df = spark.createDataFrame(pairs, "u bigint, v bigint")  # raw, no min/max
    got = {(r["u"], r["v"]) for r in jaccard_links(df).collect()}
    assert (1, 2) not in got and (1, 3) not in got and (2, 3) not in got
    assert got == {(0, 2), (0, 3)}


def test_wedge_guard_raises_on_planted_hub(spark):
    """Round-10 verdict #1: the Θ(Σ deg²) wedge expansions must refuse
    uncapped runs whose estimated wedge volume exceeds max_wedges,
    pointing at max_deg — BEFORE launching the self-join. A star
    K_{1,50} has Σ deg² = 50² + 50·1² = 2550."""
    import pytest

    from snowflake_to_postgres_spark.operators.graph import (
        jaccard_links,
        two_hop_reach,
    )

    star = _edges_df(spark, [(0, k) for k in range(1, 51)])
    with pytest.raises(ValueError, match="max_deg"):
        two_hop_reach(star, max_wedges=100)
    with pytest.raises(ValueError, match="max_deg"):
        jaccard_links(star, max_wedges=100)


def test_wedge_cap_bounds_hub_expansion(spark):
    """max_deg caps the hub center's neighbor list (deterministically:
    the max_deg SMALLEST neighbors), so per-center wedges ≤ max_deg².
    Star K_{1,50}, max_deg=5: only leaves 1..5 see each other at hop 2
    (reach 5 = hub + 4 peers); leaves 6..50 keep only their direct hub
    edge (reach 1); the hub's one-hop ball stays FULL (reach 50) and
    reported degrees are always the true uncapped ones."""
    from snowflake_to_postgres_spark.operators.graph import two_hop_reach

    star = _edges_df(spark, [(0, k) for k in range(1, 51)])
    got = {
        r["u"]: (r["deg"], r["reach2"])
        for r in two_hop_reach(star, top=60, max_deg=5).collect()
    }
    assert got[0] == (50, 50)
    for leaf in range(1, 6):
        assert got[leaf] == (1, 5), got[leaf]
    for leaf in range(6, 51):
        assert got[leaf] == (1, 1), got[leaf]


def test_wedge_cap_is_noop_above_max_degree(spark):
    """A max_deg above the true max degree must reproduce the uncapped
    result exactly, for both kernels (fixture graphs unchanged)."""
    from snowflake_to_postgres_spark.operators.graph import (
        jaccard_links,
        two_hop_reach,
    )

    pairs = [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (2, 5), (5, 6)]
    df = _edges_df(spark, pairs)
    base_r = sorted(map(tuple, two_hop_reach(df).collect()))
    capped_r = sorted(map(tuple, two_hop_reach(df, max_deg=1000).collect()))
    assert base_r == capped_r
    base_j = sorted(map(tuple, jaccard_links(df).collect()))
    capped_j = sorted(map(tuple, jaccard_links(df, max_deg=1000).collect()))
    assert base_j == capped_j
