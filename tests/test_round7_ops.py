"""Round-7 additions: adversarial cross-engine parity for the quarantine
monitor, plus regression pins for this round's verdict/advice fixes."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from tests.oracle_compare import compare_frames


def test_v4_quarantine_adversarial_payload_parity(spark, tmp_path):
    """Round-6 ADVICE: the v4 oracle only agreed with Spark because the
    fixture props were all non-null well-typed objects. The pinned
    semantics — quarantined = payload present, non-blank, and not a
    parseable JSON OBJECT — must now hold on every adversarial shape:
    NULL props, empty/whitespace payloads, type-drifted k (string),
    missing k, JSON arrays, JSON scalars, and truly corrupt documents."""
    from snowflake_to_postgres_spark.operators.breadth import (
        V4_QUARANTINE_ORACLE,
        v4_quarantine_stats,
    )

    rows = [
        # (event_id, event_type, props) — ids chosen so none hits the
        # %8==0 injected-corruption slice; the payloads themselves are
        # the adversarial part.
        (1, "a", '{"k": 1}'),           # well-typed object → clean
        (2, "a", '{"k": "drift"}'),     # type-drifted k → clean (both engines)
        (3, "a", '{"other": 3}'),       # missing k → clean
        (5, "b", "[1, 2]"),             # valid JSON, not an object → quarantined
        (6, "b", "42"),                 # valid JSON scalar → quarantined
        (7, "b", "{not json"),          # corrupt → quarantined
        # The literal JSON document `null` (round-7 ADVICE): QUARANTINED
        # on BOTH sides — Spark's from_json with a struct schema records
        # a corrupt record for a root VALUE_NULL (verified on this Spark;
        # the ADVICE premise that it parses clean is false here), and the
        # oracle sees json_type='NULL' != 'OBJECT'. Pinned so a Spark
        # upgrade changing root-null parsing fails loudly.
        (13, "b", "null"),              # JSON null document → quarantined
        (9, "c", None),                 # NULL payload → clean (null document)
        (10, "c", ""),                  # empty → clean (null document)
        (11, "c", "   "),               # whitespace → clean (null document)
        (8, "c", '{"k": 9}'),           # %8==0 → prefix-injected → quarantined
    ]
    df = spark.createDataFrame(rows, "event_id bigint, event_type string, props string")
    sf = str(tmp_path)
    df.write.parquet(f"{sf}/events.parquet")

    got = v4_quarantine_stats(spark, sf)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet/*.parquet')"
    )
    ok, msg = compare_frames(got, con.execute(V4_QUARANTINE_ORACLE))
    assert ok, msg
    counts = {r["event_type"]: (r["n_quarantined"], r["n_clean"]) for r in got.collect()}
    assert counts == {"a": (0, 3), "b": (4, 0), "c": (1, 3)}


def test_quarantine_split_good_rows_carry_typed_columns(spark):
    """Round-6 ADVICE: the docstring promised 'clean rows continue with
    typed columns' but the good branch dropped the parsed struct. The
    projected fields must now be top-level, typed, and NULL for a NULL
    payload."""
    from snowflake_to_postgres_spark.streaming.pipeline import quarantine_split

    df = spark.createDataFrame(
        [
            (1, None, 10, '{"k": 7, "tag": "x"}'),
            (2, None, 11, "{broken"),
            (3, None, 12, None),
        ],
        "event_id bigint, ts timestamp, user_id bigint, props string",
    )
    good, bad = quarantine_split(df)
    assert "k" in good.columns and "tag" in good.columns
    assert dict(good.dtypes)["k"] == "bigint"
    rows = {r["event_id"]: (r["k"], r["tag"]) for r in good.collect()}
    assert rows == {1: (7, "x"), 3: (None, None)}
    assert [r["event_id"] for r in bad.collect()] == [2]


def test_pagerank_convergence_early_exit(spark):
    """Round-6 verdict #7: with tol > 0 the loop reads a one-scalar
    Σ|Δrank| signal per round and stops early. On a star graph the
    recurrence reaches its fixed point after ~2 rounds, so an 8-iteration
    budget with a loose tol must produce the SAME ranks as the full
    fixed-iteration run (the fixed point is stable under further
    iterations) — proving the early exit fired without changing results."""
    from snowflake_to_postgres_spark.operators.pipeline_ext import pagerank

    hub, leaves = 0, list(range(1, 41))
    edges = spark.createDataFrame(
        [(hub, l) for l in leaves] + [(l, hub) for l in leaves],
        "src bigint, dst bigint",
    )
    # damp=0.2 → per-round contraction 0.2: per-node Δ drops below one
    # PR_GRID step (5e-10) around round 14, after which the gridded
    # recurrence is EXACTLY at its fixed point (Σ|Δ| = 0.0). tol below
    # one grid step can therefore only fire at the true fixed point —
    # which is also why early-exit and full-budget results must be
    # bit-identical.
    full = {r["node"]: r["rank"] for r in pagerank(edges, iters=20, damp=0.2).collect()}

    stats: dict = {}
    early = {
        r["node"]: r["rank"]
        for r in pagerank(edges, iters=20, damp=0.2, tol=1e-12, stats=stats).collect()
    }
    assert early == full  # fixed point identical, bit-for-bit (gridded)
    assert stats["iters"] < 20, stats  # the early exit actually fired

    # a tol below any representable Δ must never trigger
    stats2: dict = {}
    pagerank(edges, iters=3, damp=0.2, tol=1e-300, stats=stats2).collect()
    assert stats2["iters"] == 3, stats2


def test_pagerank_bucketed_edges_drop_edge_side_exchange(spark, tmp_path):
    """Round-6 verdict #6: pre-bucketing the edge table by src must
    remove the edge-side shuffle from the per-round join — the
    co-partitioning claim in pagerank's docstring, proven on the plan."""
    import pyspark.sql.functions as F

    from snowflake_to_postgres_spark.sources.bucketed import write_bucketed_table

    edges = spark.createDataFrame(
        [(i % 50, (i * 7) % 50) for i in range(2000) if i % 50 != (i * 7) % 50],
        "src bigint, dst bigint",
    )
    write_bucketed_table(edges, "pr_edges_bucketed", "src", num_buckets=4)
    try:
        bucketed = spark.table("pr_edges_bucketed")

        def round_plan(e):
            deg = e.groupBy("src").agg(F.count("*").alias("deg"))
            ej = e.join(deg, "src").select("src", "dst", "deg")
            ranks = deg.select(F.col("src").alias("node"), F.lit(0.01).alias("rank"))
            contribs = ej.join(ranks, ej["src"] == ranks["node"]).select(
                F.col("dst").alias("node"), (F.col("rank") / F.col("deg")).alias("c")
            )
            new_ranks = contribs.groupBy("node").agg(F.sum("c").alias("s"))
            return new_ranks._jdf.queryExecution().executedPlan().toString()

        plain, buck = round_plan(edges), round_plan(bucketed)
        n_plain, n_buck = plain.count("Exchange"), buck.count("Exchange")
        assert n_buck < n_plain, (n_plain, n_buck)
        # the bucketed scan itself must carry the bucket metadata
        assert "Bucketed: true" in buck
    finally:
        spark.sql("DROP TABLE IF EXISTS pr_edges_bucketed")


def test_mmr_ann_composition(spark):
    """Round-6 verdict #5: the registered MMR must be runnable on the
    ANN shortlist, not only brute force. Three gates: (1) the greedy on
    the ANN candidates matches an independent pure-python MMR over the
    same collected frame; (2) the ANN shortlist itself stays bounded at
    MMR_SHORTLIST per query; (3) the diversified selections substantially
    agree with the exact-shortlist twin (the IVF+PQ recall story)."""
    import numpy as np

    from snowflake_to_postgres_spark.operators.similarity import (
        MMR_K,
        MMR_LAMBDA,
        MMR_SHORTLIST,
        _mmr_ann_candidates,
        sim_mmr_ann,
        sim_mmr_rerank,
    )

    sf = "/root/testdata/sf0.01"
    cands = _mmr_ann_candidates(spark, sf).collect()
    by_q = {}
    for r in cands:
        by_q.setdefault(r["qid"], []).append(
            (r["neighbor_id"], r["cosine"], np.asarray(r["embedding"], dtype=np.float64))
        )
    assert by_q and all(len(v) <= MMR_SHORTLIST for v in by_q.values())

    expected = {}
    for qid, items in by_q.items():
        vecs = {n: v / np.linalg.norm(v) for n, _, v in items}
        rel = {n: c for n, c, _ in items}
        chosen = []
        pool = sorted(rel)
        while pool and len(chosen) < MMR_K:
            scored = []
            for n in pool:
                # mirror the engine's 1e-8 pair-similarity grid (round 8)
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
        for r in sim_mmr_ann(spark, sf).collect()
    }
    assert got.keys() == expected.keys()
    for k in expected:
        assert got[k][0] == expected[k][0], (k, got[k], expected[k])

    exact = {
        (r["qid"], r["sel_rank"]): r["neighbor_id"]
        for r in sim_mmr_rerank(spark, sf).collect()
    }
    overlap = [
        len({got[(q, r)][0] for r in range(1, MMR_K + 1)}
            & {exact[(q, r)] for r in range(1, MMR_K + 1)}) / MMR_K
        for q in by_q
    ]
    assert sum(overlap) / len(overlap) >= 0.5, overlap
