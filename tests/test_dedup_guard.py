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


def test_containment_lsh_catches_short_in_huge(spark, tmp_path):
    """The adversarial case the resemblance bands are blind to: a short
    document fully embedded in a huge one. Jaccard ≈ |short|/|huge| ≈
    0.03, so symmetric MinHash bands (collision w.p. J^rows_per_band)
    never propose the pair — dedup_containment_pairs must miss it. The
    dedicated containment index (bottom-k sample of the src side) must
    catch it with containment 1.0, and its DuckDB oracle must agree on
    this fixture too."""
    from snowflake_to_postgres_spark.operators.dedup import (
        DEDUP_CONTAINMENT_LSH_ORACLE,
        dedup_containment_lsh,
        dedup_containment_pairs,
    )
    from tests.oracle_compare import compare_frames

    huge = " ".join(f"tok{i:04d}" for i in range(600))
    short = " ".join(f"tok{i:04d}" for i in range(100, 120))
    filler = " ".join(f"oth{i:04d}" for i in range(100))
    rows = [
        (0, huge, "en", "src0", len(huge)),
        (1, short, "en", "src0", len(short)),
        (2, filler, "en", "src1", len(filler)),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    fix = str(tmp_path / "fixture_sf")
    docs.coalesce(1).write.parquet(f"{fix}/documents.parquet")

    sym = dedup_containment_pairs(spark, fix).collect()
    assert not any(r["src"] == 1 and r["dst"] == 0 for r in sym), (
        "symmetric bands unexpectedly proposed the short-in-huge pair — "
        "fixture no longer demonstrates the recall gap"
    )

    ded = {(r["src"], r["dst"]): r["containment"]
           for r in dedup_containment_lsh(spark, fix).collect()}
    assert ded.get((1, 0)) == 1.0, f"dedicated index missed the pair: {ded}"

    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{fix}/documents.parquet/*.parquet')"
    )
    ok, msg = compare_frames(dedup_containment_lsh(spark, fix),
                             con.execute(DEDUP_CONTAINMENT_LSH_ORACLE))
    assert ok, msg


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


def test_propagate_components_log_rounds_on_chain(spark):
    """Pointer jumping must make a pathological 256-node chain converge
    in O(log n) rounds, not O(n) — the difference between 8 joins and
    256 joins over a 100 TB pair graph with deep chains."""
    from pyspark.sql import functions as F

    from snowflake_to_postgres_spark.operators.dedup import propagate_components

    n = 256
    edges = [(i, i + 1) for i in range(n - 1)]
    sym = spark.createDataFrame(
        edges + [(b, a) for a, b in edges], "d1 long, d2 long"
    ).localCheckpoint()
    labels, rounds = propagate_components(sym)
    got = {r["doc_id"]: r["comp"] for r in labels.collect()}
    assert got == {i: 0 for i in range(n)}
    assert rounds <= 12, f"chain took {rounds} rounds — pointer jumping broken"


def test_propagate_components_random_graph_matches_union_find(spark):
    """Random sparse graphs: distributed labels must equal a classic
    driver-side union-find."""
    import random

    from snowflake_to_postgres_spark.operators.dedup import propagate_components

    rng = random.Random(7)
    n = 300
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(150)]
    edges = [(a, b) for a, b in edges if a != b]
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {}
    for a, b in edges:
        for v in (a, b):
            expected[v] = find(v)
    # canonical label = min member of each root's class among edge nodes
    by_root = {}
    for v, r in expected.items():
        by_root.setdefault(r, []).append(v)
    canon = {v: min(vs) for r, vs in by_root.items() for v in vs}

    sym = spark.createDataFrame(
        edges + [(b, a) for a, b in edges], "d1 long, d2 long"
    ).localCheckpoint()
    labels, _ = propagate_components(sym)
    got = {r["doc_id"]: r["comp"] for r in labels.collect()}
    assert got == canon


def test_driver_union_find_matches_distributed(spark):
    """Strategy parity: the driver-side union-find (the adaptive fast
    path under DRIVER_CC_MAX_EDGES) labels a random graph identically
    to the distributed pointer-jumping path."""
    import random

    from snowflake_to_postgres_spark.operators.dedup import (
        _union_find_labels,
        propagate_components,
    )

    rng = random.Random(11)
    n = 400
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(220)]
    edges = [(a, b) for a, b in edges if a != b]
    sym = spark.createDataFrame(
        sorted(set(edges + [(b, a) for a, b in edges])), "d1 long, d2 long"
    ).localCheckpoint()
    uf = {r["doc_id"]: r["comp"] for r in _union_find_labels(spark, sym).collect()}
    dist_labels, _ = propagate_components(sym)
    dist = {r["doc_id"]: r["comp"] for r in dist_labels.collect()}
    assert uf == dist


def test_lsh_recall_bands(spark, sf_dir):
    """Recall rows cover only bands >= the Jaccard threshold decile, every
    recall is a valid fraction, and the top band (0.9-1.0] — which holds
    the exact-duplicate pairs LSH cannot miss (identical signatures) —
    has recall 1.0 on the fixture corpus."""
    from snowflake_to_postgres_spark.operators.dedup import (
        JACCARD_THRESHOLD,
        dedup_lsh_recall,
    )

    rows = dedup_lsh_recall(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert int(JACCARD_THRESHOLD * 10) <= r["band"] <= 9
        assert 0 <= r["n_found"] <= r["n_pairs"]
        assert abs(r["recall"] - r["n_found"] / r["n_pairs"]) < 1e-12
    top = [r for r in rows if r["band"] == 9]
    assert top and top[0]["recall"] == 1.0


def test_simhash64_recall_is_complete(spark):
    """The pigeonhole guarantee, checked against brute force: the
    blocked operator must find EXACTLY the set of pairs at hamming <= 3
    — zero false negatives (the 32-bit prefix scheme's documented hole)
    and zero false positives after verification."""
    from snowflake_to_postgres_spark.operators.dedup import (
        SIMHASH64_MAX_HAMMING,
        _simhash64_signatures,
        dedup_simhash64_pairs,
    )

    sf = "/root/testdata/sf0.01"
    sigs = {
        r["doc_id"]: (r["slo"], r["shi"])
        for r in _simhash64_signatures(spark, sf).collect()
    }
    ids = sorted(sigs)
    expected = set()
    for i, d1 in enumerate(ids):
        l1, h1 = sigs[d1]
        for d2 in ids[i + 1:]:
            l2, h2 = sigs[d2]
            ham = bin(l1 ^ l2).count("1") + bin(h1 ^ h2).count("1")
            if ham <= SIMHASH64_MAX_HAMMING:
                expected.add((d1, d2))
    got = {
        (r["d1"], r["d2"]) for r in dedup_simhash64_pairs(spark, sf).collect()
    }
    assert got == expected
