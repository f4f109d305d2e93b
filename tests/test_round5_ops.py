"""Round-5 operator tests: semantic dedup, boilerplate stripping,
hash-based train/val/test split, and closed-form per-group OLS.

Oracle parity for each is covered by the registry sweep
(tools/check_correctness.py); these tests pin the *semantics* the oracle
can't see — invariants, stability properties, and agreement with an
independent numpy solve.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from snowflake_to_postgres_spark.operators.pipeline_ext import (
    SPLIT_TRAIN_PCT,
    SPLIT_VAL_PCT,
    fit_linear_by_group,
    tx_train_split,
)
from snowflake_to_postgres_spark.operators.similarity import (
    SEMDEDUP_COS,
    dedup_semantic_clusters,
)
from snowflake_to_postgres_spark.operators.text import (
    BP_NGRAM,
    BP_TOP_K,
    tx_boilerplate_strip,
)
from snowflake_to_postgres_spark.sources import load_table


# ---------------------------------------------------------------- semantic

def test_semantic_dedup_covers_every_vector_once(spark, sf_dir):
    emb_n = load_table(spark, sf_dir, "embeddings").count()
    res = dedup_semantic_clusters(spark, sf_dir)
    rows = res.collect()
    assert len(rows) == emb_n
    assert len({r["vec_id"] for r in rows}) == emb_n


def test_semantic_dedup_drops_only_over_threshold_pairs(spark, sf_dir):
    """Every dropped vector must have a KEPT-or-dropped lower-id neighbor
    in the same cell with cosine >= SEMDEDUP_COS (recomputed in numpy at
    float64 — tolerance covers the decimal grid difference)."""
    emb = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    res = dedup_semantic_clusters(spark, sf_dir).collect()
    cell_of = {r["vec_id"]: r["cell"] for r in res}
    dropped = [r["vec_id"] for r in res if not r["kept"]]
    assert dropped, "fixture should produce at least one semantic dup"
    for v in dropped:
        mates = [u for u in cell_of if cell_of[u] == cell_of[v] and u < v]
        best = max(
            float(emb[v] @ emb[u] / (np.linalg.norm(emb[v]) * np.linalg.norm(emb[u])))
            for u in mates
        )
        assert best >= SEMDEDUP_COS - 1e-6, (v, best)


def test_semantic_dedup_kept_pairs_below_threshold_within_cell(spark, sf_dir):
    """No two KEPT vectors in the same cell may exceed the threshold
    with the lower id first — the defining property of the output."""
    emb = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    res = dedup_semantic_clusters(spark, sf_dir).collect()
    kept_by_cell: dict[int, list[int]] = {}
    for r in res:
        if r["kept"]:
            kept_by_cell.setdefault(r["cell"], []).append(r["vec_id"])
    checked = 0
    for _, ids in kept_by_cell.items():
        ids.sort()
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                cos = float(
                    emb[a] @ emb[b] / (np.linalg.norm(emb[a]) * np.linalg.norm(emb[b]))
                )
                assert cos < SEMDEDUP_COS + 1e-6, (a, b, cos)
                checked += 1
    assert checked > 0


# ------------------------------------------------------------- boilerplate

def test_boilerplate_strip_rebuild_matches_manual(spark, sf_dir):
    """Recompute the strip in pure Python for the whole fixture and
    compare hashes doc-by-doc."""
    docs = {
        r["doc_id"]: r["text"].lower().split(" ")
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    # document frequency per 3-gram
    df: dict[str, set[int]] = {}
    for d, t in docs.items():
        for i in range(max(1, len(t) - (BP_NGRAM - 1))):
            g = " ".join(t[i : i + BP_NGRAM])
            df.setdefault(g, set()).add(d)
    ranked = sorted(
        df.items(), key=lambda kv: (-len(kv[1]), hashlib.md5(kv[0].encode()).hexdigest())
    )
    bp = {hashlib.md5(g.encode()).hexdigest() for g, _ in ranked[:BP_TOP_K]}
    expected = {}
    for d, t in docs.items():
        covered = set()
        for i in range(max(1, len(t) - (BP_NGRAM - 1))):
            g = " ".join(t[i : i + BP_NGRAM])
            if hashlib.md5(g.encode()).hexdigest() in bp:
                covered.update(range(i, i + BP_NGRAM))
        kept = [tok for j, tok in enumerate(t) if j not in covered]
        expected[d] = (
            len(t),
            len([j for j in covered if j < len(t)]),
            hashlib.md5(" ".join(kept).encode()).hexdigest(),
        )
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["clean_hash"])
        for r in tx_boilerplate_strip(spark, sf_dir).collect()
    }
    assert got == expected


def test_boilerplate_strip_removes_something(spark, sf_dir):
    res = tx_boilerplate_strip(spark, sf_dir)
    assert res.filter(F.col("n_removed") > 0).count() > 0
    # and never removes more than it has
    assert res.filter(F.col("n_removed") > F.col("n_tokens")).count() == 0


def test_boilerplate_set_is_broadcast(spark, sf_dir):
    plan = tx_boilerplate_strip(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


# ------------------------------------------------------------------- split

def test_train_split_fractions_and_determinism(spark, sf_dir):
    res = tx_train_split(spark, sf_dir)
    counts = {r["split"]: r["n"] for r in res.groupBy("split").agg(F.count("*").alias("n")).collect()}
    total = sum(counts.values())
    assert counts["train"] / total == pytest.approx(SPLIT_TRAIN_PCT / 100, abs=0.1)
    assert (counts.get("val", 0) + counts.get("test", 0)) / total == pytest.approx(
        (100 - SPLIT_TRAIN_PCT) / 100, abs=0.1
    )
    # rerun gives the identical assignment (hash, not random)
    a = {(r["doc_id"], r["split"]) for r in res.collect()}
    b = {(r["doc_id"], r["split"]) for r in tx_train_split(spark, sf_dir).collect()}
    assert a == b


def test_train_split_is_subset_stable(spark, sf_dir):
    """A document's split must not depend on which other documents are
    present — the property that makes hash splits leak-proof as the
    corpus grows. Verified by recomputing from the doc_id alone."""
    for r in tx_train_split(spark, sf_dir).collect():
        h = int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:8], 16) % 100
        assert h == r["bucket"]
        expected = "train" if h < SPLIT_TRAIN_PCT else ("val" if h < SPLIT_VAL_PCT else "test")
        assert expected == r["split"]


def test_train_split_no_shuffle(spark, sf_dir):
    plan = tx_train_split(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# --------------------------------------------------------------------- fit

def test_fit_linear_matches_numpy_lstsq(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").collect()
    by_lang: dict[str, list[tuple[int, int]]] = {}
    for r in docs:
        by_lang.setdefault(r["lang"], []).append(
            (len(r["text"].split(" ")), r["n_chars"])
        )
    got = {r["lang"]: r for r in fit_linear_by_group(spark, sf_dir).collect()}
    assert set(got) == set(by_lang)
    for lang, obs in by_lang.items():
        x = np.array([o[0] for o in obs], dtype=np.float64)
        y = np.array([o[1] for o in obs], dtype=np.float64)
        A = np.stack([x, np.ones_like(x)], axis=1)
        (slope, intercept), *_ = np.linalg.lstsq(A, y, rcond=None)
        assert float(got[lang]["slope"]) == pytest.approx(slope, rel=1e-6)
        assert float(got[lang]["intercept"]) == pytest.approx(intercept, rel=1e-4)
        assert got[lang]["n_docs"] == len(obs)
        assert 0.0 <= float(got[lang]["r2"]) <= 1.0


def test_fit_linear_single_aggregation(spark, sf_dir):
    """The whole fit is one hash-aggregate over the corpus: exactly one
    Exchange (by lang) plus the final tiny sort."""
    plan = fit_linear_by_group(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange ")
    assert n_exchanges <= 2, plan  # hashpartition(lang) + rangepartition(sort)


# ---------------------------------------------------------------------- pq

def test_pq_codes_are_argmin_per_block(spark, sf_dir):
    """Every emitted code must be the true argmin subspace centroid
    (numpy float64 recompute; ties broken by centroid id)."""
    from snowflake_to_postgres_spark.operators.similarity import (
        PQ_BLOCKS,
        PQ_CODEBOOK,
        emb_pq_codes,
    )

    emb = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    sub = 64 // PQ_BLOCKS
    got = {(r["vec_id"], r["block"]): r["code"] for r in emb_pq_codes(spark, sf_dir).collect()}
    assert len(got) == len(emb) * PQ_BLOCKS
    mismatch = 0
    for (v, b), code in got.items():
        x = emb[v][b * sub : (b + 1) * sub]
        d = [float(np.sum((x - emb[c][b * sub : (b + 1) * sub]) ** 2)) for c in range(PQ_CODEBOOK)]
        best = min(range(PQ_CODEBOOK), key=lambda c: (d[c], c))
        if best != code:
            # allow only exact-tie discrepancies from the decimal grid
            assert abs(d[best] - d[code]) < 1e-9, (v, b, code, best)
            mismatch += 1
    assert mismatch <= len(got) * 0.01


def test_pq_adc_scores_match_numpy_reconstruction(spark, sf_dir):
    """approx_dot must equal dot(query, PQ-reconstruction(neighbor)) —
    the defining identity of asymmetric distance computation."""
    from snowflake_to_postgres_spark.operators.similarity import (
        PQ_BLOCKS,
        PQ_CODEBOOK,
        emb_pq_codes,
        sim_pq_adc_topk,
    )

    emb = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    sub = 64 // PQ_BLOCKS
    codes = {}
    for r in emb_pq_codes(spark, sf_dir).collect():
        codes.setdefault(r["vec_id"], {})[r["block"]] = r["code"]
    for r in sim_pq_adc_topk(spark, sf_dir).collect():
        q, n = r["qid"], r["neighbor_id"]
        recon = np.concatenate([
            emb[codes[n][b]][b * sub : (b + 1) * sub] for b in range(PQ_BLOCKS)
        ])
        expected = float(emb[q] @ recon)
        assert float(r["approx_dot"]) == pytest.approx(expected, rel=1e-5), (q, n)


def test_quality_deciles_equi_depth(spark, sf_dir):
    """Deciles must cover 0..9, be monotone in the grid score, and be
    near-equi-depth (each decile within 3x of N/10 on the tie-free
    fixture grid)."""
    from snowflake_to_postgres_spark.operators.text import tx_quality_deciles

    rows = tx_quality_deciles(spark, sf_dir).collect()
    n = len(rows)
    assert n == load_table(spark, sf_dir, "documents").count()
    by_dec: dict[int, list[int]] = {}
    for r in rows:
        by_dec.setdefault(r["decile"], []).append(r["q_grid"])
    assert set(by_dec) == set(range(10))
    # monotone: every score in decile d is <= every score in decile d+1
    for d in range(9):
        assert max(by_dec[d]) <= min(by_dec[d + 1])
    for d, scores in by_dec.items():
        assert n / 30 <= len(scores) <= 3 * n / 10, (d, len(scores))


def test_truncated_search_matches_numpy_on_leading_dims(spark, sf_dir):
    """sim_truncated_topk must equal a numpy cosine top-k computed on
    exactly the first MRL_DIMS components — the mechanism contract.

    (Recall vs FULL-dim truth is deliberately NOT gated here: the
    fixture embeddings are i.i.d. random, so no leading-dim importance
    exists and truncation recall sits near the random baseline by
    construction — measured 0.07 at sf0.001. Real MRL-trained
    embeddings concentrate information in the leading block; the
    operator's value claim lives there, its correctness claim here.)"""
    from snowflake_to_postgres_spark.operators.similarity import (
        ANN_EVAL_K,
        MRL_DIMS,
        N_QUERIES,
        sim_truncated_topk,
    )

    emb = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)[:MRL_DIMS]
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    got = {}
    for r in sim_truncated_topk(spark, sf_dir).collect():
        got.setdefault(r["qid"], []).append((r["rank"], r["neighbor_id"]))
    assert set(got) == set(range(N_QUERIES))
    for qid, rows in got.items():
        rows.sort()
        qv = emb[qid]
        scored = sorted(
            (
                (-float(qv @ v / (np.linalg.norm(qv) * np.linalg.norm(v))), nid)
                for nid, v in emb.items()
                if nid != qid
            ),
        )[:ANN_EVAL_K]
        expected = [nid for _, nid in scored]
        assert [nid for _, nid in rows] == expected, (qid, rows, expected)


def test_dup_span_coverage_catches_planted_overlap(spark, tmp_path):
    """Two documents that share ONLY a 12-token boilerplate span (well
    below doc-level near-dup thresholds) must both show exactly that
    span's positions as duplicated; a third unrelated doc shows zero."""
    import pyspark.sql.functions as F

    from snowflake_to_postgres_spark.operators.text import (
        SPAN_LEN,
        tx_dup_span_coverage,
    )

    boiler = "please subscribe to our newsletter for updates and exclusive offers today"
    a = "alpha beta gamma delta epsilon zeta " + boiler + " eta theta iota"
    b = "one two three four five six seven " + boiler + " eight nine ten"
    c = "totally unrelated words that repeat nothing from the others at all here"
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, c)], "doc_id BIGINT, text STRING"
    ).withColumn("lang", F.lit("en")).withColumn("source", F.lit("t")) \
     .withColumn("n_chars", F.length("text"))
    sf_dir = str(tmp_path / "planted")
    df.write.parquet(sf_dir + "/documents.parquet")

    rows = {r["doc_id"]: r for r in tx_dup_span_coverage(spark, sf_dir).collect()}
    n_boiler = len(boiler.split(" "))
    assert n_boiler >= SPAN_LEN
    # duplicated windows are exactly the boiler's internal SPAN_LEN
    # windows; their union covers exactly the boiler tokens
    assert rows[1]["dup_tokens"] == n_boiler
    assert rows[2]["dup_tokens"] == n_boiler
    assert rows[3]["dup_tokens"] == 0
    assert 0 < rows[1]["dup_ratio"] < 1


def test_strip_dup_spans_keeps_first_occurrence(spark, tmp_path):
    """The boilerplate span survives in the first document (by doc_id)
    and is stripped from the second; the unrelated doc is untouched
    (cleaned_md5 == md5 of its own lowercased text)."""
    import hashlib

    import pyspark.sql.functions as F

    from snowflake_to_postgres_spark.operators.text import pipe_strip_dup_spans

    boiler = "please subscribe to our newsletter for updates and exclusive offers today"
    a = "alpha beta gamma delta epsilon zeta " + boiler + " eta theta iota"
    b = "one two three four five six seven " + boiler + " eight nine ten"
    c = "totally unrelated words that repeat nothing from the others at all here"
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, c)], "doc_id BIGINT, text STRING"
    ).withColumn("lang", F.lit("en")).withColumn("source", F.lit("t")) \
     .withColumn("n_chars", F.length("text"))
    sf_dir = str(tmp_path / "planted_strip")
    df.write.parquet(sf_dir + "/documents.parquet")

    rows = {r["doc_id"]: r for r in pipe_strip_dup_spans(spark, sf_dir).collect()}
    n_boiler = len(boiler.split(" "))
    # doc 1 holds every span's first occurrence -> fully intact
    assert rows[1]["n_after"] == rows[1]["n_before"]
    assert rows[1]["cleaned_md5"] == hashlib.md5(a.encode()).hexdigest()
    # doc 2 loses exactly the boilerplate tokens
    assert rows[2]["n_before"] - rows[2]["n_after"] == n_boiler
    expected_b = "one two three four five six seven eight nine ten"
    assert rows[2]["cleaned_md5"] == hashlib.md5(expected_b.encode()).hexdigest()
    # doc 3 untouched
    assert rows[3]["n_after"] == rows[3]["n_before"]
    assert rows[3]["cleaned_md5"] == hashlib.md5(c.encode()).hexdigest()
