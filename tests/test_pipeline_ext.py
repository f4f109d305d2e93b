"""Semantic + plan-shape tests for the round-3 training-data pipeline
operators (operators/pipeline_ext.py). Cross-engine value parity is
covered by the registry-wide oracle twin (test_oracle_parity); these
tests pin the *invariants* each operator promises."""

from __future__ import annotations

from snowflake_to_postgres_spark.operators.pipeline_ext import (
    PACK_CAPACITY,
    ts_gapfill_locf,
    tx_mixture_plan,
    tx_pack_sequences,
    tx_pii_scrub,
    tx_tfidf_top_terms,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_pii_scrub_removes_all_seeded_pii(spark, sf_dir):
    """Seeded injection adds exactly one email / IP / phone per doc; the
    scrubber must count them and leave zero residual matches."""
    rows = tx_pii_scrub(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_emails >= 1
        assert r.n_ips >= 1
        assert r.n_phones >= 1
        assert r.residual_pii is False


def test_pii_scrub_is_pure_map_stage(spark, sf_dir):
    """Redaction is a projection: no Exchange may appear in the plan —
    this is what makes it free at 100 TB."""
    plan = _plan(tx_pii_scrub(spark, sf_dir))
    assert "Exchange" not in plan


def test_tfidf_topk_shape(spark, sf_dir):
    """≤3 keywords per doc, ranks 1..k unique and contiguous."""
    rows = tx_tfidf_top_terms(spark, sf_dir).collect()
    per_doc: dict[int, list[int]] = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r.rnk)
    assert per_doc
    for ranks in per_doc.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 3


def test_pack_sequences_invariants(spark, sf_dir):
    """Offsets stay inside a sequence; cumulative counts are consistent
    per source; seq_ids are non-decreasing in doc order."""
    rows = tx_pack_sequences(spark, sf_dir).collect()
    assert rows
    by_source: dict[str, list] = {}
    for r in rows:
        assert 0 <= r.start_offset < PACK_CAPACITY
        assert r.seq_id == (r.cum_tokens - r.n_tokens) // PACK_CAPACITY
        by_source.setdefault(r.source, []).append(r)
    for docs in by_source.values():
        docs.sort(key=lambda r: r.doc_id)
        running = 0
        prev_seq = -1
        for r in docs:
            assert r.cum_tokens == running + r.n_tokens
            running = r.cum_tokens
            assert r.seq_id >= prev_seq
            prev_seq = r.seq_id


def test_pack_sequences_no_global_window(spark, sf_dir):
    """The packing window partitions by source — never a single
    partition over the corpus."""
    plan = _plan(tx_pack_sequences(spark, sf_dir))
    assert "Exchange SinglePartition" not in plan


def test_mixture_plan_respects_budget(spark, sf_dir):
    """Rates are valid probabilities; planned volume never exceeds the
    actual per-source volume, and the total plan never exceeds the
    budget (undershoot is allowed when a source is capped at rate 1)."""
    from snowflake_to_postgres_spark.operators.pipeline_ext import (
        MIXTURE_BUDGET_FRACTION,
    )

    rows = tx_mixture_plan(spark, sf_dir).collect()
    assert rows
    total_actual = sum(r.actual_chars for r in rows)
    budget = total_actual * MIXTURE_BUDGET_FRACTION
    for r in rows:
        assert 0.0 < r.rate <= 1.0
        assert r.planned_chars <= r.actual_chars + 1e-6
    uncapped_planned = sum(r.planned_chars for r in rows if r.rate < 1.0)
    capped_target = sum(r.target_chars for r in rows if r.rate >= 1.0)
    # every uncapped source hits its target exactly; caps only shrink
    assert uncapped_planned + capped_target <= budget * (1 + 1e-9) + 1e-6
    assert sum(r.planned_chars for r in rows) <= budget + 1e-6


def test_gapfill_locf_semantics(spark, sf_dir):
    """The grid is dense per event_type (consecutive hours); every gap
    row after the first observation carries the previous value
    forward; observed rows pass through unchanged."""
    rows = ts_gapfill_locf(spark, sf_dir).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    assert by_type
    for seq in by_type.values():
        seq.sort(key=lambda r: r.h)
        prev = None
        for i, r in enumerate(seq):
            if i > 0:
                assert (r.h - seq[i - 1].h).total_seconds() == 3600
            if r.is_gap:
                assert r.s_value is None
                assert r.n_events == 0
                assert r.filled_value == prev
            else:
                assert r.filled_value == r.s_value
                prev = r.s_value
        # first and last grid points are observations by construction
        assert seq[0].is_gap is False and seq[-1].is_gap is False


def test_pipe_clean_corpus_single_shuffle(spark, sf_dir):
    """The composed cleaning pipeline must stay one job with exactly
    one Exchange (the content-digest dedup shuffle): quality filtering
    happens before it, sampling after it, neither adds a shuffle."""
    from snowflake_to_postgres_spark.operators.pipeline_ext import pipe_clean_corpus

    df = pipe_clean_corpus(spark, sf_dir)
    plan = _plan(df)
    assert plan.count("Exchange") == 1
    assert "Exchange SinglePartition" not in plan


def test_pipe_clean_corpus_stages_monotone(spark, sf_dir):
    """Each stage only removes rows; survivors carry valid rates and
    pass the quality gate by construction."""
    from snowflake_to_postgres_spark.operators.pipeline_ext import pipe_clean_corpus
    from snowflake_to_postgres_spark.sources import load_table

    total = load_table(spark, sf_dir, "documents").count()
    rows = pipe_clean_corpus(spark, sf_dir).collect()
    assert 0 < len(rows) <= total
    for r in rows:
        assert r.n_tokens >= 10
        assert r.mean_word_len < 8.0
        assert 0.0 < r.keep_rate <= 1.0


def test_hashed_features_dense_assembly(spark, sf_dir):
    """Dense array assembly agrees with the oracle-checked sparse COO:
    right length, zero-filled gaps, values at the sparse positions."""
    from pyspark.sql import functions as F

    from snowflake_to_postgres_spark.operators.pipeline_ext import (
        HASH_DIM,
        hashed_features_dense,
        tx_hashed_features,
    )

    sparse = tx_hashed_features(spark, sf_dir)
    dense = hashed_features_dense(sparse)
    row = dense.orderBy("doc_id").first()
    assert len(row["vector"]) == HASH_DIM
    doc_sparse = {
        r["dim_idx"]: r["weight"]
        for r in sparse.filter(F.col("doc_id") == row["doc_id"]).collect()
    }
    for i, v in enumerate(row["vector"]):
        assert v == doc_sparse.get(i, 0)
    assert dense.count() == sparse.select("doc_id").distinct().count()


def test_weighted_downsample_is_weight_proportional(spark, sf_dir):
    """Kept set must be exactly the deterministic Poisson draw: recompute
    the integer inclusion test in Python over the raw docs and compare
    doc_id sets; kept fraction lands near the target rate; within the
    kept set, heavier docs have higher p_keep."""
    from hashlib import md5 as _md5

    from snowflake_to_postgres_spark.operators.pipeline_ext import (
        DOWNSAMPLE_RATE_DEN,
        DOWNSAMPLE_RATE_NUM,
        _HASH_SPAN,
        tx_weighted_downsample,
    )
    from snowflake_to_postgres_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars").collect()
    sw = sum(r["n_chars"] for r in docs)
    n = len(docs)
    expected = {
        r["doc_id"]
        for r in docs
        if int(_md5(str(r["doc_id"]).encode()).hexdigest()[:8], 16)
        * DOWNSAMPLE_RATE_DEN * sw
        < r["n_chars"] * DOWNSAMPLE_RATE_NUM * _HASH_SPAN * n
    }
    got = tx_weighted_downsample(spark, sf_dir).collect()
    assert {r["doc_id"] for r in got} == expected
    frac = len(got) / n
    target = DOWNSAMPLE_RATE_NUM / DOWNSAMPLE_RATE_DEN
    assert abs(frac - target) < 0.12  # Poisson noise at fixture sizes
    for r in got:
        assert 0.0 < r["p_keep"] <= 1.0


def test_weighted_sample_topk_is_aes(spark, sf_dir):
    """The kept set must be the exact A-ES draw: recompute ln(u)/w keys
    in Python (same md5-uniform, same grid snap, same tie-break) and
    compare the per-source top-k doc_id lists. Also pins the invariants:
    exactly min(k, |source|) rows per source, ranks dense from 1."""
    import math
    from collections import defaultdict
    from hashlib import md5 as _md5

    from snowflake_to_postgres_spark.operators.pipeline_ext import (
        _HASH_SPAN,
        WSAMPLE_GRID,
        WSAMPLE_K,
        tx_weighted_sample_topk,
    )
    from snowflake_to_postgres_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "source", "doc_id", "n_chars"
    ).collect()
    by_src = defaultdict(list)
    for r in docs:
        u = (int(_md5(str(r["doc_id"]).encode()).hexdigest()[:8], 16) + 1.0) / float(
            _HASH_SPAN
        )
        gkey = math.floor(math.log(u) / max(r["n_chars"], 1) * WSAMPLE_GRID + 0.5)
        by_src[r["source"]].append((-gkey, r["doc_id"]))
    expected = {
        src: [d for _, d in sorted(rows)[:WSAMPLE_K]] for src, rows in by_src.items()
    }

    got = defaultdict(list)
    for r in tx_weighted_sample_topk(spark, sf_dir).collect():
        got[r["source"]].append((r["sample_rank"], r["doc_id"]))
    for src, rows in got.items():
        assert [rk for rk, _ in sorted(rows)] == list(range(1, len(rows) + 1))
    assert {s: [d for _, d in sorted(rows)] for s, rows in got.items()} == expected
    for src, rows in expected.items():
        assert len(got[src]) == min(WSAMPLE_K, len(by_src[src]))


def test_mixture_draw_realizes_plan(spark, sf_dir):
    """Every planned source appears (rates are well above zero at
    fixture sizes), and realized char volume tracks the plan within
    Poisson noise; rate=1 sources must be drawn completely."""
    from snowflake_to_postgres_spark.operators.pipeline_ext import (
        tx_mixture_draw,
        tx_mixture_plan,
    )

    plan = {r["source"]: r for r in tx_mixture_plan(spark, sf_dir).collect()}
    drawn = {r["source"]: r for r in tx_mixture_draw(spark, sf_dir).collect()}
    assert set(drawn) == set(plan)
    for src, d in drawn.items():
        p = plan[src]
        assert d["drawn_docs"] <= p["n_docs"]
        if p["rate"] >= 1.0:
            assert d["drawn_docs"] == p["n_docs"]
            assert d["drawn_chars"] == p["actual_chars"]
        else:
            assert 0 < d["drawn_chars"] <= p["actual_chars"]
            # Poisson noise shrinks with source size: ±3/sqrt(expected
            # draws) around 1.0 (≈±0.95 at 10 docs, ±0.3 at 100)
            import math

            band = 3.0 / math.sqrt(max(1.0, p["rate"] * p["n_docs"]))
            assert abs(d["realization"] - 1.0) < max(band, 0.2), (src, band)


def test_lm_heldout_scores_only_val_docs(spark, sf_dir):
    """Held-out eval scores exactly the val split's multi-token docs, and
    a val doc whose bigrams all appear in train scores identically under
    the full-corpus scorer's smoothing formula with train counts."""
    from snowflake_to_postgres_spark.operators.pipeline_ext import (
        SPLIT_TRAIN_PCT,
        SPLIT_VAL_PCT,
        tx_lm_heldout_ppl,
        tx_train_split,
    )
    from snowflake_to_postgres_spark.sources import load_table
    import pyspark.sql.functions as F

    split = {r["doc_id"]: r["split"] for r in tx_train_split(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    multi = {r["doc_id"] for r in docs if len(r["text"].lower().split(" ")) >= 2}
    got = tx_lm_heldout_ppl(spark, sf_dir).collect()
    assert {r["doc_id"] for r in got} == {
        d for d, s in split.items() if s == "val" and d in multi
    }
    for r in got:
        assert 0 <= r["n_unseen"] <= r["n_bigrams"]
        assert r["avg_logprob"] < 0


def test_dense_ids_kernel(spark):
    """dense_ids assigns exactly 0..N-1 in key order across bucket
    boundaries, with gapped and clustered keys (empty buckets, buckets
    holding one row, buckets holding many)."""
    from snowflake_to_postgres_spark.operators.pipeline_ext import (
        DENSE_ID_BUCKET,
        dense_ids,
    )

    keys = (
        list(range(5))                        # one dense run in bucket 0
        + [DENSE_ID_BUCKET * 3 + 7]           # lone row after empty buckets
        + [DENSE_ID_BUCKET * 9 + i for i in range(DENSE_ID_BUCKET)]  # full bucket
        + [10**9, 10**9 + 1]                  # far tail
    )
    import random

    shuffled = keys[:]
    random.Random(7).shuffle(shuffled)  # input order must not matter
    df = spark.createDataFrame([(k,) for k in shuffled], "k bigint")
    got = {r["k"]: r["dense_id"] for r in dense_ids(df, "k").collect()}
    expected = {k: i for i, k in enumerate(sorted(keys))}
    assert got == expected


def test_negative_pairs_invariants(spark, sf_dir):
    """Every document draws exactly NEG_K negatives, never itself, all
    partners exist in the corpus, and the draw replays identically."""
    from snowflake_to_postgres_spark.operators.pipeline_ext import (
        NEG_K,
        tx_negative_pairs,
    )
    from snowflake_to_postgres_spark.sources import load_table

    docs = {r["doc_id"] for r in
            load_table(spark, sf_dir, "documents").select("doc_id").collect()}
    rows = tx_negative_pairs(spark, sf_dir).collect()
    assert len(rows) == NEG_K * len(docs)
    from collections import Counter

    per_doc = Counter(r["doc_id"] for r in rows)
    assert set(per_doc) == docs and set(per_doc.values()) == {NEG_K}
    for r in rows:
        assert r["neg_doc_id"] in docs
        assert r["neg_doc_id"] != r["doc_id"]
    replay = tx_negative_pairs(spark, sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, replay))
