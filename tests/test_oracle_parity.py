"""The local twin of the driver's CORRECTNESS gate: every registered query
with an oracle must match DuckDB exactly at the test scale factor."""

from __future__ import annotations

import pytest

from snowflake_to_postgres_spark.registry import _all_specs
from tests.oracle_compare import compare_frames

SPECS = [s for s in _all_specs() if s.oracle is not None]


@pytest.mark.parametrize("spec", SPECS, ids=[s.name for s in SPECS])
def test_query_matches_oracle(spark, duck, sf_dir, spec):
    sdf = spec.fn(spark, sf_dir)
    rel = duck.execute(spec.oracle)
    ok, msg = compare_frames(sdf, rel)
    assert ok, f"{spec.name}: {msg}"


def test_all_queries_run(spark, sf_dir):
    """Queries without an oracle must still execute and have a stable schema."""
    from snowflake_to_postgres_spark.registry import queries

    for name, fn in queries().items():
        df = fn(spark, sf_dir)
        assert df.columns, name
        df.limit(1).collect()


def test_no_decimal_outputs(spark, duck, sf_dir):
    """Round-1 driver lesson: DecimalType output hash-fails on trailing-zero
    scale even when values are identical. No registered query — Spark side
    or oracle side — may emit a decimal column, INCLUDING decimals nested
    in arrays/structs/maps; _ORACLE_DOUBLE_COLS in registry.py must stay
    complete as queries evolve."""
    from pyspark.sql import types as T

    def has_decimal(dt) -> bool:
        if isinstance(dt, T.DecimalType):
            return True
        if isinstance(dt, T.ArrayType):
            return has_decimal(dt.elementType)
        if isinstance(dt, T.MapType):
            return has_decimal(dt.keyType) or has_decimal(dt.valueType)
        if isinstance(dt, T.StructType):
            return any(has_decimal(f.dataType) for f in dt.fields)
        return False

    for s in _all_specs():
        sdf = s.fn(spark, sf_dir)
        dec_cols = [f.name for f in sdf.schema.fields if has_decimal(f.dataType)]
        assert not dec_cols, f"{s.name}: Spark emits decimal cols {dec_cols}"
        if s.oracle is None:
            continue
        desc = duck.execute(f"DESCRIBE ({s.oracle})").fetchall()
        o_dec = [c for c, ty, *_ in desc if "DECIMAL" in ty.upper()]
        assert not o_dec, f"{s.name}: oracle emits decimal cols {o_dec}"


def test_priority_window_covers_families():
    """The driver checks only the first 50 registered queries; pin that
    window to cover every SURVEY §2 family and every extension family."""
    names = [s.name for s in _all_specs()][:50]
    for family_rep in (
        "q1_", "s1_", "s3_", "s7_", "s13_",            # scans/catalog/profile
        "p1_", "p2_", "p4_",                           # project/filter/page
        "a2_", "a3_", "a4_", "a16_",                   # aggregation + set-op sketch
        "j1_", "j2_", "j4_", "x_attribution",          # joins + event join
        "w1_", "dedup_lsh_recall",                     # windows + recall gate
        "g1_",                                         # grouping
        "f1_", "f7_",                                  # functions
        "v1_", "val_fingerprint",                      # variant / validation
        "x_sessionization",                            # analytics
        # dedup: exact, LSH near-dup, simhash, semantic (embedding).
        # Round-14 rotation (round-13 verdict #2): the 4th dedup seat
        # (dedup_incremental_lsh) gave way to the validation family's
        # val_referential_integrity; exact containment/incremental
        # twins were already demoted in round 9.
        "dedup_exact", "dedup_minhash_lsh", "dedup_simhash64_pairs",
        "val_referential_integrity", "dedup_semantic",
        "x_scd2_history", "a18_hll_distinct",
        # similarity: exact + the materialized IVF+PQ index search
        # (round-8: replaces its in-query twin sim_ivf_pq_topk, same
        # oracle) + measured recall (whose oracle composes the RP-LSH
        # path, demoted for graph_pagerank in round 7) + the two-tier
        # filtered ANN (round 14)
        "sim_topk_bruteforce", "sim_ann_index_search", "sim_ann_recall",
        "sim_filtered_ann",
        # graph / embedding ops (emb_kmeans seated in round 14)
        "graph_pagerank", "emb_kmeans",
        # sketch merge algebra (round 14)
        "a28_cms_merge",
        # text / featurization / pipeline / layout / multimodal
        # (round-8: tx_gopher_gate replaces tx_token_stats — the gate's
        # signals subsume the token counts; round 14 demoted
        # tx_weighted_downsample / tx_lm_heldout_ppl /
        # pipe_strip_dup_spans for the seats above)
        "tx_gopher_gate",
        "tx_bpe_pair", "ivm_agg_refresh", "fit_linear",
        "layout_hilbert", "tx_zipf_fit", "pipe_training", "mm_",
        # temporal joins; stream-stream join + session windows + the
        # mixture monitor (round 14, displacing st_latest_state)
        "xj_asof_join", "st_interval_join", "st_session", "st_mixture",
    ):
        assert any(n.startswith(family_rep) for n in names), family_rep
    # demoted near-duplicates must STAY registered (FULL-checked below
    # the window), never silently dropped
    all_names = [s.name for s in _all_specs()]
    for demoted in ("f4_to_date_roundtrip", "f6_date_trunc",
                    "j3_point_lookup_join", "g3_having",
                    "p3_date_range", "a5_minmax_stats", "w2_lag_delta",
                    "f2_nvl_coalesce", "f9_split_to_table",
                    "val_partition_diff", "x_q5_local_volume",
                    # late round-5 rotations: composed/new families in,
                    # single-family near-duplicates out (still FULL-checked)
                    "p5_offset_pagination", "xj_asof_forward",
                    "sim_ivf_topk",
                    "s10_deterministic_sample", "a7_distinct_agg",
                    "tx_boilerplate_strip",
                    "j5_anti_join", "w4_rank_dense",
                    "tx_hashed_features", "tx_bigram_lm_score",
                    # round-6 rotations (verdict #5): near-duplicates of
                    # surviving window rows, demoted but FULL-checked
                    "dedup_fuzzy_corpus", "sim_doc_hashed_topk",
                    "st_windowed_agg",
                    "a15_kmv_distinct", "layout_zorder",
                    "tx_train_split", "pipe_clean_corpus",
                    # round-7 rotations: guaranteed-recall simhash64 and
                    # oracle-backed pagerank in; prefix-simhash and
                    # rp-lsh (covered via sim_ann_recall) out
                    "dedup_simhash_pairs", "sim_rp_lsh_topk",
                    # round-8 rotations: materialized index search and the
                    # composed Gopher gate in; their in-query/basic twins
                    # out (same oracles / subsumed signals)
                    "sim_ivf_pq_topk", "tx_token_stats",
                    # round-9 rotations: warehouse family + oracle HLL in;
                    # the exact containment/incremental twins out (their
                    # banded LSH forms keep the seats)
                    "dedup_containment_pairs", "dedup_incremental",
                    # round-14 rotations (round-13 verdict #2): five
                    # rounds-10-13 family reps in; five single-family
                    # near-duplicates out (all still FULL-checked)
                    "tx_weighted_downsample", "tx_lm_heldout_ppl",
                    "st_latest_state", "dedup_incremental_lsh",
                    "pipe_strip_dup_spans"):
        assert demoted in all_names and demoted not in names, demoted


def test_registry_under_vanilla_session(spark, sf_dir):
    """Driver-harness twin: nothing in queries() may depend on configs set
    by session.get_spark(). Run the events-dependent and timestamp-heavy
    queries on a fresh default-config SparkSession (round-1 errors:
    PARQUET_TYPE_ILLEGAL on TIMESTAMP(NANOS) without nanosAsLong).

    Takes the ``spark`` fixture so an active session is guaranteed even
    when this test runs in isolation (getActiveSession() would otherwise
    be None and the test would silently assert nothing)."""
    from snowflake_to_postgres_spark.sources.tables import _CONFS_APPLIED_MARKER

    # Reset the confs get_spark pins (and the once-per-session marker) so
    # this exercises the load_table runtime path as a fresh session would
    # (a fresh JVM per test is too slow).
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    spark.conf.unset(_CONFS_APPLIED_MARKER)
    try:
        from snowflake_to_postgres_spark.registry import queries

        q = queries()
        for name in ("v1_variant_json_extract", "x_sessionization", "a2_group_count_by_date"):
            df = q[name](spark, sf_dir)
            assert df.limit(1).collect() is not None, name
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
