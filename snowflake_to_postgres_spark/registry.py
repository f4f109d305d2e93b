"""Query registry: the single source of truth behind ``__spark_entry__``.

Every implemented operator from SURVEY.md §2 (plus the LLM-pipeline
extensions) registers a :class:`QuerySpec` here: a PySpark callable
``(spark, sf_dir) -> DataFrame`` and, where SQL-expressible, the exact
DuckDB oracle SQL the driver runs side-by-side.

Two cross-engine determinism rules are enforced *centrally* here rather
than per-query:

1. **No DECIMAL ever leaves a query.** Exact decimal math stays internal
   (it is what makes SUMs order-independent — see operators/common.py),
   but the final projection of every registered query casts DecimalType
   columns to ``double``. Rationale: a collected ``Decimal('1234.50')``
   and the oracle's ``1234.5`` are value-identical yet hash differently
   under scale-keeping canonicalization (round-1 driver signal: 15
   hash-fails, all value-identical). A double of the same exact decimal
   is bit-identical in both engines.
2. **Oracles mirror the cast.** ``_ORACLE_DOUBLE_COLS`` lists, per query,
   the decimal output columns of its DuckDB oracle; ``oracle_sql()``
   wraps those in ``CAST(.. AS DOUBLE)`` via DuckDB's ``* REPLACE`` so
   schema and values match the Spark side exactly.
   ``tests/test_oracle_parity.py::test_no_decimal_outputs`` keeps the map
   complete: it fails if either engine still emits a decimal column.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    doc: str = ""
    #: construction-phase plan probes (round-7 verdict #2). Queries whose
    #: construction collapses lineage before returning (localCheckpoint
    #: iterations, sketch collects, driver-side fits) audit as 0-node
    #: plans — the expensive per-round/sketch-phase plans never reach the
    #: global cartesian/nested-loop guard. A probe fn returns
    #: {label: un-executed DataFrame} exposing those plans structurally
    #: (literal stand-ins where construction would collect — the plan
    #: SHAPE is what the guard checks). Audited by tools/plan_audit.py as
    #: `name::label` rows and by the pytest global guard.
    probes: Callable[[SparkSession, str], dict[str, DataFrame]] | None = None


# Decimal-typed output columns of each DuckDB oracle (from DESCRIBE), cast
# to DOUBLE so both engines emit the same float64. Spark-side casting is
# automatic (schema-driven, see _normalize_decimals); this map exists only
# because SQL cannot express "cast whichever columns are decimal".
_ORACLE_DOUBLE_COLS: dict[str, tuple[str, ...]] = {
    "q1_pricing_summary": ("sum_qty", "sum_base_price", "sum_disc_price", "sum_charge"),
    "s1_scan_filter_projection": ("price",),
    "p2_where_pushdown": ("o_totalprice",),
    "p4_order_limit": ("o_totalprice",),
    "a3_fingerprint_by_date": ("s_quantity", "s_extendedprice", "s_discount", "s_tax"),
    "a7_distinct_agg": ("s_totalprice",),
    "j1_equi_join_chain": ("s_acctbal",),
    "j2_multiway_join_topk": ("revenue",),
    "j3_point_lookup_join": ("s_qty",),
    "w1_topk_per_group": ("o_totalprice",),
    "w3_running_sum": ("running_spend",),
    "w4_rank_dense": ("c_acctbal",),
    "g1_rollup": ("s_qty",),
    "ivm_agg_refresh": ("s_price",),
    "g3_having": ("s_qty",),
    "g4_grouping_sets": ("s_qty",),
    "f2_nvl_coalesce": ("s_disc_nvl",),
    "f6_date_trunc": ("s_total",),
    "f12_casts": ("price_number", "price_numeric_38_4"),
    "val_fingerprint_diff": ("src_s_qty", "tgt_s_qty"),
    "x_sessionization": ("s_value",),
    "x_q5_local_volume": ("revenue",),
    "x_q10_returned_items": ("lost_revenue",),
    "x_q14_conditional_agg": ("promo_revenue", "total_revenue"),
    "x_correlated_subquery": ("s_price",),
    "x_q18_large_volume": ("o_totalprice", "total_qty"),
    "sim_topk_bruteforce": ("cosine",),
    "sim_ivf_topk": ("cosine",),
    "sim_rp_lsh_topk": ("cosine",),
    "sim_doc_hashed_topk": ("cosine",),
    "dedup_embedding_cosine_pairs": ("cosine",),
    "a10_unpivot": ("s_value",),
    "a12_stats_moments": ("stddev_qty", "corr_qty_price"),
    "fit_linear_by_group": ("slope", "intercept", "r2"),
    "tx_bigram_lm_score": ("avg_logprob",),
    "tx_lm_heldout_ppl": ("avg_logprob",),
    "tx_kn_lm_score": ("kn_logprob",),
    "tx_pmi_pairs": ("pmi",),
    "diag_heavy_keys": ("share",),
    "sim_pq_adc_rescore_topk": ("cosine",),
    "sim_ivf_pq_topk": ("cosine",),
    "sim_hard_negatives": ("cosine",),
    "sim_ann_index_search": ("cosine",),
    "sim_truncated_topk": ("cosine",),
    "sim_hamming_rerank": ("cosine",),
    "sim_range_search": ("cosine",),
    "sim_filtered_ann": ("cosine",),
    "x_cdc_apply": ("last_value",),
    "x_funnel": ("conversion",),
    "x_session_funnel": ("conversion",),
    "ts_resample_ohlc": ("open", "close", "high", "low"),
    "ts_anomaly_zscore": ("zscore",),
    "xj_asof_join": ("p_value",),
    "xj_asof_forward": ("p_value",),
    "xj_range_join": ("s_price",),
    "st_windowed_agg": ("s_value",),
    "ts_gapfill_locf": ("s_value", "filled_value"),
    "a13_exact_percentiles": ("p50", "p90"),
    "st_enrich_rollup": ("s_value",),
    "st_session_window": ("s_value",),
    "st_ingest_dedup": ("s_value",),
    "st_latest_state": ("last_value",),
    "st_interval_join": ("p_value",),
    "st_interval_join_outer": ("p_value",),
    "x_cohort_ltv": ("revenue", "cum_revenue"),
    "x_q6_banded_revenue": ("revenue",),
    "w6_range_frame": ("spend_30d",),
    "a14_percentile_cont": ("p50_cont", "p90_cont"),
    "x_q20_excess_suppliers": ("s_acctbal",),
    "x_q2_min_cost_supplier": ("cost",),
    "x_q8_market_share": ("nation_vol", "total_vol"),
    "x_q9_product_profit": ("profit",),
    "x_q11_important_stock": ("part_value",),
    "x_q15_top_supplier": ("total_revenue",),
    "x_q7_volume_shipping": ("revenue",),
    "x_q19_flagged_revenue": ("revenue",),
    "x_q22_dormant_balance": ("totacctbal",),
    "x_q3_shipping_priority": ("revenue",),
    "ts_decompose": ("trend", "seasonal", "residual"),
    "ts_forecast_backtest": ("mae", "mape", "bias"),
    "x_rfm_segmentation": ("monetary",),
    "emb_outliers": ("norm", "zscore"),
}

# The driver's correctness harness checks the FIRST 50 registered queries
# (registry order). This list pins that window so every SURVEY §2 family
# AND every extension family (dedup, similarity, text, multimodal,
# temporal joins, streaming) earns at least one hard-signal row; folded
# variants (e.g. j6 semi vs j5 anti, set_intersect vs set_union) remain
# registered below the window and stay pytest-covered.
_PRIORITY: tuple[str, ...] = (
    # flagship + scans
    "q1_pricing_summary",
    "s1_scan_filter_projection",
    "s3_catalog_columns",
    "s7_row_counts",
    "s13_profile_table",
    # projections / predicates / pagination
    "p1_projection_varchar_cast",
    "p2_where_pushdown",
    "p4_order_limit",
    # aggregation
    "a2_group_count_by_date",
    "a3_fingerprint_by_date",
    "a4_null_counts",
    "a16_kmv_set_ops",
    # joins
    "j1_equi_join_chain",
    "j2_multiway_join_topk",
    "j4_fullouter_key_align",
    "x_attribution",
    # windows / grouping
    "w1_topk_per_group",
    "dedup_lsh_recall",
    "g1_rollup",
    # scalar function translations
    "f1_iff_case",
    "f7_datediff",
    # semi-structured / validation / analytics
    "v1_variant_json_extract",
    "val_fingerprint_diff",
    "x_sessionization",
    # LLM-pipeline extension families. Current window rationale: one
    # hard-signal seat per family — dedup (exact/minhash/simhash64/
    # semantic), warehouse (x_scd2_history), sketch (a18 HLL + a16 KMV
    # + a28 CMS merge). ROUND-14 ROTATION (round-13 verdict #2: the
    # window had not rotated since round 9 and covered none of rounds
    # 10-13's families): seated val_referential_integrity (validation),
    # st_mixture (observability leg 6), a28_cms_merge (sketch merge
    # algebra), emb_kmeans (embedding ops), sim_filtered_ann (two-tier
    # filtered ANN); demoted five single-family near-duplicates —
    # tx_weighted_downsample, tx_lm_heldout_ppl, st_latest_state,
    # dedup_incremental_lsh (4th dedup seat), pipe_strip_dup_spans
    # (2nd pipe seat). Full history in OPERATORS.md "Driver-window
    # rotation history"; demoted rows stay registered + FULL-checked
    # below the window.
    "dedup_exact_groups",
    "dedup_minhash_lsh_pairs",
    "dedup_simhash64_pairs",
    "val_referential_integrity",
    "x_scd2_history",
    "dedup_semantic_clusters",
    "a18_hll_distinct",
    # similarity/graph/text seats: graph_pagerank (gridded-recurrence
    # oracle), sim_ann_index_search (production build/search split),
    # sim_ann_recall (the measured recall gate), tx_gopher_gate. See
    # OPERATORS.md rotation history for the rows these displaced.
    "sim_topk_bruteforce",
    "sim_ann_index_search",
    "graph_pagerank",
    "sim_ann_recall",
    "tx_gopher_gate",
    "emb_kmeans",
    "sim_filtered_ann",
    "a28_cms_merge",
    "tx_bpe_pair_counts",
    "ivm_agg_refresh",
    "fit_linear_by_group",
    "layout_hilbert",
    "tx_zipf_fit",
    "pipe_training_corpus",
    "mm_binary_meta",
    "xj_asof_join",
    "st_interval_join",
    "st_session_window",
    "st_mixture",
)


def decimal_free_type(dt):
    """DataType with every DecimalType (at any nesting depth — arrays,
    structs, maps) replaced by DoubleType; None when nothing changes."""
    from pyspark.sql import types as T

    if isinstance(dt, T.DecimalType):
        return T.DoubleType()
    if isinstance(dt, T.ArrayType):
        inner = decimal_free_type(dt.elementType)
        return None if inner is None else T.ArrayType(inner, dt.containsNull)
    if isinstance(dt, T.MapType):
        k = decimal_free_type(dt.keyType)
        v = decimal_free_type(dt.valueType)
        if k is None and v is None:
            return None
        return T.MapType(k or dt.keyType, v or dt.valueType, dt.valueContainsNull)
    if isinstance(dt, T.StructType):
        changed = False
        fields = []
        for f in dt.fields:
            nf = decimal_free_type(f.dataType)
            changed = changed or nf is not None
            fields.append(T.StructField(f.name, nf or f.dataType, f.nullable, f.metadata))
        return T.StructType(fields) if changed else None
    return None


def _normalize_decimals(
    fn: Callable[[SparkSession, str], DataFrame],
) -> Callable[[SparkSession, str], DataFrame]:
    """Wrap a query so its final projection casts DecimalType → double —
    including decimals nested inside arrays/structs/maps (e.g. an
    approx_percentile over a decimal column yields array<decimal>).

    Projection on top of the query plan is narrow — it preserves ordering
    and adds no shuffle; Catalyst collapses it into the final stage.
    """

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pyspark.sql import functions as F

        df = fn(spark, sf_dir)
        casts = {f.name: decimal_free_type(f.dataType) for f in df.schema.fields}
        if not any(t is not None for t in casts.values()):
            return df
        return df.select(
            *[
                F.col(f.name).cast(casts[f.name]).alias(f.name)
                if casts[f.name] is not None
                else F.col(f.name)
                for f in df.schema.fields
            ]
        )

    wrapped.__name__ = getattr(fn, "__name__", "query")
    wrapped.__doc__ = fn.__doc__
    wrapped.__wrapped__ = fn
    return wrapped


def _normalize_oracle(name: str, sql: str) -> str:
    cols = _ORACLE_DOUBLE_COLS.get(name)
    if not cols:
        return sql
    rep = ", ".join(f"CAST({c} AS DOUBLE) AS {c}" for c in cols)
    return f"SELECT * REPLACE ({rep}) FROM (\n{sql}\n) __dec_normalized"


def _all_specs() -> list[QuerySpec]:
    # Imported lazily so `import snowflake_to_postgres_spark` stays cheap.
    from snowflake_to_postgres_spark.operators import (
        analytics_ext,
        bpe,
        breadth,
        dedup,
        graph,
        layout,
        temporal_joins,
        multimodal,
        pipeline_ext,
        relational,
        scalar_funcs,
        similarity,
        text,
        tpch_flavors,
        validation,
        warehouse,
    )
    from snowflake_to_postgres_spark.streaming import queries as streaming_queries

    specs: list[QuerySpec] = []
    for mod in (
        relational,
        scalar_funcs,
        validation,
        analytics_ext,
        tpch_flavors,
        warehouse,
        dedup,
        graph,
        similarity,
        text,
        multimodal,
        breadth,
        temporal_joins,
        pipeline_ext,
        layout,
        bpe,
        streaming_queries,
    ):
        specs.extend(mod.SPECS)
    names = [s.name for s in specs]
    assert len(names) == len(set(names)), "duplicate query names in registry"
    missing = [n for n in _PRIORITY if n not in names]
    assert not missing, f"_PRIORITY names not registered: {missing}"

    rank = {n: i for i, n in enumerate(_PRIORITY)}
    specs.sort(key=lambda s: (rank.get(s.name, len(rank)),))  # stable: rest keep module order

    return [
        QuerySpec(
            name=s.name,
            fn=_normalize_decimals(s.fn),
            oracle=None if s.oracle is None else _normalize_oracle(s.name, s.oracle),
            doc=s.doc,
            probes=s.probes,
        )
        for s in specs
    ]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {s.name: s.fn for s in _all_specs()}


def oracle_sql() -> dict[str, str]:
    return {s.name: s.oracle for s in _all_specs() if s.oracle is not None}


def plan_probes() -> dict[str, Callable[[SparkSession, str], dict[str, DataFrame]]]:
    """Per-query construction-phase plan probes (see QuerySpec.probes).
    A probe fn shared by twin specs (bpe merges/tokenize, cluster
    stats/components, pagerank bucketed/converged) is returned ONCE
    under the first registered name — the consumers (plan audit, pytest
    guard) would otherwise compile and render identical plans twice."""
    out: dict[str, Callable[[SparkSession, str], dict[str, DataFrame]]] = {}
    seen: set[int] = set()
    for s in _all_specs():
        if s.probes is not None and id(s.probes) not in seen:
            seen.add(id(s.probes))
            out[s.name] = s.probes
    return out
