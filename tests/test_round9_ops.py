"""Round-9 pins: regression tests for the round-8 ADVICE fixes — exact
dense-id bucketing over the full bigint domain, and degenerate
empty-input contracts for the temperature mixture plan, the centroid
drift monitor, and personalized PageRank."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def empty_sf_dir(spark, sf_dir, tmp_path_factory):
    """A fixture dir whose tables carry the real schemas but zero rows."""
    out = tmp_path_factory.mktemp("empty_sf")
    for t in ("documents", "embeddings", "orders", "lineitem"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").limit(0).write.mode(
            "overwrite"
        ).parquet(str(out / f"{t}.parquet"))
    return str(out)


def test_dense_bucket_exact_above_2_53(spark):
    """Round-8 ADVICE: floor(key / 64) routes through double and rounds
    keys above 2^53 (granularity 512 at 2^62), merging up to ~512
    buckets into one. The bucket expression must be exact integer
    division for the whole bigint domain."""
    from snowflake_to_postgres_spark.operators.pipeline_ext import (
        DENSE_ID_BUCKET,
        _dense_bucket,
    )

    big = 2**62
    keys = [
        big - 1, big, big + DENSE_ID_BUCKET - 1, big + DENSE_ID_BUCKET,
        # signed domain: trunc-div would merge the two buckets around 0
        -big, -(DENSE_ID_BUCKET + 1), -DENSE_ID_BUCKET, -1, 0, 1,
    ]
    df = spark.createDataFrame([(k,) for k in keys], "k bigint")
    got = {
        r["k"]: r["b"]
        for r in df.select("k", _dense_bucket("k").alias("b")).collect()
    }
    for k in keys:
        # the old double path puts big-1 into bucket big//64 (it rounds
        # the key up to 2^62 before dividing); exact div keeps it in
        # bucket (big-1)//64 = big//64 - 1.
        assert got[k] == k // DENSE_ID_BUCKET


def test_dense_ids_rank_contract_on_huge_keys(spark):
    """dense_id must equal the 0..N-1 rank of the key even when keys sit
    far above 2^53 and straddle bucket boundaries."""
    from snowflake_to_postgres_spark.operators.pipeline_ext import dense_ids

    big = 2**62
    keys = [3, 64, big - 65, big - 64, big - 1, big, big + 63, big + 64]
    df = spark.createDataFrame([(k,) for k in keys], "k bigint")
    got = {r["k"]: r["dense_id"] for r in dense_ids(df, "k").collect()}
    for rank, k in enumerate(sorted(keys)):
        assert got[k] == rank


def test_mixture_temperature_empty_corpus(spark, empty_sf_dir):
    """Round-8 ADVICE: an empty documents table made float(None) raise.
    The plan must come back well-formed and empty."""
    from snowflake_to_postgres_spark.operators.pipeline_ext import (
        tx_mixture_temperature,
    )

    out = tx_mixture_temperature(spark, empty_sf_dir)
    assert out.count() == 0
    assert out.columns == [
        "source",
        "n_docs",
        "actual_chars",
        "w_sqrt",
        "share",
        "target_chars",
        "rate",
        "planned_chars",
    ]


def test_centroid_drift_empty_corpus(spark, empty_sf_dir):
    """Round-8 ADVICE: int(None) raised on an empty embeddings table and
    a one-sided split divided by zero. Empty input → empty monitor."""
    from snowflake_to_postgres_spark.operators.similarity import (
        emb_centroid_drift,
    )

    out = emb_centroid_drift(spark, empty_sf_dir)
    assert out.count() == 0
    assert out.columns == [
        "cell",
        "n_a",
        "n_b",
        "share_a",
        "share_b",
        "drift",
        "flagged",
    ]


def test_ppr_empty_seed_set(spark, empty_sf_dir):
    """Round-8 ADVICE: ppr() crashed with ZeroDivisionError on an empty
    seed set; graph_ppr must return a well-formed empty frame on the
    degenerate fixture the graph CLI verb claims to handle."""
    from snowflake_to_postgres_spark.operators.pipeline_ext import (
        graph_ppr,
        ppr,
    )

    edges = spark.createDataFrame([(1, 2), (2, 1)], "src bigint, dst bigint")
    with pytest.raises(ValueError, match="seed_nodes"):
        ppr(edges, [])

    out = graph_ppr(spark, empty_sf_dir)
    assert out.count() == 0
    assert out.columns == ["node_kind", "key", "rank"]
    assert [f.dataType.simpleString() for f in out.schema.fields] == [
        "string",
        "bigint",
        "double",
    ]


# ---------------------------------------------------------------------------
# Round-9 operator pins: independent pure-python parity for the new
# sketches / winnowing, constructed-kernel tests for SCD2, MERGE and
# label propagation.
# ---------------------------------------------------------------------------


def _md5_hex(s: str) -> str:
    import hashlib

    return hashlib.md5(s.encode()).hexdigest()


def test_hll_pure_python_parity(spark, duck, sf_dir):
    """The registered HLL's registers, scaled harmonic sum, and snapped
    estimate must equal an independent pure-python HyperLogLog over the
    same values."""
    import math

    from snowflake_to_postgres_spark.operators.analytics_ext import (
        HLL_EST_GRID,
        HLL_M,
        _hll_alpha,
        a18_hll_distinct,
    )

    vals = [r[0] for r in duck.execute("SELECT l_partkey FROM lineitem").fetchall()]
    regs: dict[int, int] = {}
    for v in vals:
        h = int(_md5_hex(str(v))[:15], 16)
        j, w = divmod(h, 1 << 52)
        rho = 53 if w == 0 else 53 - w.bit_length()
        regs[j] = max(regs.get(j, 0), rho)
    v_zero = HLL_M - len(regs)
    s_scaled = sum(1 << (53 - mj) for mj in regs.values()) + v_zero * (1 << 53)
    est = _hll_alpha() * 256.0 * 256.0 * float(1 << 53) / float(s_scaled)
    if est <= 2.5 * HLL_M and v_zero > 0:
        est = HLL_M * math.log(HLL_M / float(v_zero))
    est = math.floor(est * HLL_EST_GRID + 0.5) / HLL_EST_GRID
    exact = len(set(vals))

    row = a18_hll_distinct(spark, sf_dir).collect()[0]
    assert row["v_zero"] == v_zero
    assert row["s_scaled"] == s_scaled
    assert row["hll_estimate"] == est
    assert row["exact_distinct"] == exact
    # the sketch is only useful if it is also accurate
    assert row["rel_error"] < 0.05


def test_cms_pure_python_parity(spark, duck, sf_dir):
    """Count-min estimates must equal an independent pure-python sketch,
    and the overestimate guarantee must hold on every reported key."""
    from collections import Counter

    from snowflake_to_postgres_spark.operators.analytics_ext import (
        CMS_D,
        CMS_TOP,
        CMS_W,
        a19_cms_heavy_hitters,
    )

    vals = [r[0] for r in duck.execute("SELECT l_partkey FROM lineitem").fetchall()]
    cells: Counter = Counter()
    for v in vals:
        for i in range(CMS_D):
            cells[(i, int(_md5_hex(f"{i}|{v}")[:8], 16) % CMS_W)] += 1
    exact = Counter(vals)
    top = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:CMS_TOP]

    rows = a19_cms_heavy_hitters(spark, sf_dir).collect()
    assert [(r["l_partkey"], r["exact_cnt"]) for r in rows] == top
    for r in rows:
        py_est = min(
            cells[(i, int(_md5_hex(f"{i}|{r['l_partkey']}")[:8], 16) % CMS_W)]
            for i in range(CMS_D)
        )
        assert r["cms_estimate"] == py_est
        assert r["never_undercounts"] and r["cms_estimate"] >= r["exact_cnt"]


def test_scd2_constructed_kernel(spark):
    """SCD2 must collapse consecutive identical values, chain valid_to,
    and mark exactly one current row per key."""
    import datetime as dt

    from snowflake_to_postgres_spark.operators import warehouse

    rows = [
        # custkey 1: A -> A (collapse) -> B; same-day conflict on d3
        # resolved to the higher orderkey (B wins over C)
        (10, 1, dt.date(2020, 1, 1), "A"),
        (11, 1, dt.date(2020, 2, 1), "A"),
        (12, 1, dt.date(2020, 3, 1), "C"),
        (13, 1, dt.date(2020, 3, 1), "B"),
        # custkey 2: single version, stays current
        (20, 2, dt.date(2020, 6, 1), "Z"),
    ]
    df = spark.createDataFrame(
        rows, "o_orderkey bigint, o_custkey bigint, o_orderdate date, o_orderpriority string"
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(f"{d}/orders.parquet")
        out = warehouse.x_scd2_history(spark, d).collect()
    got = [
        (r["custkey"], r["priority"], str(r["valid_from"]), str(r["valid_to"]), r["is_current"])
        for r in out
    ]
    assert got == [
        (1, "A", "2020-01-01", "2020-03-01", False),
        (1, "B", "2020-03-01", "None", True),
        (2, "Z", "2020-06-01", "None", True),
    ]


def test_merge_upsert_classification(spark, duck, sf_dir):
    """Every MERGE action class must be present and verifiably correct
    against an independent SQL recomputation of the two snapshots."""
    from snowflake_to_postgres_spark.operators import warehouse

    rows = warehouse.x_merge_upsert(spark, sf_dir).collect()
    by_action = {}
    for r in rows:
        by_action.setdefault(r["action"], 0)
        by_action[r["action"]] += 1
        if r["action"] == "insert":
            assert r["old_priority"] is None and r["merged_priority"] == r["new_priority"]
        elif r["action"] == "retain":
            assert r["new_priority"] is None and r["merged_priority"] == r["old_priority"]
        elif r["action"] == "update":
            assert r["old_priority"] != r["new_priority"]
            assert r["merged_priority"] == r["new_priority"]
        else:
            assert r["old_priority"] == r["new_priority"]
    # the fixture feed straddles the split date, so the interesting
    # classes are non-empty
    assert by_action.get("retain", 0) > 0 and by_action.get("update", 0) > 0
    # post-merge dimension covers every key exactly once
    n_keys = duck.execute("SELECT COUNT(DISTINCT o_custkey) FROM orders").fetchone()[0]
    assert len(rows) == n_keys == len({r["custkey"] for r in rows})


def test_winnowing_pure_python_parity(spark, duck, sf_dir):
    """Winnowing fingerprints must equal an independent pure-python
    implementation (leftmost-min tie-break), and every full window must
    contain at least one selected position (the coverage guarantee)."""
    from snowflake_to_postgres_spark.operators.text import (
        WINNOW_K,
        WINNOW_W,
        tx_winnowing,
    )

    docs = duck.execute("SELECT doc_id, lower(text) FROM documents").fetchall()
    expected = set()
    for doc_id, text in docs:
        toks = text.split(" ")
        n_h = max(1, len(toks) - (WINNOW_K - 1))
        hashes = [
            int(_md5_hex(" ".join(toks[i : i + WINNOW_K]))[:8], 16)
            for i in range(n_h)
        ]
        packed = [h * 1048576 + (i + 1) for i, h in enumerate(hashes)]
        for s in range(max(1, n_h - (WINNOW_W - 1))):
            c = min(packed[s : s + WINNOW_W])
            expected.add((doc_id, c % 1048576, c // 1048576))
    got = {
        (r["doc_id"], r["fp_pos"], r["fp_hash"])
        for r in tx_winnowing(spark, sf_dir).collect()
    }
    assert got == expected
    # coverage: within each doc, selected positions are never more than
    # w apart (Schleimer et al. property 2)
    by_doc = {}
    for d, p, _ in got:
        by_doc.setdefault(d, []).append(p)
    for d, ps in by_doc.items():
        ps = sorted(ps)
        assert all(b - a <= WINNOW_W for a, b in zip(ps, ps[1:])), d


def test_range_search_vs_topk_consistency(spark, sf_dir):
    """Every top-k neighbor whose cosine clears RANGE_TAU must appear in
    the range result with the identical score, and every range hit must
    clear the floor."""
    from snowflake_to_postgres_spark.operators.similarity import (
        RANGE_TAU,
        sim_range_search,
        sim_topk_bruteforce,
    )

    rng = {
        (r["qid"], r["neighbor_id"]): float(r["cosine"])
        for r in sim_range_search(spark, sf_dir).collect()
    }
    assert rng, "fixture should produce range hits"
    assert all(c >= RANGE_TAU for c in rng.values())
    for r in sim_topk_bruteforce(spark, sf_dir).collect():
        if float(r["cosine"]) >= RANGE_TAU:
            key = (r["qid"], r["neighbor_id"])
            assert key in rng and rng[key] == float(r["cosine"])


def test_label_prop_two_cliques(spark):
    """Constructed kernel: two weight-10 triangles joined by a weight-1
    bridge must resolve to two communities labelled by each side's
    smallest dominant label."""
    from snowflake_to_postgres_spark.operators.graph import label_propagation

    edges = spark.createDataFrame(
        [
            (1, 2, 10), (1, 3, 10), (2, 3, 10),
            (4, 5, 10), (4, 6, 10), (5, 6, 10),
            (3, 4, 1),
        ],
        "u bigint, v bigint, w bigint",
    )
    got = {r["node"]: r["label"] for r in label_propagation(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 4}


def test_bloom_pure_python_parity(spark, duck, sf_dir):
    """The bloom verdict counts must equal an independent pure-python
    filter, no member may be missed, and at m = 8n the fp path must be
    real arithmetic (rate bounded, not structurally zero)."""
    from snowflake_to_postgres_spark.operators.analytics_ext import (
        BLOOM_K,
        BLOOM_SPEND,
        _bloom_m_bits,
        a20_bloom_membership,
    )

    keys = {
        r[0]
        for r in duck.execute(
            f"SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > {BLOOM_SPEND}"
        ).fetchall()
    }
    probes = [
        r[0] for r in duck.execute("SELECT c_custkey FROM customer").fetchall()
    ]
    m = _bloom_m_bits(len(keys))
    bits = {
        int(_md5_hex(f"{i}|{v}")[:8], 16) % m
        for v in keys
        for i in range(BLOOM_K)
    }
    cand = {
        v
        for v in probes
        if all(int(_md5_hex(f"{i}|{v}")[:8], 16) % m in bits for i in range(BLOOM_K))
    }
    row = a20_bloom_membership(spark, sf_dir).collect()[0]
    assert row["n_keys"] == len(keys)
    assert row["m_bits"] == m
    assert row["n_probe"] == len(probes)
    assert row["candidates"] == len(cand)
    assert row["true_matches"] == len(cand & keys) == len(keys & set(probes))
    assert row["false_positives"] == len(cand - keys)
    assert row["no_false_negatives"]
    # m = 8n, k = 3 -> expected fp ~3%; a structural-zero fp path or a
    # saturated filter would both fail this band
    assert 0.0 <= row["fp_rate"] < 0.2


def test_cdc_apply_tombstone_semantics(spark):
    """Constructed CDC log: the last op per key decides life or death —
    an 'error' tombstone deletes (NULL value), any later upsert
    resurrects."""
    import datetime as dt

    from snowflake_to_postgres_spark.operators.warehouse import x_cdc_apply

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: upsert then tombstone -> deleted
        (0, t0, 1, "view", 1.0, "{}"),
        (1, t0 + dt.timedelta(minutes=1), 1, "error", 0.0, "{}"),
        # user 2: tombstone then upsert -> resurrected with 7.5
        (2, t0, 2, "error", 0.0, "{}"),
        (3, t0 + dt.timedelta(minutes=1), 2, "purchase", 7.5, "{}"),
        # user 3: same-ts tie resolved by event_id (5 wins over 4)
        (4, t0, 3, "click", 1.0, "{}"),
        (5, t0, 3, "error", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(f"{d}/events.parquet")
        out = {r["user_id"]: r for r in x_cdc_apply(spark, d).collect()}
    assert out[1]["is_deleted"] and out[1]["last_value"] is None
    assert not out[2]["is_deleted"] and float(out[2]["last_value"]) == 7.5
    assert out[3]["is_deleted"] and out[3]["n_ops"] == 2


def test_stream_cdc_tombstones_match_batch(spark, sf_dir, tmp_path):
    """The streaming CDC pipeline (bootstrap + foreachBatch version-wins
    MERGE) must implement x_cdc_apply's tombstone semantics end-to-end:
    reading the final state table with the delete interpretation
    ('error' = tombstone) equals the batch operator over ALL events —
    deletes retained as flagged rows until compaction, the standard
    log-structured contract."""
    from pyspark.sql import functions as F

    from snowflake_to_postgres_spark.operators.warehouse import x_cdc_apply
    from snowflake_to_postgres_spark.sources import load_table
    from snowflake_to_postgres_spark.streaming.pipeline import (
        bootstrap_latest_state,
        upsert_latest_stream,
    )

    events = load_table(spark, sf_dir, "events")
    cutoff = events.selectExpr(
        "timestamp_micros(cast(percentile_cont(0.5) WITHIN GROUP "
        "(ORDER BY unix_micros(ts)) AS bigint)) AS m"
    ).collect()[0]["m"]
    target = str(tmp_path / "state")
    bootstrap_latest_state(events.filter(events.ts < cutoff), target)
    upsert_latest_stream(spark, sf_dir, target, str(tmp_path / "ckpt"), since=cutoff)

    state = spark.read.parquet(target)
    got = {
        r["user_id"]: (r["is_deleted"], r["last_type"])
        for r in state.select(
            "user_id",
            (F.col("event_type") == "error").alias("is_deleted"),
            F.col("event_type").alias("last_type"),
        ).collect()
    }
    exp = {
        r["user_id"]: (r["is_deleted"], r["last_type"])
        for r in x_cdc_apply(spark, sf_dir).collect()
    }
    assert got == exp
    assert any(d for d, _ in exp.values()), "fixture should contain tombstones"


def test_compaction_plan_properties(spark, duck, sf_dir):
    """Sequential bin packing: bins are contiguous in layout order,
    numbered by the exclusive prefix sum, and every bin except possibly
    the last crosses the target (greedy closes a bin only after
    reaching it)."""
    from snowflake_to_postgres_spark.operators.layout import (
        COMPACT_TARGET_ROWS,
        layout_compaction_plan,
    )

    rows = layout_compaction_plan(spark, sf_dir).collect()
    total = duck.execute("SELECT COUNT(*) FROM orders").fetchone()[0]
    assert sum(r["rows"] for r in rows) == total
    # order-preserving: bin ids are non-decreasing along file_month
    bins = [r["bin"] for r in rows]
    assert bins == sorted(bins)
    # prefix-sum rule replayed in python
    cum = 0
    for r in rows:
        assert r["bin"] == cum // COMPACT_TARGET_ROWS
        cum += r["rows"]
    # every closed bin reached the target (greedy never cuts early)
    by_bin = {}
    for r in rows:
        by_bin[r["bin"]] = by_bin.get(r["bin"], 0) + r["rows"]
    last = max(by_bin)
    for b, n in by_bin.items():
        if b != last:
            # a bin closes when the NEXT file would start past the
            # boundary, so bin_rows + that file's first row > target
            assert n + 1 > COMPACT_TARGET_ROWS - max(r["rows"] for r in rows)


def test_compaction_plan_on_real_manifest(spark, sf_dir, tmp_path):
    """The generic planner must run over a REAL build_manifest output:
    write a deliberately fragmented table, build its stats manifest,
    plan compaction, and verify bins cover all files exactly once."""
    from pyspark.sql import functions as F

    from snowflake_to_postgres_spark.operators.layout import (
        MANIFEST_NAME,
        build_manifest,
        compaction_plan,
    )
    from snowflake_to_postgres_spark.sources import load_table

    path = str(tmp_path / "frag")
    (
        load_table(spark, sf_dir, "orders")
        .repartition(16)  # deliberate small-files shape
        .write.mode("overwrite")
        .parquet(path)
    )
    n_files = build_manifest(spark, path, ["o_orderkey"])
    man = spark.read.parquet(path + "/" + MANIFEST_NAME)
    plan = compaction_plan(man, "rows", "_file", 1000).collect()
    assert len(plan) == n_files
    assert len({r["_file"] for r in plan}) == n_files
    for r in plan:
        assert r["bin_rows"] >= r["rows"]


def test_expectations_detect_violations(spark, tmp_path):
    """Constructed dirty data: each check must count its own violations
    and only the clean checks pass."""
    import datetime as dt

    from snowflake_to_postgres_spark.operators.validation import val_expectations

    orders = spark.createDataFrame(
        [
            (1, 10, "O", 5.0, dt.date(2020, 1, 1), "1-URGENT"),
            (1, 10, "X", -1.0, dt.date(2020, 1, 2), "1-URGENT"),  # dup key, bad status, bad price
            (2, None, "F", 3.0, dt.date(2020, 1, 3), "2-HIGH"),   # null custkey
            (3, 99, "P", 4.0, dt.date(2020, 1, 4), "3-MEDIUM"),   # fk violation
        ],
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate date, o_orderpriority string",
    )
    customer = spark.createDataFrame(
        [(10, "a", 1, 0.0, "BUILDING")],
        "c_custkey bigint, c_name string, c_nationkey bigint, "
        "c_acctbal double, c_mktsegment string",
    )
    orders.write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    customer.write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    got = {
        r["check_name"]: (r["violations"], r["passed"])
        for r in val_expectations(spark, str(tmp_path)).collect()
    }
    assert got["accepted_values_orderstatus"] == (1, False)
    assert got["not_null_custkey"] == (1, False)
    assert got["range_totalprice_positive"] == (1, False)
    assert got["unique_orderkey"] == (1, False)
    # NULL custkey is the not-null check's failure, not a dangling
    # reference: only custkey 99 is an orphan (Spark excludes NULLs to
    # match the oracle's NOT IN semantics)
    assert got["fk_custkey_in_customer"] == (1, False)


def test_binned_quantiles_accuracy_and_degenerate(spark, duck, sf_dir):
    """Each estimate must sit within one bin width of the true quantile
    (the operator's own err_bound column), and degenerate inputs
    (empty, constant) must return well-formed frames."""
    from snowflake_to_postgres_spark.operators.analytics_ext import (
        a21_binned_quantiles,
    )

    truth = {
        q: duck.execute(
            f"SELECT quantile_cont(CAST(l_extendedprice AS DOUBLE), {q}) FROM lineitem"
        ).fetchone()[0]
        for q in (0.5, 0.9, 0.99)
    }
    rows = a21_binned_quantiles(spark, sf_dir).collect()
    assert [r["q"] for r in rows] == [0.5, 0.9, 0.99]
    for r in rows:
        assert abs(r["estimate"] - truth[r["q"]]) <= r["err_bound"] + 1e-9, r

    # constant column -> all estimates collapse to the single value
    const = spark.createDataFrame([(5.0,)] * 10, "l_extendedprice double")
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        const.write.mode("overwrite").parquet(f"{d}/lineitem.parquet")
        got = a21_binned_quantiles(spark, d).collect()
        assert [g["estimate"] for g in got] == [5.0, 5.0, 5.0]
        empty = const.limit(0)
        empty.write.mode("overwrite").parquet(f"{d}/lineitem.parquet")
        assert a21_binned_quantiles(spark, d).count() == 0


def test_hll_union_merge_equals_single_pass(spark, sf_dir):
    """Register-wise MAX merge must reproduce the single-pass sketch
    over the union exactly — the mergeability contract."""
    from snowflake_to_postgres_spark.operators.analytics_ext import (
        HLL_EST_GRID,
        HLL_M,
        _hll_alpha,
        a22_hll_union,
    )

    rows = {r["g"]: r for r in a22_hll_union(spark, sf_dir).collect()}
    merged = rows.pop("__merged__")
    # recompute the union sketch independently over o_custkey
    import math

    vals = {
        r[0]
        for r in spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_custkey")
        .collect()
    }
    regs: dict[int, int] = {}
    for v in vals:
        h = int(_md5_hex(str(v))[:15], 16)
        j, w = divmod(h, 1 << 52)
        regs[j] = max(regs.get(j, 0), 53 if w == 0 else 53 - w.bit_length())
    v_zero = HLL_M - len(regs)
    s_scaled = sum(1 << (53 - mj) for mj in regs.values()) + v_zero * (1 << 53)
    est = _hll_alpha() * 256.0 * 256.0 * float(1 << 53) / float(s_scaled)
    if est <= 2.5 * HLL_M and v_zero > 0:
        est = HLL_M * math.log(HLL_M / float(v_zero))
    est = math.floor(est * HLL_EST_GRID + 0.5) / HLL_EST_GRID
    assert merged["s_scaled"] == s_scaled
    assert merged["hll_estimate"] == est
    # a partition's registers can never exceed the union's
    for g, r in rows.items():
        assert r["s_scaled"] >= merged["s_scaled"], g


def test_concurrency_curve_constructed_kernel(spark):
    """Known overlap pattern: three sessions, two overlapping plus a
    boundary touch (end == start) that must count as concurrent
    (inclusive ties)."""
    import datetime as dt

    from snowflake_to_postgres_spark.operators.analytics_ext import (
        x_concurrency_curve,
    )

    t = dt.datetime(2024, 1, 1, 10, 0, 0)

    def ev(eid, uid, offset_min):
        return (eid, t + dt.timedelta(minutes=offset_min), uid, "click", 1.0, "{}")

    rows = [
        # user 1: session 10:00-10:10
        ev(0, 1, 0), ev(1, 1, 10),
        # user 2: session 10:05-10:20 (overlaps user 1)
        ev(2, 2, 5), ev(3, 2, 20),
        # user 3: session starting exactly at user 2's end (10:20-10:25)
        ev(4, 3, 20), ev(5, 3, 25),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(f"{d}/events.parquet")
        out = x_concurrency_curve(spark, d).collect()
    assert len(out) == 1 and out[0]["hour"] == "2024-01-01 10:00:00"
    # 10:05-10:10 two concurrent; at 10:20 the boundary touch makes two
    assert out[0]["max_concurrency"] == 2
    assert out[0]["starts"] == 3 and out[0]["ends"] == 3


def test_concurrency_two_level_equals_global_sweep(spark, duck, sf_dir):
    """The two-level (per-hour + carry) construction must equal a naive
    single-window global sweep computed in python."""
    from snowflake_to_postgres_spark.operators.analytics_ext import (
        SESSION_GAP_SEC,
        x_concurrency_curve,
    )

    evs = duck.execute(
        "SELECT user_id, event_id, ts FROM events ORDER BY user_id, ts, event_id"
    ).fetchall()
    sessions = []
    cur = {}
    for uid, eid, ts in evs:
        if uid in cur and (ts - cur[uid][1]).total_seconds() > SESSION_GAP_SEC:
            sessions.append((uid, cur[uid][0], cur[uid][1]))
            del cur[uid]
        if uid not in cur:
            cur[uid] = [ts, ts]
        else:
            cur[uid][1] = ts
    sessions += [(uid, s, e) for uid, (s, e) in cur.items()]
    deltas = [(s, 1, uid) for uid, s, e in sessions] + [
        (e, -1, uid) for uid, s, e in sessions
    ]
    deltas.sort(key=lambda x: (x[0], -x[1], x[2]))
    conc, peak = 0, {}
    for ts, d, _ in deltas:
        conc += d
        hour = ts.replace(minute=0, second=0, microsecond=0)
        peak[hour] = max(peak.get(hour, -10**9), conc)
    got = {
        r["hour"]: r["max_concurrency"]
        for r in x_concurrency_curve(spark, sf_dir).collect()
    }
    exp = {h.strftime("%Y-%m-%d %H:%M:%S"): p for h, p in peak.items()}
    assert got == exp


def test_grouped_quantiles_accuracy(spark, duck, sf_dir):
    """Each per-group estimate must sit within one (global) bin width of
    the group's TYPE-1 quantile (the rank-ceil(q*N) order statistic —
    the estimator's stated target; interpolating quantile_cont can sit
    further away in sparse tails)."""
    import math

    from snowflake_to_postgres_spark.operators.analytics_ext import (
        a23_grouped_quantiles,
    )

    rows = a23_grouped_quantiles(spark, sf_dir).collect()
    groups = {r["g"] for r in rows}
    assert len(groups) == 5 and len(rows) == 15
    for r in rows:
        vals = [
            v[0]
            for v in duck.execute(
                "SELECT CAST(o_totalprice AS DOUBLE) FROM orders "
                "WHERE o_orderpriority = ? ORDER BY 1",
                [r["g"]],
            ).fetchall()
        ]
        truth = vals[max(0, math.ceil(r["q"] * len(vals)) - 1)]
        assert abs(r["estimate"] - truth) <= r["err_bound"] + 1e-9, r


def test_winnow_pairs_guaranteed_recall_vs_jaccard(spark, duck, sf_dir):
    """Winnowing's structural guarantee — a contiguous match of length
    >= w + k - 1 shares AT LEAST ONE fingerprint — means candidate
    generation at min_shared=1 must recall every heavy-overlap pair
    (word-3-gram Jaccard >= 0.5); the registered threshold is a
    precision dial whose output must be a subset of the floor."""
    from snowflake_to_postgres_spark.operators.dedup import (
        dedup_ngram_jaccard_pairs,
    )
    from snowflake_to_postgres_spark.operators.text import dedup_winnow_pairs

    floor = {
        (r["d1"], r["d2"])
        for r in dedup_winnow_pairs(spark, sf_dir, min_shared=1).collect()
    }
    default = {
        (r["d1"], r["d2"]): r["containment"]
        for r in dedup_winnow_pairs(spark, sf_dir).collect()
    }
    assert default, "fixture has near-dups"
    assert all(0.0 < c <= 1.0 for c in default.values())
    assert set(default) <= floor
    truth = {
        (r["d1"], r["d2"])
        for r in dedup_ngram_jaccard_pairs(spark, sf_dir).collect()
    }
    missed = truth - floor
    assert not missed, f"winnowing floor missed heavy-overlap pairs: {missed}"


def test_cms_join_size_overestimates_and_python_parity(spark, duck, sf_dir):
    """Inner-product estimate must equal an independent pure-python
    sketch and never undercount the exact join size."""
    from collections import Counter

    from snowflake_to_postgres_spark.operators.analytics_ext import (
        CMS_D,
        CMS_W,
        a24_cms_join_size,
    )

    ca = Counter(r[0] for r in duck.execute("SELECT o_custkey FROM orders").fetchall())
    cb = Counter(r[0] for r in duck.execute("SELECT c_custkey FROM customer").fetchall())

    def sketch(cnt):
        s = Counter()
        for v, n in cnt.items():
            for i in range(CMS_D):
                s[(i, int(_md5_hex(f"{i}|{v}")[:8], 16) % CMS_W)] += n
        return s

    sa, sb = sketch(ca), sketch(cb)
    est = min(
        sum(sa[(i, j)] * sb[(i, j)] for j in range(CMS_W)) for i in range(CMS_D)
    )
    exact = sum(n * cb.get(v, 0) for v, n in ca.items())
    row = a24_cms_join_size(spark, sf_dir).collect()[0]
    assert row["exact_join_size"] == exact
    assert row["cms_join_size"] == est
    assert row["never_undercounts"] and est >= exact


def test_activity_streaks_constructed_kernel(spark):
    """Known gaps-and-islands pattern: 3-day streak, gap, 2-day streak;
    multiple events per day collapse; tie between equal streaks goes to
    the earlier one."""
    import datetime as dt

    from snowflake_to_postgres_spark.operators.analytics_ext import (
        x_activity_streaks,
    )

    def ev(eid, uid, day, hour=1):
        return (eid, dt.datetime(2024, 1, day, hour), uid, "view", 1.0, "{}")

    rows = [
        # user 1: days 1,2,3 then 5,6 -> longest 3 (1..3)
        ev(0, 1, 1), ev(1, 1, 1, 9), ev(2, 1, 2), ev(3, 1, 3),
        ev(4, 1, 5), ev(5, 1, 6),
        # user 2: two 2-day streaks (1-2, 9-10) -> earlier wins the tie
        ev(6, 2, 1), ev(7, 2, 2), ev(8, 2, 9), ev(9, 2, 10),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(f"{d}/events.parquet")
        out = {r["user_id"]: r for r in x_activity_streaks(spark, d).collect()}
    assert out[1]["longest_streak_days"] == 3
    assert str(out[1]["streak_start"]) == "2024-01-01"
    assert out[2]["longest_streak_days"] == 2
    assert str(out[2]["streak_start"]) == "2024-01-01"


def test_corr_matrix_numpy_parity(spark, duck, sf_dir):
    """Each correlation must match numpy's corrcoef within the grid
    step, and the matrix covers all 6 pairs once."""
    import numpy as np

    from snowflake_to_postgres_spark.operators.analytics_ext import (
        CORR_COLS,
        a25_corr_matrix,
    )

    data = {
        c: np.array(
            [float(r[0]) for r in duck.execute(f"SELECT {c} FROM lineitem").fetchall()]
        )
        for c in CORR_COLS
    }
    rows = a25_corr_matrix(spark, sf_dir).collect()
    assert len(rows) == 6
    for r in rows:
        expected = np.corrcoef(data[r["col_a"]], data[r["col_b"]])[0, 1]
        assert abs(r["corr"] - expected) < 1e-6, r


def test_novelty_first_doc_attribution(spark):
    """Constructed corpus: doc 1 all-novel; doc 2 a verbatim copy
    (novelty 0); doc 3 half-overlapping."""
    from snowflake_to_postgres_spark.operators.text import tx_ngram_novelty

    base = "a b c d e f g h"            # 4 shingles, all first seen in doc 1
    half = "e f g h i j k l"            # shares shingle 'e f g h i'?  recompute below
    rows = [
        (1, base, "en", "s", len(base)),
        (2, base, "en", "s", len(base)),
        (3, half, "en", "s", len(half)),
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
        out = {r["doc_id"]: r for r in tx_ngram_novelty(spark, d).collect()}
    assert out[1]["novelty"] == 1.0
    assert out[2]["novelty"] == 0.0 and out[2]["n_novel"] == 0
    # doc 3 shares only shingles fully inside the e..h suffix overlap:
    # its 4 shingles all contain at least one of i..l except none — so
    # compute expectation directly in python
    toks1, toks3 = base.split(), half.split()
    sh1 = {" ".join(toks1[i : i + 5]) for i in range(len(toks1) - 4)}
    sh3 = [" ".join(toks3[i : i + 5]) for i in range(len(toks3) - 4)]
    novel = [s for s in sh3 if s not in sh1]
    assert out[3]["n_novel"] == len(set(novel))
    assert out[3]["n_shingles"] == len(set(sh3))


def test_lateness_two_level_equals_global(spark, duck, sf_dir):
    """The bucketed prefix-max must equal a naive python global sweep in
    arrival order, and the audit's totals must cover every event."""
    from snowflake_to_postgres_spark.streaming.queries import (
        LATENESS_WATERMARK_SEC,
        st_lateness_audit,
    )

    evs = duck.execute(
        "SELECT event_id, event_type, epoch_us(ts) FROM events ORDER BY event_id"
    ).fetchall()
    seen = None
    agg = {}
    for _, et, us in evs:
        late = max(0, (seen - us) if seen is not None else 0)
        n, d, m = agg.get(et, (0, 0, 0))
        agg[et] = (
            n + 1,
            d + (1 if late > LATENESS_WATERMARK_SEC * 1_000_000 else 0),
            max(m, late),
        )
        seen = us if seen is None else max(seen, us)
    got = {
        r["event_type"]: (
            r["n_events"],
            r["n_dropped_at_watermark"],
            r["max_lateness_sec"],
        )
        for r in st_lateness_audit(spark, sf_dir).collect()
    }
    exp = {et: (n, d, m // 1_000_000) for et, (n, d, m) in agg.items()}
    assert got == exp
    assert sum(v[0] for v in got.values()) == len(evs)


def test_event_transitions_rows_sum_to_one(spark, duck, sf_dir):
    """Each source state's outgoing probabilities must sum to 1 exactly
    (up to float addition), and pair counts must equal an independent
    python recount."""
    from collections import Counter

    from snowflake_to_postgres_spark.operators.analytics_ext import (
        x_event_transitions,
    )

    rows = x_event_transitions(spark, sf_dir).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["cur_type"], 0.0)
        by_src[r["cur_type"]] += r["p"]
    for src, s in by_src.items():
        assert abs(s - 1.0) < 1e-9, (src, s)
    evs = duck.execute(
        "SELECT user_id, event_type FROM events ORDER BY user_id, ts, event_id"
    ).fetchall()
    pairs = Counter()
    prev = {}
    for uid, et in evs:
        if uid in prev:
            pairs[(prev[uid], et)] += 1
        prev[uid] = et
    got = {(r["cur_type"], r["next_type"]): r["n"] for r in rows}
    assert got == dict(pairs)


def test_ivm_join_refresh_delta_pushdown(spark, sf_dir):
    """The refresh must verify (fingerprint_match true, refreshed ==
    full) AND the delta branch must push its date predicate into the
    parquet scan — refresh cost tracking |delta| is the point."""
    from snowflake_to_postgres_spark.operators.analytics_ext import (
        _ivm_join_frames,
        ivm_join_refresh,
    )

    row = ivm_join_refresh(spark, sf_dir).collect()[0]
    assert row["fingerprint_match"]
    assert row["refreshed_rows"] == row["full_rows"]
    assert row["delta_rows"] > 0 and row["base_rows"] > 0
    plan = (
        _ivm_join_frames(spark, sf_dir)["delta_join"]
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan and "o_orderdate" in plan.split("PushedFilters")[1][:200]


def test_filtered_ann_predicate_and_prefilter_semantics(spark, sf_dir):
    """Every hit must satisfy the predicate, and pre-filtering must keep
    per-query result depth wherever the probed cells hold eligible
    vectors (the post-filter bug this operator exists to avoid would
    return fewer)."""
    from snowflake_to_postgres_spark.operators.similarity import (
        FILTER_MOD,
        sim_filtered_ann,
        sim_ivf_topk,
    )

    rows = sim_filtered_ann(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["neighbor_id"] % FILTER_MOD == 0, r
    # post-filtering the unfiltered IVF top-k must never yield MORE
    # eligible hits than the pre-filtered search
    post = {}
    for r in sim_ivf_topk(spark, sf_dir).collect():
        if r["neighbor_id"] % FILTER_MOD == 0:
            post[r["qid"]] = post.get(r["qid"], 0) + 1
    pre = {}
    for r in rows:
        pre[r["qid"]] = pre.get(r["qid"], 0) + 1
    for qid, n_post in post.items():
        assert pre.get(qid, 0) >= n_post, (qid, pre.get(qid), n_post)
