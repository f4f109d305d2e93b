"""Property-based tests (hypothesis) on the pure kernels — the
edge-case sweep SURVEY §5 calls for where example tests are too sparse."""

from __future__ import annotations

import string
import threading

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from snowflake_to_postgres_spark.plans.catalog import (
    ColumnInfo,
    ConstraintInfo,
    ConstraintType,
    TableInfo,
    normalize_identifier,
)
from snowflake_to_postgres_spark.plans.ddl import topo_sort_tables
from snowflake_to_postgres_spark.plans.dialect import (
    rewrite_double_colon_casts,
    rewrite_functions,
    translate_format_string,
)
from snowflake_to_postgres_spark.plans.typemap import (
    parse_snowflake_type,
    snowflake_to_spark,
    spark_to_postgres,
)

idents = st.text(alphabet=string.ascii_letters + "_", min_size=1, max_size=12)


@given(idents)
def test_identifier_folding_idempotent(name):
    once = normalize_identifier(name)
    assert normalize_identifier(once) == once
    assert once == once.lower()


@given(st.integers(1, 38), st.integers(0, 37))
def test_number_mapping_total(p, s):
    s = min(s, p)
    dt = snowflake_to_spark(f"NUMBER({p},{s})")
    assert dt == T.DecimalType(p, s)
    assert spark_to_postgres(dt) == f"NUMERIC({p},{s})"


@given(idents)
def test_unknown_types_never_crash(type_name):
    dt = snowflake_to_spark(type_name)
    assert dt is not None
    assert spark_to_postgres(dt)  # always produces DDL text


@given(st.integers(1, 10_000))
def test_varchar_length_roundtrip(n):
    t = parse_snowflake_type(f"VARCHAR({n})")
    assert t.length == n
    assert spark_to_postgres(snowflake_to_spark(f"VARCHAR({n})"), length=n) == f"VARCHAR({n})"


@given(idents, idents, idents)
def test_iff_rewrite_preserves_args(a, b, c):
    out = rewrite_functions(f"SELECT IFF({a} > 1, {b}, {c})")
    assert out == f"SELECT IF({a} > 1, {b}, {c})"


@given(idents)
def test_double_colon_varchar(expr):
    out = rewrite_double_colon_casts(f"SELECT {expr}::VARCHAR FROM t")
    assert out == f"SELECT CAST({expr} AS STRING) FROM t"


@given(st.sampled_from(["YYYY-MM-DD", "HH24:MI:SS", "YYYY-MM-DD HH24:MI:SS", "DD/MON/YYYY"]))
def test_format_translation_deterministic(fmt):
    out1 = translate_format_string(fmt)
    out2 = translate_format_string(fmt)
    assert out1 == out2
    assert "HH24" not in out1 and "MI" not in out1


@st.composite
def fk_forests(draw):
    """Random FK DAGs: each table may reference only lower-indexed tables
    (guarantees acyclic), then shuffled."""
    n = draw(st.integers(1, 12))
    tables = []
    for i in range(n):
        fks = []
        if i:
            refs = draw(st.lists(st.integers(0, i - 1), max_size=3, unique=True))
            for r in refs:
                fks.append(
                    ConstraintInfo(f"fk_{i}_{r}", ConstraintType.FOREIGN_KEY,
                                   ["id"], f"t{r}", ["id"])
                )
        tables.append(
            TableInfo(f"t{i}", "s", [ColumnInfo("id", T.LongType())], foreign_keys=fks)
        )
    perm = draw(st.permutations(tables))
    return list(perm)


@given(fk_forests())
@settings(max_examples=50)
def test_topo_sort_respects_all_fks(tables):
    ordered = topo_sort_tables(tables)
    assert sorted(t.name for t in ordered) == sorted(t.name for t in tables)
    pos = {t.name: i for i, t in enumerate(ordered)}
    for t in tables:
        for fk in t.foreign_keys:
            assert pos[fk.referenced_table] < pos[t.name], (
                f"{fk.referenced_table} must precede {t.name}"
            )


def test_checkpoint_thread_safety(tmp_path):
    from snowflake_to_postgres_spark.operators.transfer import CheckpointManager

    path = str(tmp_path / "c.json")
    ckpt = CheckpointManager(path)
    names = [f"t{i}" for i in range(50)]

    def mark(n):
        ckpt.mark_completed(n)

    threads = [threading.Thread(target=mark, args=(n,)) for n in names]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    reloaded = CheckpointManager(path)
    assert reloaded.completed == sorted(names)


# ---- chunk geometry (tx_chunk_documents) --------------------------------

def _chunk_count(n_tokens: int, c: int, s: int) -> int:
    """Python twin of the chunk-count expression in tx_chunk_documents."""
    import math

    return 1 + max(0, math.ceil((n_tokens - c) / s))


@given(st.integers(1, 5000))
def test_chunk_geometry_covers_every_token(n):
    """Every token index must fall inside ≥1 chunk window, chunks must
    advance by the stride, and the final chunk must reach the end."""
    from snowflake_to_postgres_spark.operators.text import CHUNK_STRIDE, CHUNK_TOKENS

    c, s = CHUNK_TOKENS, CHUNK_STRIDE
    k = _chunk_count(n, c, s)
    # chunk i covers [i*s, min(i*s + c, n)) in 0-based token indices
    covered_up_to = 0
    for i in range(k):
        start = i * s
        assert start <= covered_up_to  # no gap between consecutive chunks
        covered_up_to = max(covered_up_to, min(start + c, n))
    assert covered_up_to == n  # last chunk reaches the end
    if k > 1:
        # one fewer chunk would leave a gap at the tail
        assert (k - 2) * s + c < n


def test_quantizer_scale_bound(spark, sf_dir):
    """Fixed-scale int8 quantization is only valid while |component| ≤ 1;
    the fixture satisfies it and the output must respect the int8 range."""
    from snowflake_to_postgres_spark.operators.similarity import (
        QUANT_SCALE,
        emb_quantize_int8,
    )

    import pyspark.sql.functions as F

    out = emb_quantize_int8(spark, sf_dir)
    mx = out.agg(F.max("max_abs_q")).collect()[0][0]
    assert mx <= QUANT_SCALE
    assert out.filter(F.col("n_dims") != 64).count() == 0


# ---------------------------------------------------------------- round 5

from snowflake_to_postgres_spark.operators.layout import (  # noqa: E402
    _binned,
    _interleave_expr,
)


@given(
    st.integers(min_value=0, max_value=255),
    st.integers(min_value=0, max_value=255),
)
def test_zorder_interleave_expr_is_bijective(bx, by):
    """The GENERATED interleave expression (evaluated as Python — `//`
    and `%` semantics match both engines for non-negative ints) must be
    a bijection [0,256)^2 -> [0,65536) whose bit de-interleave recovers
    the inputs."""
    expr = _interleave_expr("bx", "by", 8, "//")
    z = eval(expr, {}, {"bx": bx, "by": by})  # noqa: S307 — generated by us
    assert 0 <= z < 65536
    rx = sum(((z >> (2 * k)) & 1) << k for k in range(8))
    ry = sum(((z >> (2 * k + 1)) & 1) << k for k in range(8))
    assert (rx, ry) == (bx, by)


@given(
    st.integers(min_value=-10**9, max_value=10**9),
    st.integers(min_value=-10**9, max_value=10**9),
    st.integers(min_value=-10**9, max_value=10**9),
)
def test_zorder_binning_expr_bounds_and_monotone(lo, hi, x):
    """The generated equi-width binning lands every in-range value in
    [0, 256) and preserves order."""
    lo, hi = min(lo, hi), max(lo, hi)
    x = max(lo, min(hi, x))
    expr = _binned("x", str(lo), str(hi), 8, "//")
    b = eval(expr, {}, {"x": x})  # noqa: S307
    assert 0 <= b < 256
    if x < hi:
        b2 = eval(expr, {}, {"x": x + 1})  # noqa: S307
        assert b2 >= b


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=1000),
            st.integers(min_value=0, max_value=10000),
        ),
        min_size=3,
        max_size=40,
    )
)
def test_ols_sufficient_statistics_match_lstsq(obs):
    """fit_linear_by_group's closed form, mirrored in pure Python from
    the same sufficient statistics, must agree with numpy lstsq
    whenever x has variance."""
    import numpy as np

    xs = [o[0] for o in obs]
    ys = [o[1] for o in obs]
    n = len(obs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in obs)
    denom = n * sxx - sx * sx
    if denom == 0:
        return  # constant x: model undefined, Spark emits NaN/inf too
    slope = (n * sxy - sx * sy) / denom
    intercept = (sy - slope * sx) / n
    A = np.stack([np.array(xs, dtype=float), np.ones(n)], axis=1)
    (np_slope, np_intercept), *_ = np.linalg.lstsq(A, np.array(ys, dtype=float), rcond=None)
    assert abs(slope - np_slope) < 1e-6 * max(1.0, abs(np_slope))
    assert abs(intercept - np_intercept) < 1e-5 * max(1.0, abs(np_intercept))


_bpe_words = st.lists(
    st.text(alphabet="ab", min_size=1, max_size=6), min_size=1, max_size=8
)
_bpe_rule = st.tuples(
    st.sampled_from(["a", "b", "</w>", "aa", "ab", "ba"]),
    st.sampled_from(["a", "b", "</w>", "aa", "ab", "ba"]),
)


@settings(max_examples=8, deadline=None)
@given(_bpe_words, _bpe_rule, _bpe_rule)
def test_bpe_merge_fold_matches_python(spark, words, r1, r2):
    """The JVM-side left-to-right non-overlapping pair-merge fold must
    agree with the obvious Python scan for ANY rule over a two-letter
    alphabet — including rules whose merged token re-participates
    (aa+a), rules matching nothing, and chained rules."""
    from pyspark.sql import functions as F

    from snowflake_to_postgres_spark.operators.bpe import EOW, _merge_pair

    def py_merge(syms, a, b):
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return out

    expected = []
    for w in words:
        syms = [*w, EOW]
        syms = py_merge(syms, *r1)
        syms = py_merge(syms, *r2)
        expected.append(syms)

    df = spark.createDataFrame([(w,) for w in words], "w STRING")
    syms = F.expr(
        "concat(transform(sequence(1, length(w)), i -> substring(w, i, 1)),"
        " array('</w>'))"
    )
    out = df.select(
        "w",
        _merge_pair(
            _merge_pair(syms, r1[0], r1[1], r1[0] + r1[1]),
            r2[0], r2[1], r2[0] + r2[1],
        ).alias("syms"),
    )
    got = {r["w"]: r["syms"] for r in out.collect()}
    # duplicate words collapse in the dict; compare per distinct word
    exp = {w: e for w, e in zip(words, expected)}
    assert got == exp


# ---------------------------------------------------------------------------
# Round-9 kernels: pure-python replicas of the new operators' math,
# hypothesis-swept for the invariants the fixtures can't explore.
# ---------------------------------------------------------------------------


def _md5i(s: str, n: int) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:n], 16)


@given(st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1), min_size=1, max_size=60))
@settings(max_examples=60, deadline=None)
def test_dense_bucket_monotone_and_bounded(keys):
    """Floor-div bucketing must be monotone non-decreasing in the key
    and each bucket at most DENSE_ID_BUCKET keys wide — over the FULL
    signed bigint domain (trunc-toward-zero div would merge the two
    buckets straddling 0 into one 2x-wide bucket; the engine kernel
    now floors, matching this replica's `//`)."""
    from snowflake_to_postgres_spark.operators.pipeline_ext import DENSE_ID_BUCKET

    ks = sorted(set(keys))
    buckets = [k // DENSE_ID_BUCKET for k in ks]
    assert buckets == sorted(buckets)
    from collections import Counter

    for _, width in Counter(buckets).items():
        assert width <= DENSE_ID_BUCKET


@given(
    st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=200),
    st.integers(min_value=0, max_value=50),
)
@settings(max_examples=60, deadline=None)
def test_cms_never_undercounts(vals, probe):
    """Count-min estimate >= exact count for every key, on arbitrary
    multisets — the guarantee a19 emits as a column."""
    from collections import Counter

    from snowflake_to_postgres_spark.operators.analytics_ext import CMS_D, CMS_W

    cells: Counter = Counter()
    for v in vals:
        for i in range(CMS_D):
            cells[(i, _md5i(f"{i}|{v}", 8) % CMS_W)] += 1
    exact = Counter(vals)
    est = min(cells[(i, _md5i(f"{i}|{probe}", 8) % CMS_W)] for i in range(CMS_D))
    assert est >= exact.get(probe, 0)


@given(st.lists(st.integers(min_value=1, max_value=5000), min_size=1, max_size=120))
@settings(max_examples=60, deadline=None)
def test_compaction_prefix_rule_partitions_files(sizes):
    """The exclusive-prefix-sum bin rule must assign every file exactly
    one bin, keep bins contiguous, and never let a CLOSED bin end
    before the target is reached."""
    target = 1000
    cum, bins = 0, []
    for s in sizes:
        bins.append(cum // target)
        cum += s
    assert bins == sorted(bins)
    # a bin only closes when the running total crosses the target:
    # the first file of bin b+1 starts at cum >= (b+1)*target
    seen = {}
    run = 0
    for s, b in zip(sizes, bins):
        seen.setdefault(b, run)
        run += s
    for b, start in seen.items():
        assert start >= b * target


@given(st.text(alphabet="ab ", min_size=1, max_size=120))
@settings(max_examples=60, deadline=None)
def test_winnowing_density_and_coverage(text):
    """On arbitrary token streams: selected positions are valid, no two
    consecutive fingerprints sit more than w apart, and every full
    window contributes (the MOSS guarantees a9's fixture test checks
    only on fixture docs)."""
    from snowflake_to_postgres_spark.operators.text import WINNOW_K, WINNOW_W

    toks = text.lower().split(" ")
    n_h = max(1, len(toks) - (WINNOW_K - 1))
    packed = [
        _md5i(" ".join(toks[i : i + WINNOW_K]), 8) * 1048576 + (i + 1)
        for i in range(n_h)
    ]
    sel = set()
    for s in range(max(1, n_h - (WINNOW_W - 1))):
        sel.add(min(packed[s : s + WINNOW_W]))
    poss = sorted(c % 1048576 for c in sel)
    assert all(1 <= p <= n_h for p in poss)
    assert all(b - a <= WINNOW_W for a, b in zip(poss, poss[1:]))


@given(st.lists(st.integers(min_value=0, max_value=10**6), min_size=1, max_size=400))
@settings(max_examples=40, deadline=None)
def test_hll_merge_is_union(vals):
    """Register-wise max of two partition sketches equals the sketch of
    the union — for arbitrary integer sets and any split."""
    half = len(vals) // 2
    parts = [vals[:half], vals[half:]]
    merged: dict[int, int] = {}
    union: dict[int, int] = {}
    for part, target in ((parts[0], None), (parts[1], None)):
        regs: dict[int, int] = {}
        for v in part:
            h = _md5i(str(v), 15)
            j, w = divmod(h, 1 << 52)
            rho = 53 if w == 0 else 53 - w.bit_length()
            regs[j] = max(regs.get(j, 0), rho)
        for j, r in regs.items():
            merged[j] = max(merged.get(j, 0), r)
    for v in vals:
        h = _md5i(str(v), 15)
        j, w = divmod(h, 1 << 52)
        rho = 53 if w == 0 else 53 - w.bit_length()
        union[j] = max(union.get(j, 0), rho)
    assert merged == union


@given(st.lists(st.integers(0, 255), min_size=0, max_size=500))
def test_image_stats_values_matches_naive(vals):
    """image_stats_values == a from-first-principles reference on
    arbitrary byte buffers (exact integer semantics, no float)."""
    import numpy as np

    from snowflake_to_postgres_spark.operators.multimodal import (
        IMG_BRIGHT_MIN,
        IMG_DARK_MAX,
        image_stats_values,
    )

    got = image_stats_values(np.array(vals, dtype=np.uint8))
    n = len(vals)
    if n == 0:
        assert got == (0, 0, 0, 0, 0, 0, 0)
        return
    want = (
        n,
        sum(vals) * 1_000_000 // n,
        sum(1 for v in vals if v < IMG_DARK_MAX) * 1_000_000 // n,
        sum(1 for v in vals if v >= IMG_BRIGHT_MIN) * 1_000_000 // n,
        len(set(vals)),
        min(vals),
        max(vals),
    )
    assert got == want
    # structural invariants
    assert 0 <= got[2] + got[3] <= 1_000_000 + 1  # dark+bright partitions
    assert got[5] * 1_000_000 <= got[1] <= got[6] * 1_000_000


@given(
    st.lists(st.integers(-2_000_000, 2_000_000), min_size=7, max_size=7),
    st.lists(st.integers(-500_000, 500_000), min_size=6, max_size=6),
)
def test_fast_sigmoid_pf_bounds_and_monotone(w, x_rest):
    """The gridded fast-sigmoid score: pf ∈ [0, 1e6], strictly
    monotone in the margin, pf(0-margin) = 500000 exactly."""
    import math

    def pf(w, xs):
        m_fp = sum(wi * xi for wi, xi in zip(w, xs))
        mr = float(m_fp) / 1e12
        p = 0.5 + 0.5 * mr / (1.0 + abs(mr))
        return math.floor(p * 1e6 + 0.5)

    xs = [1_000_000] + x_rest
    v = pf(w, xs)
    assert 0 <= v <= 1_000_000
    assert pf([0] * 7, xs) == 500_000
    # monotone: nudging the margin up via the bias weight never lowers pf
    assert pf([w[0] + 1000] + w[1:], xs) >= v or xs[0] == 0


@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 5)),
        min_size=1,
        max_size=60,
    )
)
def test_kneser_ney_is_a_subprobability(bigrams):
    """For any bigram multiset, interpolated-KN probabilities over the
    OBSERVED continuation space are each in (0, 1] and sum to ≤ 1 per
    history (the discount mass not given back to unseen words)."""
    from collections import Counter

    from snowflake_to_postgres_spark.operators.text import KN_DISCOUNT

    cb = Counter(bigrams)
    cu = Counter()
    n1f = Counter()
    n1b = Counter()
    for (w1, w2), c in cb.items():
        cu[w1] += c
        n1f[w1] += 1
        n1b[w2] += 1
    nt = len(cb)
    by_hist = {}
    for (w1, w2), c in cb.items():
        p = (
            max(c - KN_DISCOUNT, 0.0) / cu[w1]
            + (KN_DISCOUNT * n1f[w1]) / cu[w1] * (n1b[w2] / nt)
        )
        assert 0.0 < p <= 1.0, (w1, w2, p)
        by_hist.setdefault(w1, 0.0)
        by_hist[w1] += p
    for w1, total in by_hist.items():
        assert total <= 1.0 + 1e-9, (w1, total)
