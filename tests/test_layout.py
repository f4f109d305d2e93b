"""Layout tests: z-order clustering must actually produce prunable files,
and incremental dedup must reject corpus/feed duplicates (seeded fixture —
the real documents table has no exact dups at small sf).
"""

from __future__ import annotations

import glob

import duckdb
from pyspark.sql import functions as F

from snowflake_to_postgres_spark.operators.dedup import dedup_incremental
from snowflake_to_postgres_spark.operators.layout import (
    layout_zorder,
    write_zordered,
    zorder_key,
)
from snowflake_to_postgres_spark.sources import load_table

N_FILES = 16


def _file_boxes(path_glob: str, cols: tuple[str, str]):
    """Per output file: (min, max) of both dims, via one duckdb scan each."""
    con = duckdb.connect()
    boxes = []
    for f in sorted(glob.glob(path_glob)):
        row = con.execute(
            f"SELECT MIN({cols[0]}), MAX({cols[0]}), MIN({cols[1]}), MAX({cols[1]}) "
            f"FROM read_parquet('{f}')"
        ).fetchone()
        boxes.append(row)
    con.close()
    return boxes


def test_zorder_write_produces_prunable_boxes(spark, sf_dir, tmp_path):
    """Every z-ordered file must cover a compact rectangle of BOTH
    dimensions: the mean fractional extent per dim stays well under the
    whole domain, and the mean box AREA is a small fraction — the
    property parquet min/max pruning exploits. A single-column sort
    would leave the other dim's extent at ~1.0."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_custkey").cast("bigint").alias("cx"),
        F.datediff("o_orderdate", F.lit("1992-01-01").cast("date"))
        .cast("bigint")
        .alias("cy"),
    )
    out = str(tmp_path / "zordered")
    write_zordered(orders, "cx", "cy", out, n_files=N_FILES)
    files = glob.glob(out + "/part-*.parquet")
    assert len(files) == N_FILES

    lo_x, hi_x, lo_y, hi_y = orders.agg(
        F.min("cx"), F.max("cx"), F.min("cy"), F.max("cy")
    ).collect()[0]
    dom_x, dom_y = hi_x - lo_x + 1, hi_y - lo_y + 1
    boxes = _file_boxes(out + "/part-*.parquet", ("cx", "cy"))
    fx = [(b[1] - b[0] + 1) / dom_x for b in boxes]
    fy = [(b[3] - b[2] + 1) / dom_y for b in boxes]
    areas = [a * b for a, b in zip(fx, fy)]
    # 16 contiguous z-ranges over an 8-bit x 8-bit grid -> each file's
    # box is a handful of tiles; generous bars still reject any
    # single-dim or unsorted layout (which scores ~1.0 on a dim)
    assert sum(fx) / len(fx) <= 0.6, fx
    assert sum(fy) / len(fy) <= 0.6, fy
    assert sum(areas) / len(areas) <= 0.2, areas


def test_zorder_beats_single_column_sort_on_area(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_custkey").cast("bigint").alias("cx"),
        F.datediff("o_orderdate", F.lit("1992-01-01").cast("date"))
        .cast("bigint")
        .alias("cy"),
    )
    z_out = str(tmp_path / "z")
    s_out = str(tmp_path / "s")
    write_zordered(orders, "cx", "cy", z_out, n_files=N_FILES)
    (
        orders.repartitionByRange(N_FILES, "cx")
        .sortWithinPartitions("cx")
        .write.mode("overwrite")
        .parquet(s_out)
    )

    def worst_dim_extent(path):
        """Mean fractional extent of the WORSE dimension — the quantity
        that bounds pruning for a predicate on an arbitrary single
        column. A cx-only sort scores ~1.0 (cy slabs span the domain);
        z-order keeps both dims compact."""
        boxes = _file_boxes(path + "/part-*.parquet", ("cx", "cy"))
        lo_x = min(b[0] for b in boxes); hi_x = max(b[1] for b in boxes)
        lo_y = min(b[2] for b in boxes); hi_y = max(b[3] for b in boxes)
        dx, dy = hi_x - lo_x + 1, hi_y - lo_y + 1
        mx = sum((b[1] - b[0] + 1) / dx for b in boxes) / len(boxes)
        my = sum((b[3] - b[2] + 1) / dy for b in boxes) / len(boxes)
        return max(mx, my)

    assert worst_dim_extent(z_out) < worst_dim_extent(s_out) * 0.6


def test_zorder_key_bounds_and_locality(spark, sf_dir):
    res = layout_zorder(spark, sf_dir)
    stats = res.agg(
        F.min("bin_cust"), F.max("bin_cust"),
        F.min("bin_date"), F.max("bin_date"),
        F.min("zkey"), F.max("zkey"), F.count("*"),
    ).collect()[0]
    assert stats[0] >= 0 and stats[1] <= 255
    assert stats[2] >= 0 and stats[3] <= 255
    assert stats[4] >= 0 and stats[5] <= 65535
    assert stats[6] == load_table(spark, sf_dir, "orders").count()


def test_zorder_key_projection_is_pure_map(spark, sf_dir):
    """After the bounded stats collect, the key computation must be a
    join-free, shuffle-free projection over the scan."""
    plan = layout_zorder(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "Exchange" not in plan


# ---------------------------------------------------------- incremental

def test_dedup_incremental_seeded(spark, tmp_path):
    """Build a tiny documents table with known duplicates straddling the
    feed/corpus hash boundary and check every verdict."""
    import hashlib

    rows = [(i, f"unique text {i}", "en", "src0", 10) for i in range(40)]
    # find a feed id and a corpus id (md5(doc_id) >= 'e' => feed)
    feed_ids = [i for i in range(40) if hashlib.md5(str(i).encode()).hexdigest() >= "e"]
    corpus_ids = [i for i in range(40) if hashlib.md5(str(i).encode()).hexdigest() < "e"]
    assert len(feed_ids) >= 3 and corpus_ids
    f1, f2, f3 = feed_ids[:3]
    c1 = corpus_ids[0]
    rows[f1] = (f1, rows[c1][1], "en", "src0", 10)   # dup of corpus
    rows[f2] = (f2, "feed dup body", "en", "src0", 10)
    rows[f3] = (f3, "feed dup body", "en", "src0", 10)  # dup within feed
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    fixture = tmp_path / "docs"
    df.coalesce(1).write.mode("overwrite").parquet(str(fixture / "documents.parquet"))

    res = {r["doc_id"]: r for r in dedup_incremental(spark, str(fixture)).collect()}
    assert set(res) == set(feed_ids)
    assert res[f1]["dup_of_corpus"] and res[f1]["rejected"]
    lo, hi = min(f2, f3), max(f2, f3)
    assert not res[lo]["dup_in_feed"] and res[hi]["dup_in_feed"] and res[hi]["rejected"]
    assert not res[lo]["dup_of_corpus"] and not res[hi]["dup_of_corpus"]
    accepted = [i for i in feed_ids if not res[i]["rejected"]]
    assert hi not in accepted and f1 not in accepted and lo in accepted


# ------------------------------------------------------------- hilbert

def test_hilbert_write_produces_prunable_boxes(spark, sf_dir, tmp_path):
    """Hilbert-clustered files must show the same compact-box property
    as z-order (the pruning precondition), and the curve itself must be
    seamless: consecutive Hilbert keys are always 4-adjacent grid cells,
    which Morton cannot guarantee."""
    from snowflake_to_postgres_spark.operators.layout import (
        Z_BITS,
        hilbert_key,
        write_hilbert,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_custkey").cast("bigint").alias("cx"),
        F.datediff("o_orderdate", F.lit("1992-01-01").cast("date"))
        .cast("bigint")
        .alias("cy"),
    )
    out = str(tmp_path / "hilbert")
    write_hilbert(orders, "cx", "cy", out, n_files=N_FILES)
    files = glob.glob(out + "/part-*.parquet")
    assert len(files) == N_FILES

    lo_x, hi_x, lo_y, hi_y = orders.agg(
        F.min("cx"), F.max("cx"), F.min("cy"), F.max("cy")
    ).collect()[0]
    dom_x, dom_y = hi_x - lo_x + 1, hi_y - lo_y + 1
    boxes = _file_boxes(out + "/part-*.parquet", ("cx", "cy"))
    fx = [(b[1] - b[0] + 1) / dom_x for b in boxes]
    fy = [(b[3] - b[2] + 1) / dom_y for b in boxes]
    areas = [a * b for a, b in zip(fx, fy)]
    assert sum(fx) / len(fx) <= 0.6, fx
    assert sum(fy) / len(fy) <= 0.6, fy
    assert sum(areas) / len(areas) <= 0.2, areas


def test_hilbert_curve_is_seamless(spark):
    """Walk the full 2^bits x 2^bits grid at a small order: the Hilbert
    index must be a bijection onto [0, 4^bits) and every pair of
    consecutive indices must map to cells at Manhattan distance exactly
    1 — the no-seam property that makes key-range reads touch adjacent
    cells only. (Morton fails this: e.g. z-keys 1 and 2 are diagonal.)"""
    from snowflake_to_postgres_spark.operators.layout import _hilbert_fold_expr

    bits = 4
    n = 1 << bits
    grid = spark.createDataFrame(
        [(x, y) for x in range(n) for y in range(n)], "bx int, by int"
    ).withColumn("hk", F.expr(_hilbert_fold_expr("bx", "by", bits)))
    cells = {r["hk"]: (r["bx"], r["by"]) for r in grid.collect()}
    assert sorted(cells) == list(range(n * n))  # bijection
    for k in range(1, n * n):
        (x0, y0), (x1, y1) = cells[k - 1], cells[k]
        assert abs(x0 - x1) + abs(y0 - y1) == 1, (k, cells[k - 1], cells[k])


def test_manifest_pruned_scan(spark, sf_dir, tmp_path):
    """Build a Hilbert-clustered table + file-stats manifest; a narrow
    range predicate on either clustered column must (a) select a strict
    subset of files from the manifest and (b) return exactly the rows a
    full scan + filter returns."""
    from snowflake_to_postgres_spark.operators.layout import (
        build_manifest,
        scan_with_manifest,
        write_hilbert,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_custkey").cast("bigint").alias("cx"),
        F.datediff("o_orderdate", F.lit("1992-01-01").cast("date"))
        .cast("bigint")
        .alias("cy"),
    )
    out = str(tmp_path / "clustered")
    write_hilbert(orders, "cx", "cy", out, n_files=N_FILES)
    n_manifest = build_manifest(spark, out, ["cx", "cy"])
    assert n_manifest == N_FILES

    hi_cx = orders.agg(F.max("cx")).collect()[0][0]
    lo, hi = 1, max(2, hi_cx // 20)  # ~5% of the cx domain
    got, picked, total = scan_with_manifest(spark, out, "cx", lo, hi)
    assert total == N_FILES and 0 < picked < N_FILES, (picked, total)
    exp = sorted(
        r["o_orderkey"] for r in orders.filter(F.col("cx").between(lo, hi)).collect()
    )
    assert sorted(r["o_orderkey"] for r in got.collect()) == exp

    # empty-range predicate selects zero files and returns zero rows
    empty, p0, _ = scan_with_manifest(spark, out, "cx", hi_cx + 10, hi_cx + 20)
    assert p0 == 0 and empty.count() == 0

    # the second clustered dim prunes too (the whole point vs single sort)
    lo_cy, hi_cy = orders.agg(F.min("cy"), F.max("cy")).collect()[0]
    _, picked_y, _ = scan_with_manifest(
        spark, out, "cy", lo_cy, lo_cy + max(2, (hi_cy - lo_cy) // 20)
    )
    assert 0 < picked_y < N_FILES


def test_hilbert_write_preserves_null_rows(spark, tmp_path):
    """A clustering rewrite must be row-preserving: rows with NULL in a
    clustering column keep a NULL key instead of being dropped."""
    from snowflake_to_postgres_spark.operators.layout import hilbert_key, write_hilbert

    df = spark.createDataFrame(
        [(1, 10, 20), (2, None, 30), (3, 40, None), (4, 50, 60)],
        "id bigint, cx bigint, cy bigint",
    )
    keyed = hilbert_key(df, "cx", "cy")
    assert keyed.count() == 4
    assert keyed.filter(F.col("_hkey").isNull()).count() == 2
    out = str(tmp_path / "h_nulls")
    write_hilbert(df, "cx", "cy", out, n_files=2)
    assert spark.read.parquet(out).count() == 4


def test_hilbert_bits_guard_and_fold_fallback(spark):
    """bits above the LUT cap must not build a 4^bits driver loop
    (round-6 verdict #3): the LUT builder raises, and hilbert_key falls
    back to the fold expression — whose keys must match the canonical
    python xy2d at the same order."""
    import pytest as _pytest

    from snowflake_to_postgres_spark.operators.layout import (
        _LUT_MAX_BITS,
        _hilbert_lut,
        hilbert_key,
    )

    with _pytest.raises(ValueError, match="driver LUT"):
        _hilbert_lut(spark, _LUT_MAX_BITS + 1)

    bits = _LUT_MAX_BITS + 1
    n = 1 << bits
    # Points at the corners + a diagonal sample of the (huge) grid; the
    # stats pass sees min=0/max=n-1 so bins are the identity.
    pts = [(0, 0, 0), (1, n - 1, n - 1), (2, n - 1, 0), (3, 0, n - 1),
           (4, n // 2, n // 3), (5, 1234, n - 2)]
    df = spark.createDataFrame(pts, "id bigint, cx bigint, cy bigint")
    keyed = {r["id"]: (r["_hx"], r["_hy"], r["_hkey"])
             for r in hilbert_key(df, "cx", "cy", bits=bits).collect()}

    def xy2d(x, y):
        d, s = 0, n // 2
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x, y = n - 1 - x, n - 1 - y
                x, y = y, x
            s //= 2
        return d

    for pid, cx, cy in pts:
        hx, hy, hk = keyed[pid]
        assert (hx, hy) == (cx, cy)
        assert hk == xy2d(cx, cy), f"fold mismatch at ({cx},{cy})"


def test_zorder_bits_guard(spark):
    from snowflake_to_postgres_spark.operators.layout import zorder_key
    import pytest as _pytest

    df = spark.createDataFrame([(1, 2, 3)], "id bigint, cx bigint, cy bigint")
    with _pytest.raises(ValueError, match="Morton"):
        zorder_key(df, "cx", "cy", bits=32)


def test_hilbert_lut_cache_evicts_dead_sessions(spark):
    """Entries keyed by a dead applicationId are dropped when a new
    session inserts (round-6 verdict #8)."""
    from snowflake_to_postgres_spark.operators import layout

    app_id = spark.sparkContext.applicationId
    layout._LUT_CACHE[("dead-app-123", 8)] = "stale-sentinel"
    layout._LUT_CACHE.pop((app_id, 4), None)
    layout._hilbert_lut(spark, 4)
    assert ("dead-app-123", 8) not in layout._LUT_CACHE
    assert (app_id, 4) in layout._LUT_CACHE
