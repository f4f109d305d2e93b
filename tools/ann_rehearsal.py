"""10x scale rehearsal for the ANN retrieval path (round-7 verdict #6).

PageRank got a 10x rehearsal in round 6; this gives the production
retrieval story one: the IVF+PQ index BUILD (`build_ann_index`), the
materialized SEARCH (`sim_ivf_pq_search`), and the composed
`sim_mmr_ann` rerank, measured at sf0.1 (2,000 vectors) and on a 10x
jittered replication (20,000 vectors).

Two cell regimes at 10x:

* cells=8 (the fixture constant, held fixed) — isolates data growth:
  build should be ~linear, per-query ADC work grows with cell occupancy
  (10x cells-held-fixed is the WRONG production setting, shown for
  contrast);
* cells=24 ≈ 8·sqrt(10) (occupancy-scaled, how production provisions
  IVF) — per-query scanned candidates grow ~sqrt(10), i.e. SUBLINEAR in
  the corpus, because n_cells grows with it while N_PROBE stays fixed.

The scanned-candidate count (code rows in probed cells) is reported
next to wall-clock: at these corpus sizes wall-clock is mostly Spark
stage-scheduling floor, so the scan volume is the number that predicts
100 TB behavior.

Usage: python tools/ann_rehearsal.py  (writes a markdown table to stdout)
"""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(_REPO))

from pyspark.sql import functions as F  # noqa: E402

BASE_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BIG_DIR = "/tmp/ann_rehearsal_sfbig"
REPLICAS = 10
RUNS = 3


def make_big_corpus(spark) -> int:
    """Replicate embeddings REPLICASx with deterministic per-component
    jitter (replica 0 = the originals, so the qid<N_QUERIES query block
    is unchanged); ids offset by replica*N."""
    from snowflake_to_postgres_spark.sources import load_table

    emb = load_table(spark, BASE_SF, "embeddings")
    n = emb.count()
    parts = []
    for r in range(REPLICAS):
        e = emb.select(
            (F.col("vec_id") + F.lit(r * n)).alias("vec_id"),
            F.col("embedding") if r == 0 else F.transform(
                "embedding",
                lambda x, i: x
                + ((F.col("vec_id") * 31 + i * 7 + r) % 997 - 498).cast("float")
                * F.lit(1e-6),
            ).alias("embedding"),
        )
        parts.append(e)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    shutil.rmtree(BIG_DIR, ignore_errors=True)
    out.write.mode("overwrite").parquet(f"{BIG_DIR}/embeddings.parquet")
    return n * REPLICAS


def timed(fn, runs=RUNS) -> float:
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def scanned_candidates(spark, index_dir: str) -> int:
    """Code rows inside the probed cells for the standard query block —
    the per-query-block ADC scan volume (the number that scales)."""
    from snowflake_to_postgres_spark.operators import similarity as sim

    comp = spark.read.parquet(f"{index_dir}/components")
    cent = spark.read.parquet(f"{index_dir}/centroids")
    q = comp.filter(F.col("vec_id") < sim.N_QUERIES)
    probes = sim._ivf_probes(sim._ivf_cell_d2(q, cent))
    cells = sorted({r["cell"] for r in probes.collect()})
    codes = spark.read.parquet(f"{index_dir}/codes").filter(F.col("cell").isin(cells))
    return codes.count()


def main() -> None:
    from snowflake_to_postgres_spark.operators import similarity as sim
    from snowflake_to_postgres_spark.session import get_spark

    spark = get_spark(app_name="ann-rehearsal")
    n_big = make_big_corpus(spark)
    print(f"# rehearsal corpus: {n_big} vectors at {BIG_DIR}", file=sys.stderr)

    rows = []
    configs = [
        ("sf0.1 (2k), cells=8", BASE_SF, 8),
        ("10x (20k), cells=8", BIG_DIR, 8),
        ("10x (20k), cells=24", BIG_DIR, 24),
    ]
    orig_cells = sim.N_CENTROIDS
    for label, sf, cells in configs:
        sim.N_CENTROIDS = cells
        idx = f"/tmp/ann_rehearsal_index_{cells}_{'big' if sf == BIG_DIR else 'base'}"
        try:
            # un-timed warm-up build+search first: the first config
            # otherwise absorbs JVM/codegen/parquet-footer warm-up and
            # publishes 2k as slower than 20k
            sim.build_ann_index(spark, sf, idx)
            sim.sim_ivf_pq_search(spark, idx).write.format("noop").mode(
                "overwrite"
            ).save()
            build = timed(lambda: sim.build_ann_index(spark, sf, idx), runs=1)
            search = timed(
                lambda: sim.sim_ivf_pq_search(spark, idx)
                .write.format("noop").mode("overwrite").save()
            )
            cand = scanned_candidates(spark, idx)
            sim.sim_mmr_ann(spark, sf).write.format("noop").mode("overwrite").save()
            mmr = timed(
                lambda: sim.sim_mmr_ann(spark, sf)
                .write.format("noop").mode("overwrite").save()
            )
            rows.append((label, build, search, cand, mmr))
        finally:
            sim.N_CENTROIDS = orig_cells
            shutil.rmtree(idx, ignore_errors=True)

    print("| config | index build (s, 1 run) | search-only median (s) |"
          " ADC code rows scanned | sim_mmr_ann in-query median (s) |")
    print("|---|---|---|---|---|")
    for label, build, search, cand, mmr in rows:
        print(f"| {label} | {build:.2f} | {search:.2f} | {cand:,} | {mmr:.2f} |")
    spark.stop()


if __name__ == "__main__":
    main()
