"""RP-LSH recall/selectivity ladder (round-12 verdict #2).

The 100-TB story for the RP-LSH path is that ``bits`` grows as
log2(N/occupancy), so the probed bucket fraction
tables·C(bits,≤radius)/2^bits COLLAPSES with corpus size while recall
holds. Round 12 shipped that as prose math; this tool MEASURES the
trend on the fixture: for each bits rung it reports, side by side,

  - mean/min recall@3 vs brute-force truth over the standard query
    block (missing queries count 0 — the sim_ann_recall convention),
  - candidates per query and the candidate fraction of the corpus
    (the cost term that predicts scan volume at scale),
  - the probed bucket fraction (the analytic selectivity dial),
  - warm median wall-clock of the full top-k query.

Usage: python tools/rp_ladder.py [sf_dir]   (default $SPARK_GRAFT_SF_DIR
or /root/testdata/sf0.1; writes a markdown table to stdout)
"""

from __future__ import annotations

import os
import statistics
import sys
import time
from math import comb
from pathlib import Path

_REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(_REPO))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = (
    sys.argv[1]
    if len(sys.argv) > 1
    else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
)
RUNS = 3
#: (bits, tables, radius) rungs: the shipped config first, then the
#: bits ladder the verdict asked for. tables/radius held at the shipped
#: values so the bits dial is isolated.
CONFIGS = [(6, 4, 2), (8, 4, 2), (10, 4, 2)]


def main() -> None:
    from snowflake_to_postgres_spark.operators import similarity as sim
    from snowflake_to_postgres_spark.session import get_spark

    spark = get_spark(app_name="rp-ladder")
    spark.sparkContext.setLogLevel("ERROR")

    comp = sim._components(spark, SF_DIR).persist()
    corpus_n = comp.select("vec_id").distinct().count()
    truth = (
        sim.sim_topk_bruteforce(spark, SF_DIR)
        .filter(F.col("rank") <= sim.ANN_EVAL_K)
        .select("qid", "neighbor_id")
        .persist()
    )
    n_queries = truth.select("qid").distinct().count()
    print(
        f"# corpus {corpus_n} vectors, {n_queries} queries, "
        f"truth@{sim.ANN_EVAL_K}, sf_dir={SF_DIR}",
        file=sys.stderr,
    )

    rows = []
    for bits, tables, radius in CONFIGS:
        n_probe_buckets = tables * sum(comb(bits, r) for r in range(radius + 1))
        probed_frac = n_probe_buckets / (tables * (1 << bits))
        cand = sim.rp_lsh_candidates(comp, bits, tables, radius).persist()
        n_cand = cand.count()
        topk = sim._rank_candidates(comp, cand, k=3).filter(
            F.col("rank") <= sim.ANN_EVAL_K
        )
        hits = (
            truth.join(topk.select("qid", "neighbor_id"), ["qid", "neighbor_id"],
                       "left_semi")
            .groupBy("qid")
            .agg(F.count("*").alias("hits"))
        )
        recalls = [
            r["hits"] / sim.ANN_EVAL_K
            for r in truth.select("qid").distinct()
            .join(hits, "qid", "left")
            .select(F.coalesce("hits", F.lit(0)).alias("hits"))
            .collect()
        ]
        cand.unpersist()

        # warm median of the FULL query (candidates + exact rescore)
        def run():
            sim._rank_candidates(
                comp, sim.rp_lsh_candidates(comp, bits, tables, radius), k=3
            ).write.format("noop").mode("overwrite").save()

        run()
        ts = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            run()
            ts.append(time.perf_counter() - t0)

        rows.append(
            {
                "bits": bits,
                "tables": tables,
                "radius": radius,
                "mean_recall": statistics.mean(recalls),
                "min_recall": min(recalls),
                "cand_per_query": n_cand / n_queries,
                "cand_frac": n_cand / n_queries / corpus_n,
                "probed_frac": probed_frac,
                "sec": statistics.median(ts),
            }
        )

    print(f"\n## RP-LSH ladder at {SF_DIR} (tables=4, radius=2)\n")
    print(
        "| bits | mean/min recall@3 | candidates/query "
        "| candidate frac of corpus | probed bucket frac | warm median |"
    )
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['bits']} | {r['mean_recall']:.3f} / {r['min_recall']:.2f} "
            f"| {r['cand_per_query']:.0f} | {r['cand_frac']:.3f} "
            f"| {r['probed_frac']:.4f} | {r['sec']:.2f} s |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
