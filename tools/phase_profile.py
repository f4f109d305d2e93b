"""Phase profiler for the iterative / multi-action construct-heavy keys
(round 14, guide §1/§7.3): times the DRIVER-VISIBLE phases of a query —
fixture setup, per-iteration barriers, scalar collects — so a construct
median from BENCH_DETAIL.json can be attributed to a phase before
touching anything.

Usage: python tools/phase_profile.py <which> [sf_dir] [reps]
  which: pagerank | valref | kmeans
"""

from __future__ import annotations

import os
import statistics
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(_REPO))
os.environ["PYTHONPATH"] = os.pathsep.join(
    [str(_REPO)] + ([os.environ["PYTHONPATH"]] if os.environ.get("PYTHONPATH") else [])
)


def _t(label, fn, out, rep):
    t0 = time.perf_counter()
    r = fn()
    dt = time.perf_counter() - t0
    out.setdefault(label, []).append(dt)
    return r


def profile_pagerank(spark, sf_dir: str, reps: int) -> None:
    from pyspark.sql import functions as F

    from snowflake_to_postgres_spark.operators.pipeline_ext import (
        PR_DAMP,
        PR_ITERS,
        _bucketed_trade_edges,
        _grid,
    )

    out: dict[str, list[float]] = {}
    edges = _bucketed_trade_edges(spark, sf_dir)  # write-once fixture
    # one full warm pass first
    for rep in range(reps + 1):
        o = out if rep else {}
        deg = edges.groupBy("src").agg(F.count("*").alias("deg")).persist()
        n = _t("deg.count", lambda: deg.count(), o, rep)
        e = _t(
            "e.persist",
            lambda: edges.join(deg, "src").select("src", "dst", "deg").persist(),
            o,
            rep,
        )
        ranks = deg.select(F.col("src").alias("node"), F.lit(1.0 / n).alias("rank"))
        for i in range(PR_ITERS):
            contribs = e.join(ranks, e["src"] == ranks["node"]).select(
                F.col("dst").alias("node"), (F.col("rank") / F.col("deg")).alias("c")
            )
            new_ranks = contribs.groupBy("node").agg(F.sum("c").alias("s")).select(
                "node",
                _grid(F.lit((1.0 - PR_DAMP) / n) + F.lit(PR_DAMP) * F.col("s")).alias(
                    "rank"
                ),
            )
            if (i + 1) % 4 == 0 or i == PR_ITERS - 1:
                new_ranks = _t(
                    f"checkpoint@{i + 1}",
                    lambda nr=new_ranks: nr.localCheckpoint(eager=True),
                    o,
                    rep,
                )
            ranks = new_ranks
        _t(
            "final.noop",
            lambda: ranks.write.format("noop").mode("overwrite").save(),
            o,
            rep,
        )
        deg.unpersist()
        e.unpersist()
    for k, v in out.items():
        print(f"{k:18s} med={statistics.median(v):6.3f} min={min(v):6.3f}")


def profile_valref(spark, sf_dir: str, reps: int) -> None:
    from snowflake_to_postgres_spark.operators.validation import (
        val_referential_integrity,
    )

    out: dict[str, list[float]] = {}
    for rep in range(reps + 1):
        o = out if rep else {}
        df = _t("construct", lambda: val_referential_integrity(spark, sf_dir), o, rep)
        _t("exec", lambda: df.write.format("noop").mode("overwrite").save(), o, rep)
    for k, v in out.items():
        print(f"{k:18s} med={statistics.median(v):6.3f} min={min(v):6.3f}")


def profile_kmeans(spark, sf_dir: str, reps: int) -> None:
    from snowflake_to_postgres_spark.operators.similarity import emb_kmeans

    out: dict[str, list[float]] = {}
    for rep in range(reps + 1):
        o = out if rep else {}
        df = _t("construct", lambda: emb_kmeans(spark, sf_dir), o, rep)
        _t("exec", lambda: df.write.format("noop").mode("overwrite").save(), o, rep)
    for k, v in out.items():
        print(f"{k:18s} med={statistics.median(v):6.3f} min={min(v):6.3f}")


def main() -> int:
    which = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from snowflake_to_postgres_spark.session import get_spark

    spark = get_spark(app_name="phase_profile")
    {"pagerank": profile_pagerank, "valref": profile_valref, "kmeans": profile_kmeans}[
        which
    ](spark, sf_dir, reps)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
