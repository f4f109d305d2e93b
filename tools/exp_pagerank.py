"""Round-14 ABAB experiment: pagerank per-round join strategy + cadence.

Arms (all produce the identical gridded recurrence):
  A  current kernel (SMJ per round, cadence 4)
  B  SHUFFLE_HASH hint on the rank side (skip both per-round sorts)
  C  cadence 8 (no intermediate barrier for the 8-iter registered query)
  D  B + C

Paired in-process protocol: one JVM, arms alternate per round so ambient
stalls hit every arm equally. Prints per-arm medians and the round-plan
join node for A and B.
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

from pyspark.sql import functions as F  # noqa: E402


def build(spark, sf_dir, shj: bool, cadence: int):
    from snowflake_to_postgres_spark.operators.pipeline_ext import (
        PR_DAMP,
        PR_ITERS,
        _bucketed_trade_edges,
        _grid,
    )

    edges = _bucketed_trade_edges(spark, sf_dir)
    deg = edges.groupBy("src").agg(F.count("*").alias("deg")).persist()
    n = deg.count()
    e = edges.join(deg, "src").select("src", "dst", "deg").persist()
    ranks = deg.select(F.col("src").alias("node"), F.lit(1.0 / n).alias("rank"))
    for i in range(PR_ITERS):
        r = ranks.hint("SHUFFLE_HASH") if shj else ranks
        contribs = e.join(r, e["src"] == r["node"]).select(
            F.col("dst").alias("node"), (F.col("rank") / F.col("deg")).alias("c")
        )
        new_ranks = contribs.groupBy("node").agg(F.sum("c").alias("s")).select(
            "node",
            _grid(F.lit((1.0 - PR_DAMP) / n) + F.lit(PR_DAMP) * F.col("s")).alias(
                "rank"
            ),
        )
        if (i + 1) % cadence == 0 or i == PR_ITERS - 1:
            new_ranks = new_ranks.localCheckpoint(eager=True)
        ranks = new_ranks
    out = ranks.select(
        F.when(F.col("node") % 2 == 0, F.lit("customer"))
        .otherwise(F.lit("supplier"))
        .alias("node_kind"),
        (F.col("node") / 2).cast("bigint").alias("key"),
        F.col("rank"),
    ).orderBy("node_kind", "key")
    out.write.format("noop").mode("overwrite").save()
    deg.unpersist()
    e.unpersist()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from snowflake_to_postgres_spark.session import get_spark

    spark = get_spark(app_name="exp_pagerank")
    arms = {
        "A_smj_c4": dict(shj=False, cadence=4),
        "B_shj_c4": dict(shj=True, cadence=4),
        "C_smj_c8": dict(shj=False, cadence=8),
        "D_shj_c8": dict(shj=True, cadence=8),
    }
    # plan probe: one un-executed round, both join strategies
    from snowflake_to_postgres_spark.operators.pipeline_ext import (
        _bucketed_trade_edges,
    )

    edges = _bucketed_trade_edges(spark, sf_dir)
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    e = edges.join(deg, "src").select("src", "dst", "deg")
    ranks = deg.select(F.col("src").alias("node"), F.lit(0.01).alias("rank"))
    for nm, r in [("smj", ranks), ("shj", ranks.hint("SHUFFLE_HASH"))]:
        p = e.join(r, e["src"] == r["node"]).groupBy(F.col("dst")).agg(
            F.sum(F.col("rank") / F.col("deg"))
        )
        txt = spark._jvm.PythonSQLUtils.explainString(
            p._jdf.queryExecution(), "simple"
        )
        joins = [
            ln.strip()[:90]
            for ln in txt.splitlines()
            if "Join" in ln or "Sort " in ln or ln.strip().startswith("+- Sort")
        ]
        print(f"round-plan [{nm}]: " + " | ".join(joins))

    # warmup once per arm
    for nm, kw in arms.items():
        build(spark, sf_dir, **kw)
    times: dict[str, list[float]] = {k: [] for k in arms}
    for r in range(rounds):
        for nm, kw in arms.items():
            spark.sparkContext.setJobDescription(f"exp_pagerank {nm} r{r}")
            t0 = time.perf_counter()
            build(spark, sf_dir, **kw)
            times[nm].append(time.perf_counter() - t0)
    for nm, ts in times.items():
        print(
            f"{nm}: med={statistics.median(ts):.3f} min={min(ts):.3f} "
            f"max={max(ts):.3f} all={[round(t, 2) for t in ts]}"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
