"""Round-14 ABAB: emb_kmeans round-collect topology.

Arms:
  A_collect   current — each Lloyd's round collects the K x dim centroid
              table and re-enters it as a literal frame (3 collect jobs
              + 1 final job)
  B_foldlast  rounds 1..N-1 collect; the LAST round's centroid frame
              stays lazy and enters the final assignment as a broadcast
              subplan (N-1 collect jobs + 1 final job)
  C_foldall   no collects — every round's centroids are a broadcast
              subplan over the previous round's frame (1 job total,
              nested broadcast builds)

All three compute the identical gridded recurrence (same expression
trees; the collect/createDataFrame hop neither adds nor removes any
arithmetic). DIFF lines prove row equality vs the registered query.
"""

from __future__ import annotations

import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(_REPO))

from pyspark.sql import functions as F  # noqa: E402


def _build(spark, sf_dir, collect_rounds: int):
    """collect_rounds: how many of the KMEANS_ITERS rounds end in a
    driver collect (the rest stay lazy broadcast subplans)."""
    from pyspark.sql import types as T

    from snowflake_to_postgres_spark.operators.similarity import (
        KMEANS_ITERS,
        KMEANS_K,
        _components,
        _ivf_cell_d2,
        _w_assign,
    )

    comp = _components(spark, sf_dir)
    cents = comp.filter(F.col("vec_id") < KMEANS_K).select(
        F.col("vec_id").alias("cid"), "idx", F.col("val").alias("cval")
    )
    cschema = T.StructType(
        [
            T.StructField("cid", cents.schema["cid"].dataType),
            T.StructField("idx", cents.schema["idx"].dataType),
            T.StructField("cval", cents.schema["cval"].dataType),
        ]
    )
    for it in range(KMEANS_ITERS):
        d2 = _ivf_cell_d2(comp, cents)
        assign = (
            d2.withColumn("rn", F.row_number().over(_w_assign()))
            .filter(F.col("rn") == 1)
            .select("vec_id", "cid")
        )
        means = (
            assign.join(comp, "vec_id")
            .groupBy("cid", "idx")
            .agg(
                (
                    F.floor(
                        (F.sum("val").cast("double") / F.count("*")) * F.lit(1e9)
                        + F.lit(0.5)
                    )
                    / F.lit(1e9)
                )
                .cast(cents.schema["cval"].dataType.simpleString())
                .alias("mval")
            )
        )
        nxt = cents.join(means, ["cid", "idx"], "left").select(
            "cid", "idx", F.coalesce("mval", F.col("cval")).alias("cval")
        )
        if it < collect_rounds:
            rows = nxt.collect()
            cents = spark.createDataFrame(
                [(r["cid"], r["idx"], r["cval"]) for r in rows], cschema
            )
        else:
            cents = nxt
    final = _ivf_cell_d2(comp, cents)
    best = (
        final.withColumn("rn", F.row_number().over(_w_assign()))
        .filter(F.col("rn") == 1)
        .select("cid", "d2")
    )
    return (
        best.groupBy("cid")
        .agg(
            F.count("*").cast("bigint").alias("n_members"),
            (
                F.floor(F.sum("d2").cast("double") * F.lit(1e6) + F.lit(0.5))
                / F.lit(1e6)
            ).alias("inertia"),
        )
        .orderBy("cid")
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from snowflake_to_postgres_spark.operators.similarity import (
        KMEANS_ITERS,
        emb_kmeans,
    )
    from snowflake_to_postgres_spark.session import get_spark
    from tools.exp_abab import run_abab

    spark = get_spark(app_name="exp_kmeans")
    old = emb_kmeans(spark, sf_dir)
    for nm, cr in [("B_foldlast", KMEANS_ITERS - 1), ("C_foldall", 0)]:
        v = _build(spark, sf_dir, cr)
        print(
            f"DIFF {nm} vs registered:",
            old.exceptAll(v).count(),
            v.exceptAll(old).count(),
        )
    run_abab(
        {
            "A_collect": lambda s, d: _build(s, d, KMEANS_ITERS),
            "B_foldlast": lambda s, d: _build(s, d, KMEANS_ITERS - 1),
            "C_foldall": lambda s, d: _build(s, d, 0),
        },
        sf_dir=sf_dir,
        rounds=rounds,
        spark=spark,
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
