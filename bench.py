"""Benchmark: headline queries + a transfer-throughput run at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "headline_total_sec", "value": N, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ...,
   "transfer_rows_per_sec": R, "lineitem_rows": N}

The reference's comparison band (BASELINE.md) is transfer throughput of
50k-200k rows/s (tuned); ``transfer_rows_per_sec`` is the apples-to-apples
number: full lineitem read → parquet write, native types end-to-end.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


HEADLINE = [
    "q1_pricing_summary",
    "a2_group_count_by_date",
    "a3_fingerprint_by_date",
    "a4_null_counts",
    "j1_equi_join_chain",
    "j2_multiway_join_topk",
    "j4_fullouter_key_align",
    "w1_topk_per_group",
    "g1_rollup",
    "x_q5_local_volume",
    "x_sessionization",
    "x_approx_sketches",
    "st_windowed_agg",
    "dedup_exact_groups",
    "dedup_minhash_lsh_pairs",
    "dedup_simhash_pairs",
    "sim_topk_bruteforce",
    "tx_quality_score",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from snowflake_to_postgres_spark.registry import queries
    from snowflake_to_postgres_spark.session import get_spark
    from snowflake_to_postgres_spark.sources import load_table

    spark = get_spark(app_name="bench")
    qs = queries()

    # Warm-up pass: JIT/codegen/parquet-footer caches, so the timed pass
    # measures steady-state plan execution rather than JVM startup.
    for name in HEADLINE:
        fn = qs.get(name)
        if fn is not None:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    per_query: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = qs.get(name)
        if fn is None:
            continue
        df = fn(spark, sf_dir)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        per_query[name] = round(dt, 3)
        total += dt

    # Transfer throughput: the reference's headline metric (BASELINE.md).
    li = load_table(spark, sf_dir, "lineitem")
    n_rows = li.count()
    out = tempfile.mkdtemp(prefix="bench_transfer_")
    try:
        t0 = time.perf_counter()
        li.write.mode("overwrite").parquet(os.path.join(out, "lineitem"))
        transfer_sec = time.perf_counter() - t0
    finally:
        shutil.rmtree(out, ignore_errors=True)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    result = {
        "metric": "headline_total_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": per_query,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "lineitem_rows": n_rows,
        "transfer_sec": round(transfer_sec, 3),
        "transfer_rows_per_sec": int(n_rows / transfer_sec) if transfer_sec > 0 else None,
    }
    print(json.dumps(result))
    sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
