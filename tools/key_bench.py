"""Per-key micro-bench for optimization A/Bs (round 14).

Times individual registry keys under the SAME protocol as bench.py
(construct + noop-sink execution, cold pass then N interleaved warm
rounds) without paying for the whole headline suite. Used for
before/after evidence in OPTIMIZATION_r14.md; the committed
BENCH_DETAIL.json stays the cross-round baseline.

Usage: python tools/key_bench.py key1 [key2 ...] [--runs N] [--sf DIR]
       python tools/key_bench.py --explain key1 ...   (print formatted plans)
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


def main() -> int:
    args = [a for a in sys.argv[1:]]
    runs = 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    explain = False
    keys: list[str] = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--runs":
            runs = int(args[i + 1]); i += 2
        elif a == "--sf":
            sf_dir = args[i + 1]; i += 2
        elif a == "--explain":
            explain = True; i += 1
        else:
            keys.append(a); i += 1

    from snowflake_to_postgres_spark.registry import queries
    from snowflake_to_postgres_spark.session import get_spark

    spark = get_spark(app_name="key_bench")
    qs = queries()
    missing = [k for k in keys if k not in qs]
    if missing:
        print(f"unknown keys: {missing}", file=sys.stderr)
        return 2

    if explain:
        for k in keys:
            print(f"===== {k} =====")
            df = qs[k](spark, sf_dir)
            print(
                spark._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
            )
        spark.stop()
        return 0

    cold: dict[str, float] = {}
    for k in keys:
        spark.sparkContext.setJobDescription(f"key_bench cold {k}")
        t0 = time.perf_counter()
        qs[k](spark, sf_dir).write.format("noop").mode("overwrite").save()
        cold[k] = time.perf_counter() - t0

    samples: dict[str, list[float]] = {k: [] for k in keys}
    construct: dict[str, list[float]] = {k: [] for k in keys}
    for r in range(runs):
        rot = keys[r % len(keys):] + keys[: r % len(keys)]
        for k in rot:
            spark.sparkContext.setJobDescription(f"key_bench warm {k}")
            t0 = time.perf_counter()
            df = qs[k](spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            samples[k].append(time.perf_counter() - t0)
            construct[k].append(t1 - t0)

    print(f"{'key':34s} {'med':>7s} {'min':>7s} {'max':>7s} {'constr':>7s} {'cold':>7s}")
    for k in keys:
        ts = samples[k]
        print(
            f"{k:34s} {statistics.median(ts):7.3f} {min(ts):7.3f} "
            f"{max(ts):7.3f} {statistics.median(construct[k]):7.3f} {cold[k]:7.3f}"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
