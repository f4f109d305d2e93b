"""Generic paired in-process ABAB harness (round 14).

Times N named DataFrame builders under the bench protocol (construct +
noop-sink execution), alternating arms inside ONE JVM so ambient stalls
hit every arm equally. Builders are (spark, sf_dir) -> DataFrame.

Use: from tools.exp_abab import run_abab; run_abab({"old": f, "new": g}).
"""

from __future__ import annotations

import statistics
import time


def run_abab(builders, sf_dir="/root/testdata/sf0.1", rounds=7, spark=None):
    import os
    import sys
    from pathlib import Path

    _REPO = Path(__file__).resolve().parents[1]
    sys.path.insert(0, str(_REPO))
    os.environ["PYTHONPATH"] = os.pathsep.join(
        [str(_REPO)]
        + ([os.environ["PYTHONPATH"]] if os.environ.get("PYTHONPATH") else [])
    )
    from snowflake_to_postgres_spark.session import get_spark

    own = spark is None
    if own:
        spark = get_spark(app_name="exp_abab")
    names = list(builders)
    # warm once per arm (JIT, caches, fixture writes)
    for nm in names:
        builders[nm](spark, sf_dir).write.format("noop").mode("overwrite").save()
    total = {nm: [] for nm in names}
    constr = {nm: [] for nm in names}
    for r in range(rounds):
        rot = names[r % len(names):] + names[: r % len(names)]
        for nm in rot:
            spark.sparkContext.setJobDescription(f"abab {nm} r{r}")
            t0 = time.perf_counter()
            df = builders[nm](spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            total[nm].append(t2 - t0)
            constr[nm].append(t1 - t0)
    for nm in names:
        ts, cs = total[nm], constr[nm]
        print(
            f"RESULT {nm:24s} med={statistics.median(ts):6.3f} "
            f"min={min(ts):6.3f} constr={statistics.median(cs):6.3f} "
            f"all={[round(t, 2) for t in ts]}"
        )
    if own:
        spark.stop()
    return total, constr
