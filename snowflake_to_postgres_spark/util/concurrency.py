"""Concurrent driver-side Spark actions (optimization guide §2.6).

Several registered queries run a handful of INDEPENDENT Spark actions
(collects of bounded sketch/model frames) back to back; their wall time
is the SUM of per-job latencies even though each job leaves most of the
cluster idle. Spark's scheduler happily runs jobs concurrently — actions
are only sequential because driver code calls them sequentially — so
submitting independent actions from a small thread pool turns the sum
into roughly the max. Results are unchanged: each action is an
independent job whose result is deterministic on its own.

``pyspark.InheritableThread`` semantics are not needed here: job
descriptions/groups are thread-local, so each worker sets its own, and
the FAIR scheduler (session default) shares executor slots.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from concurrent.futures import ThreadPoolExecutor
from typing import Any

#: Cap on in-flight concurrent actions: enough to overlap scheduling
#: latency of small jobs, not so many that large stages fight for
#: executor slots (guide §2.6 "2-3 jobs in flight is plenty" — the
#: bounded-collect jobs here are smaller than its example jobs, so 4).
MAX_CONCURRENT_ACTIONS = 4


def run_actions(*thunks: Callable[[], Any]) -> list[Any]:
    """Run independent Spark actions concurrently; return their results
    in argument order. Exceptions propagate (the first raised wins)."""
    if len(thunks) == 1:
        return [thunks[0]()]
    with ThreadPoolExecutor(
        max_workers=min(MAX_CONCURRENT_ACTIONS, len(thunks))
    ) as pool:
        futures = [pool.submit(t) for t in thunks]
        return [f.result() for f in futures]


def collect_all(frames: Sequence[Any]) -> list[list]:
    """``[df.collect() for df in frames]`` with the collects overlapped."""
    return run_actions(*[df.collect for df in frames])
