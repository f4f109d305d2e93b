"""Temp-view registration for cached frames referenced from SQL builds.

Round 15 (optimization guide §5 caching / §7.2 plan reading): passing a
``.cache()``/``.persist()``-ed DataFrame as a ``spark.sql`` PARAMETER
(``spark.sql("... {bi} ...", bi=bi)``) does not just miss Spark's
CacheManager — analyzing the substituted query UNREGISTERS the cache
entry, so every later lookup (even plain DataFrame-API references to the
same frame) recomputes from source. Measured in Spark 4.1.2:

* substitution of the cached frame itself  → plan has 0 InMemoryTableScan
  AND subsequent DataFrame-API plans lose theirs too (entry dropped);
* a TEMP VIEW over the cached frame, referenced by name in the same SQL
  string → InMemoryTableScan present, entry intact;
* substitution of UNCACHED frames in the same statement is harmless.

So the rule the engine follows everywhere (pinned by
tests/test_sql_cache_audit.py): frames that are cached/persisted — or
that must READ a cached frame inside the SQL — enter SQL builds through
:func:`temp_view_for`; only cache-free subtrees are passed as
``spark.sql`` parameters.

Views are registered under a per-call unique name (a process-global
counter) so concurrent builders can never replace each other's view
between registration and analysis. ``spark.sql`` analyzes eagerly, and
cache substitution happens per-execution against the CacheManager (not
at name-resolution time), so the view could in principle be dropped
right after the build — but the bounded number of registrations per
session (a few per query construction) is not worth the extra py4j
round trip; names are left registered and are replaced wholesale only
if the counter ever wrapped (it cannot: Python ints are unbounded).
"""

from __future__ import annotations

import itertools
import re

from pyspark.sql import DataFrame

_COUNTER = itertools.count()

_SAFE = re.compile(r"[^0-9a-zA-Z_]+")


def temp_view_for(df: DataFrame, hint: str = "v") -> str:
    """Register ``df`` as a session temp view under a fresh unique name
    and return that name for interpolation into a SQL string."""
    name = f"sqlv_{_SAFE.sub('_', hint)}_{next(_COUNTER)}"
    df.createOrReplaceTempView(name)
    return name
