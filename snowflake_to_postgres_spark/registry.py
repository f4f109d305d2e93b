"""Query registry: the single source of truth behind ``__spark_entry__``.

Every implemented operator from SURVEY.md §2 (plus the LLM-pipeline
extensions) registers a :class:`QuerySpec` here: a PySpark callable
``(spark, sf_dir) -> DataFrame`` and, where SQL-expressible, the exact
DuckDB oracle SQL the driver runs side-by-side.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    doc: str = ""


def _all_specs() -> list[QuerySpec]:
    # Imported lazily so `import snowflake_to_postgres_spark` stays cheap.
    from snowflake_to_postgres_spark.operators import (
        analytics_ext,
        breadth,
        dedup,
        temporal_joins,
        multimodal,
        relational,
        scalar_funcs,
        similarity,
        text,
        validation,
    )
    from snowflake_to_postgres_spark.streaming import queries as streaming_queries

    specs: list[QuerySpec] = []
    for mod in (
        relational,
        scalar_funcs,
        validation,
        analytics_ext,
        dedup,
        similarity,
        text,
        multimodal,
        breadth,
        temporal_joins,
        streaming_queries,
    ):
        specs.extend(mod.SPECS)
    names = [s.name for s in specs]
    assert len(names) == len(set(names)), "duplicate query names in registry"
    return specs


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {s.name: s.fn for s in _all_specs()}


def oracle_sql() -> dict[str, str]:
    return {s.name: s.oracle for s in _all_specs() if s.oracle is not None}
