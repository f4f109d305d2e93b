"""Bucketed-table layout: pre-shuffled, co-located joins.

At 100 TB the dominant cost of lineitem⋈orders-shaped joins is the
shuffle of both sides on the key. Writing both tables bucketed by that
key (`bucketBy(n, key).sortBy(key)`) moves the shuffle to write time,
once; every subsequent join/groupBy on the key is exchange-free. This is
the Spark analog of the co-located table strategy warehouses use, and
the right layout for fact tables that are joined far more often than
rewritten.

Tests assert the join plan over the bucketed pair contains **zero
Exchange** operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 8,
    sorted_by: str | None = None,
) -> None:
    """Persist to the Spark catalog bucketed (and optionally sorted)
    by the join key. The one-time shuffle happens here."""
    writer = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sorted_by:
        writer = writer.sortBy(sorted_by)
    writer.format("parquet").saveAsTable(table_name)


def bucketed_pair_join(
    spark: SparkSession, left_table: str, right_table: str, key_left: str, key_right: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket keys — with matching
    bucket counts Spark plans a SortMergeJoin with no Exchange on either
    side."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, left[key_left] == right[key_right])
