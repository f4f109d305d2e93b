"""SparkSession factory.

Centralizes the session configuration the whole engine assumes:

* UTC session timezone — the reference normalizes tz-aware timestamps to
  UTC before comparing (validator.py:888-896); we make the session itself
  UTC so ``TimestampType`` equality is instant-based and deterministic.
* AQE on — runtime re-planning (skew joins, partition coalescing) is the
  scale story for 100 TB runs; harmless locally.
* Arrow on — vectorized pandas interchange for the few Pandas-UDF
  operators (the reference disabled Arrow to dodge connector bugs,
  connections.py:56-60; that workaround is obsolete here).

Defaults target the driver's local[32]/128 GiB harness but every knob is
overridable for a real cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = "32"


def get_spark(
    app_name: str = "snowflake_to_postgres_spark",
    master: str | None = None,
    shuffle_partitions: str | int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the configured SparkSession.

    On a real cluster ``master`` comes from spark-submit; locally we
    default to ``local[$SPARK_GRAFT_CPUS]`` (driver contract).
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_GRAFT_CPUS" in os.environ:
        master = f"local[{os.environ['SPARK_GRAFT_CPUS']}]"
    if master:
        builder = builder.master(master)

    conf = {
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.shuffle.partitions": str(
            shuffle_partitions
            or os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
        ),
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        # The events fixture stores TIMESTAMP(NANOS) which Spark's parquet
        # reader rejects; read as long and convert in sources.tables.
        "spark.sql.legacy.parquet.nanosAsLong": "true",
        "spark.sql.parquet.filterPushdown": "true",
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
        # FAIR scheduling so cross-table fan-out (transfer engine) can run
        # concurrent jobs, replacing the reference's ThreadPoolExecutor of
        # one-cursor-per-table workers (data_transfer.py:611-668).
        "spark.scheduler.mode": "FAIR",
        "spark.ui.enabled": "false",
        "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    }
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
