"""JDBC source/sink: the engine's path to real Snowflake/Postgres
backends (S1/S11/S12), config-gated since this environment has no live
database.

The key scale decision the reference never had: **partitioned reads**
(``partitionColumn/lowerBound/upperBound/numPartitions``) give intra-table
parallelism — the reference's single cursor per table was its documented
bottleneck (SURVEY §4 'intra-table parallelism: none'). Writes batch via
``batchsize`` and parallelize per partition, replacing the hand-rolled
COPY/executemany loop (data_transfer.py:210-520).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class JdbcConfig:
    url: str                      # e.g. jdbc:postgresql://host:5432/db
    user: str | None = None
    password: str | None = None
    driver: str | None = None     # e.g. org.postgresql.Driver
    fetchsize: int = 10_000       # read batching (replaces --batch-size)
    batchsize: int = 10_000       # write batching
    properties: dict[str, str] = field(default_factory=dict)

    def options(self) -> dict[str, str]:
        out = {"url": self.url, "fetchsize": str(self.fetchsize)}
        if self.user:
            out["user"] = self.user
        if self.password:
            out["password"] = self.password
        if self.driver:
            out["driver"] = self.driver
        out.update(self.properties)
        return out


def read_options(
    cfg: JdbcConfig,
    table: str | None = None,
    query: str | None = None,
    partition_column: str | None = None,
    lower_bound=None,
    upper_bound=None,
    num_partitions: int | None = None,
) -> dict[str, str]:
    """Build the reader option map. ``table`` XOR ``query`` (the
    reference's WHERE/LIMIT pushdown arrives here as a dbtable
    subquery or via Catalyst filter pushdown on the table read)."""
    if (table is None) == (query is None):
        raise ValueError("exactly one of table/query is required")
    opts = cfg.options()
    if table:
        opts["dbtable"] = table
    else:
        opts["query"] = query
    if partition_column:
        if num_partitions is None or lower_bound is None or upper_bound is None:
            raise ValueError(
                "partitioned read needs partitionColumn + bounds + numPartitions"
            )
        opts.update(
            {
                "partitionColumn": partition_column,
                "lowerBound": str(lower_bound),
                "upperBound": str(upper_bound),
                "numPartitions": str(num_partitions),
            }
        )
    return opts


def read_jdbc(spark: SparkSession, cfg: JdbcConfig, **kw) -> DataFrame:
    return spark.read.format("jdbc").options(**read_options(cfg, **kw)).load()


def write_jdbc(
    df: DataFrame,
    cfg: JdbcConfig,
    table: str,
    mode: str = "append",
    truncate: bool = False,
) -> None:
    """S11/S12 as one writer: Spark's JDBC sink batches INSERTs per
    partition (``batchsize``); for Postgres COPY-speed parity add
    ``reWriteBatchedInserts=true`` to the URL properties."""
    opts = cfg.options()
    opts["dbtable"] = table
    opts["batchsize"] = str(cfg.batchsize)
    if truncate:
        opts["truncate"] = "true"
    df.write.format("jdbc").options(**opts).mode(mode).save()
