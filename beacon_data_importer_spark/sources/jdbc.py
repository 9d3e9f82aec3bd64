"""JDBC source/sink — the Postgres boundary of the reference (S6:
``\\COPY`` bulk load, ``README.md:53,73-78``) as Spark's jdbc reader/
writer.

No Postgres server runs in this environment, but Spark ships the
embedded Derby JDBC driver, so the wrappers are exercised end-to-end
against a real file-backed database (tests/test_jdbc_roundtrip.py:
write → partitioned read → value parity).  The engine's chosen design
keeps the import stage itself in Spark temp views (SURVEY §2.1 S6),
with JDBC as the ingress/egress boundary.

Scale notes baked into the defaults:
  * reads partition on a numeric column (`partitionColumn` +
    lower/upper bound) — a single-connection read of a 100 GB table is
    the classic JDBC mistake;
  * writes batch inserts (`batchsize`) and bound parallelism
    (`numPartitions`) so the database is not hammered by 1000 executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    **options: str,
) -> DataFrame:
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batchsize: int = 10_000,
    num_partitions: int = 8,
    **options: str,
) -> None:
    writer = (
        df.repartition(num_partitions)
        .write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .mode(mode)
    )
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save()
