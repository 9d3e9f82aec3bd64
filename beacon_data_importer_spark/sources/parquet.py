"""Parquet scan layer for the driver's testdata star schema.

Parquet is the engine's primary columnar source: Catalyst pushes filters
and column pruning into the FileScan (``PushedFilters`` / ``ReadSchema``
in ``.explain``), and partition pruning applies when the layout is
partitioned.  Nothing here fights that — scans stay declarative.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one testdata table (lazy; pruning/pushdown handled by Catalyst).

    The ``events`` table is written with TIMESTAMP(NANOS) parquet, which
    Spark reads as nano-longs under ``nanosAsLong``; the scan layer
    converts back to a microsecond timestamp (integer div — exact; double
    division would lose precision above 2^53 nanos)."""
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    from pyspark.sql import functions as F

    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TESTDATA_TABLES
) -> dict[str, DataFrame]:
    """Scan several tables and register each as a temp view so plans can
    be written in Spark SQL (the reference's Postgres stage analogue,
    SURVEY §2.9 S7/M1)."""
    out: dict[str, DataFrame] = {}
    for name in names:
        df = read_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
