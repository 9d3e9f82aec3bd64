"""End-to-end exercise of the JDBC boundary (SURVEY §2.1 S6 — the
reference bulk-loads CSVs into Postgres via ``\\COPY``,
``README.md:73-78``).  No Postgres server exists in this sandbox, but
Spark bundles the embedded Derby driver, so the write_jdbc /
read_jdbc wrappers run against a real file-backed SQL database:

  * write: batched inserts, bounded parallelism (the anti-hammer
    defaults);
  * read back plain AND with a partitioned read (partitionColumn +
    bounds → one query per partition — the scale path for big tables);
  * value parity with the original frame.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest

from beacon_data_importer_spark.sources.jdbc import read_jdbc, write_jdbc

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby_url():
    d = tempfile.mkdtemp(prefix="derby_jdbc_")
    url = f"jdbc:derby:{d}/testdb;create=true"
    yield url
    shutil.rmtree(d, ignore_errors=True)


def _rows(df):
    return sorted(
        (r.custkey, r.name, r.spend_cents) for r in df.collect()
    )


def test_jdbc_write_then_read_roundtrip(spark, sf_dir, derby_url):
    from pyspark.sql import functions as F

    from beacon_data_importer_spark.sources.parquet import read_table

    src = (
        read_table(spark, sf_dir, "customer")
        .select(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            F.round(F.col("c_acctbal") * 100, 0).cast("bigint").alias(
                "spend_cents"
            ),
        )
        .limit(200)
    )
    write_jdbc(
        src,
        derby_url,
        "staged_customers",
        mode="overwrite",
        num_partitions=2,
        driver=DRIVER,
    )

    plain = read_jdbc(spark, derby_url, "staged_customers", driver=DRIVER)
    assert _rows(plain) == _rows(src)

    lo, hi = 0, 300
    parted = read_jdbc(
        spark,
        derby_url,
        "staged_customers",
        partition_column="custkey",
        lower_bound=lo,
        upper_bound=hi,
        num_partitions=4,
        driver=DRIVER,
    )
    assert parted.rdd.getNumPartitions() == 4
    assert _rows(parted) == _rows(src)


def test_jdbc_append_accumulates(spark, derby_url):
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [Row(custkey=9001, name="x", spend_cents=100)]
    )
    write_jdbc(df, derby_url, "append_t", mode="overwrite", driver=DRIVER)
    write_jdbc(df, derby_url, "append_t", mode="append", driver=DRIVER)
    back = read_jdbc(spark, derby_url, "append_t", driver=DRIVER)
    assert back.count() == 2
