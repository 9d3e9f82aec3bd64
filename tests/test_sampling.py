"""Unit tests for the dataset-assembly operators (operators/sampling.py):
deterministic splits, quota capping, token-budget sequence packing."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def test_split_assign_is_stable_and_complete(spark):
    from beacon_data_importer_spark.operators.sampling import split_assign

    df = spark.range(1000).select(F.col("id").alias("doc_id"))
    a1 = dict(
        df.select("doc_id", split_assign("doc_id").alias("s")).collect()
    )
    # repartitioning / re-running never changes an assignment
    a2 = dict(
        df.repartition(7)
        .select("doc_id", split_assign("doc_id").alias("s"))
        .collect()
    )
    assert a1 == a2
    counts = {s: 0 for s in ("train", "val", "test")}
    for s in a1.values():
        counts[s] += 1
    assert counts["train"] + counts["val"] + counts["test"] == 1000
    # ~90/5/5 with hash noise
    assert 850 <= counts["train"] <= 950
    assert 20 <= counts["val"] <= 90
    assert 20 <= counts["test"] <= 90


def test_split_assign_grows_without_reshuffling(spark):
    """Adding new documents must not move existing ones between splits."""
    from beacon_data_importer_spark.operators.sampling import split_assign

    small = spark.range(200).select(F.col("id").alias("doc_id"))
    big = spark.range(400).select(F.col("id").alias("doc_id"))
    a_small = dict(
        small.select("doc_id", split_assign("doc_id").alias("s")).collect()
    )
    a_big = dict(
        big.select("doc_id", split_assign("doc_id").alias("s")).collect()
    )
    assert all(a_big[k] == v for k, v in a_small.items())


def test_quota_cap_binds_and_is_deterministic(spark):
    from beacon_data_importer_spark.operators.sampling import quota_cap

    rows = [(i, f"s{i % 3}", i * 37 % 101) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, h bigint")
    out1 = quota_cap(df, "source", "h", 5).collect()
    out2 = quota_cap(df.repartition(13), "source", "h", 5).collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
    by_src = {}
    for r in out1:
        by_src.setdefault(r.source, []).append(r.doc_id)
    assert all(len(v) == 5 for v in by_src.values())


def test_pack_sequences_budget_boundaries(spark):
    from beacon_data_importer_spark.operators.sampling import pack_sequences

    # one shard, docs of 300 tokens each, budget 512:
    # starts at 0,300,600,900,1200 -> packs 0,0,1,1,2
    df = spark.createDataFrame(
        [(i, 300) for i in range(5)], "doc_id bigint, n_tokens bigint"
    )
    out = pack_sequences(df, "doc_id", "n_tokens", 512, shard_col=F.lit(0))
    got = {r.id: r.pack_id for r in out.collect()}
    assert got == {0: 0, 1: 0, 2: 1, 3: 1, 4: 2}


def test_pack_sequences_oversized_doc_gets_own_packs(spark):
    from beacon_data_importer_spark.operators.sampling import pack_sequences

    # doc 1 is 1200 tokens (> budget): starts at 100, next doc starts at
    # 1300 -> pack floor(1300/512)=2; nothing shares doc 1's packs
    df = spark.createDataFrame(
        [(0, 100), (1, 1200), (2, 100)], "doc_id bigint, n_tokens bigint"
    )
    out = pack_sequences(df, "doc_id", "n_tokens", 512, shard_col=F.lit(0))
    got = {r.id: r.pack_id for r in out.collect()}
    assert got == {0: 0, 1: 0, 2: 2}


def test_mixture_sample_rate_and_determinism(spark):
    from beacon_data_importer_spark.operators.sampling import mixture_sample

    df = spark.range(10_000).select(
        F.col("id").alias("doc_id"), F.lit(2500).alias("rate_bp")
    )
    kept1 = {r.doc_id for r in mixture_sample(df, "doc_id", "rate_bp").collect()}
    kept2 = {
        r.doc_id
        for r in mixture_sample(df.repartition(11), "doc_id", "rate_bp").collect()
    }
    assert kept1 == kept2
    # ~25% with hash noise
    assert 2200 <= len(kept1) <= 2800, len(kept1)
    # rate 0 keeps nothing; rate 10000 keeps everything
    none = mixture_sample(
        df.withColumn("rate_bp", F.lit(0)), "doc_id", "rate_bp"
    ).count()
    everything = mixture_sample(
        df.withColumn("rate_bp", F.lit(10000)), "doc_id", "rate_bp"
    ).count()
    assert none == 0 and everything == 10_000
