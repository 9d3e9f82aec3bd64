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


def _mk_tokens(spark, lengths):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(lengths)],
        "doc_id bigint, n_tokens bigint",
    )


def test_pack_bins_serpentine_balances_and_is_deterministic(spark):
    from beacon_data_importer_spark.operators.sampling import (
        pack_bins_serpentine,
    )

    lengths = [((i * 37) % 400) + 10 for i in range(200)]
    df = _mk_tokens(spark, lengths)
    out1 = pack_bins_serpentine(
        df, "doc_id", "n_tokens", 512, shard_col=F.lit(0)
    ).collect()
    out2 = pack_bins_serpentine(
        df.repartition(13), "doc_id", "n_tokens", 512, shard_col=F.lit(0)
    ).collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
    total = sum(lengths)
    n_bins = (total + 511) // 512
    loads: dict[int, int] = {}
    for r in out1:
        loads[r.pack_id] = loads.get(r.pack_id, 0) + r.n_tokens
    assert len(loads) == n_bins
    assert set(loads) == set(range(n_bins))
    # serpentine dealing keeps loads tight around the mean
    mean = total / n_bins
    assert all(abs(v - mean) <= 512 for v in loads.values()), loads


def test_pack_bins_serpentine_single_small_shard(spark):
    from beacon_data_importer_spark.operators.sampling import (
        pack_bins_serpentine,
    )

    # total below one budget -> exactly one pack, everything in it
    df = _mk_tokens(spark, [50, 60, 70])
    out = pack_bins_serpentine(
        df, "doc_id", "n_tokens", 512, shard_col=F.lit(0)
    ).collect()
    assert {r.pack_id for r in out} == {0}


def test_pack_bins_bestfit_invariants(spark):
    from beacon_data_importer_spark.operators.sampling import (
        pack_bins_bestfit,
    )

    lengths = [((i * 131) % 500) + 5 for i in range(300)]
    df = _mk_tokens(spark, lengths)
    out1 = pack_bins_bestfit(
        df, "doc_id", "n_tokens", 512, shard_col=F.lit(0)
    ).collect()
    out2 = pack_bins_bestfit(
        df.repartition(17), "doc_id", "n_tokens", 512, shard_col=F.lit(0)
    ).collect()
    # deterministic under repartitioning
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
    # every doc packed exactly once
    assert sorted(r.id for r in out1) == sorted(range(300))
    loads: dict[int, int] = {}
    for r in out1:
        loads[r.pack_id] = loads.get(r.pack_id, 0) + r.n_tokens
    # hard capacity honored (no oversized docs in this fixture)
    assert all(v <= 512 for v in loads.values())
    # BFD bound: pack count within 11/9*OPT + 1 of the token lower bound
    lb = (sum(lengths) + 511) // 512
    assert lb <= len(loads) <= (11 * lb) // 9 + 2, (len(loads), lb)


def test_pack_bins_bestfit_oversized_doc_isolated(spark):
    from beacon_data_importer_spark.operators.sampling import (
        pack_bins_bestfit,
    )

    df = _mk_tokens(spark, [600, 100, 100])
    out = pack_bins_bestfit(
        df, "doc_id", "n_tokens", 512, shard_col=F.lit(0)
    ).collect()
    packs = {r.id: r.pack_id for r in out}
    # the 600-token doc sits alone; its pack is closed to the others
    others = {packs[1], packs[2]}
    assert packs[0] not in others
    # the two 100s best-fit together
    assert packs[1] == packs[2]


def test_pack_utilization_deciles(spark):
    from beacon_data_importer_spark.operators.sampling import (
        pack_utilization,
    )

    packed = spark.createDataFrame(
        [
            (0, 0, 0, 512),   # exactly full  -> decile 10
            (1, 0, 0, 0),     # shares pack 0 (tokens add)
            (2, 0, 1, 256),   # half full     -> decile 5
            (3, 0, 2, 600),   # overflow      -> decile 11
        ],
        "id bigint, shard bigint, pack_id bigint, n_tokens bigint",
    )
    out = {
        r.util_decile: (r.n_packs, r.n_docs, r.sum_tokens)
        for r in pack_utilization(packed, 512).collect()
    }
    assert out == {10: (1, 2, 512), 5: (1, 1, 256), 11: (1, 1, 600)}


def test_stratified_sample_exact_counts(spark):
    from beacon_data_importer_spark.operators.sampling import (
        stratified_sample_exact,
    )

    rows = [(i, ("a", "b", "c")[i % 3]) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string")
    targets = spark.createDataFrame(
        [("a", 10), ("b", 250), ("c", 0)], "lang string, target_n int"
    )
    out1 = stratified_sample_exact(df, "lang", targets, "doc_id").collect()
    out2 = stratified_sample_exact(
        df.repartition(9), "lang", targets, "doc_id"
    ).collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
    counts: dict[str, int] = {}
    for r in out1:
        counts[r.lang] = counts.get(r.lang, 0) + 1
    # exact where the stratum is large enough, whole stratum where not
    assert counts.get("a", 0) == 10
    assert counts.get("b", 0) == 100  # stratum size 100 < target 250
    assert counts.get("c", 0) == 0


def test_mixture_sample_config_default_rate(spark):
    from beacon_data_importer_spark.operators.sampling import (
        mixture_sample_config,
    )

    df = spark.createDataFrame(
        [(i, "cfg" if i % 2 == 0 else "other") for i in range(2000)],
        "doc_id bigint, source string",
    )
    rates = spark.createDataFrame([("cfg", 10000)], "source string, rate_bp int")
    # inner-join form: unconfigured sources drop out entirely
    inner = mixture_sample_config(df, "doc_id", "source", rates).collect()
    assert {r.source for r in inner} == {"cfg"} and len(inner) == 1000
    # default form: unconfigured sources sample at the fallback rate
    both = mixture_sample_config(
        df, "doc_id", "source", rates, default_rate_bp=2500
    ).collect()
    n_other = sum(1 for r in both if r.source == "other")
    assert sum(1 for r in both if r.source == "cfg") == 1000
    assert 150 <= n_other <= 350, n_other


def test_weighted_sample_biases_toward_heavy_rows(spark):
    """The Efraimidis-Spirakis sample must (a) be deterministic, (b)
    never repeat a row (without replacement by construction), and (c)
    skew heavier than the corpus — length-proportional sampling."""
    from pyspark.sql import functions as F

    from beacon_data_importer_spark.catalog_r3b import q_weighted_sample_docs
    from tests.conftest import SF_DIR

    s1 = [(r.doc_id, r.n_chars) for r in q_weighted_sample_docs(spark, SF_DIR).collect()]
    s2 = [(r.doc_id, r.n_chars) for r in q_weighted_sample_docs(spark, SF_DIR).collect()]
    assert s1 == s2, "deterministic draw"
    ids = [i for i, _ in s1]
    assert len(ids) == len(set(ids)), "without replacement"
    corpus_mean = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .agg(F.avg("n_chars"))
        .first()[0]
    )
    sample_mean = sum(n for _, n in s1) / len(s1)
    assert sample_mean > corpus_mean, (sample_mean, corpus_mean)
