"""Invariant tests for the round-3 corpus-dedup compositions
(catalog_r3b).  Value-level correctness is the DuckDB-oracle gate
(tests/test_extra_queries.py runs each against its oracle); these tests
pin the STRUCTURAL invariants the oracles can't express as a hash —
cluster-label well-formedness, flag consistency, representative
uniqueness — at sf0.001.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from beacon_data_importer_spark.catalog_r3b import (
    q_boilerplate_shingle_fraction,
    q_incremental_dedup,
    q_near_dup_clusters,
    q_near_dup_keep,
)
from tests.conftest import SF_DIR


def test_near_dup_clusters_labels_are_component_minimums(spark):
    rows = q_near_dup_clusters(spark, SF_DIR).collect()
    by_cluster: dict[int, list[int]] = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, []).append(r.doc_id)
    for cid, members in by_cluster.items():
        # converged CC labels by the component's minimum vertex id,
        # and that minimum is itself a member
        assert cid == min(members)


def test_near_dup_keep_one_representative_per_cluster(spark):
    df = q_near_dup_keep(spark, SF_DIR)
    n_docs = df.count()
    # the keep list covers the whole corpus
    assert (
        n_docs
        == spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    )
    per_cluster = (
        df.groupBy("cluster_id")
        .agg(
            F.sum("keep").alias("kept"),
            F.count(F.lit(1)).alias("n"),
            F.max("n_members").alias("nm"),
        )
        .collect()
    )
    for r in per_cluster:
        assert r.kept == 1, "exactly one representative per cluster"
        assert r.n == r.nm, "n_members matches actual membership"
    # keeps == clusters: dedup keeps exactly one doc per cluster
    kept = df.filter(F.col("keep") == 1).count()
    assert kept == len(per_cluster)


def test_near_dup_keep_representative_is_longest_member(spark):
    df = q_near_dup_keep(spark, SF_DIR)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "n_chars"
    )
    j = df.join(docs, "doc_id").collect()
    best: dict[int, tuple[int, int]] = {}  # cluster -> (-n_chars, doc_id)
    for r in j:
        k = (-r.n_chars, r.doc_id)
        if r.cluster_id not in best or k < best[r.cluster_id]:
            best[r.cluster_id] = k
    for r in j:
        expect = 1 if (-r.n_chars, r.doc_id) == best[r.cluster_id] else 0
        assert r.keep == expect


def test_incremental_dedup_flag_consistency(spark):
    rows = q_incremental_dedup(spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_batch = docs.filter(F.col("source") != "src0").count()
    assert len(rows) == n_batch, "one verdict row per batch doc"
    for r in rows:
        assert r.source != "src0"
        assert r.keep == (1 - max(r.exact_dup, r.near_dup))


def test_boilerplate_fraction_bounds(spark):
    rows = q_boilerplate_shingle_fraction(spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert len(rows) == docs
    for r in rows:
        assert r.n_shingles >= 1
        assert 0 <= r.n_common <= r.n_shingles
        assert 0 <= r.common_frac_e6 <= 1_000_000


def test_lsh_bands_matches_candidate_pair_surface(spark):
    """lsh_bands is the factored-out key surface of lsh_candidate_pairs:
    pairing via an explicit bands self-join must equal the operator's
    collect-and-expand output."""
    from beacon_data_importer_spark.operators import dedup as DD

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    sigs = DD.minhash_signatures(d, "text", "doc_id", 16)
    via_op = {
        (r.id_a, r.id_b)
        for r in DD.lsh_candidate_pairs(sigs, 4, 4, 50).collect()
    }
    bands = DD.lsh_bands(sigs, 4, 4)
    l = bands.select(
        F.col("id").alias("a"), "band", "bucket"
    )
    r_ = bands.select(F.col("id").alias("b"), "band", "bucket")
    counts = bands.groupBy("band", "bucket").count()
    ok = counts.filter(F.col("count") <= 50).select("band", "bucket")
    via_join = {
        (row.a, row.b)
        for row in (
            l.join(ok, ["band", "bucket"])
            .join(r_, ["band", "bucket"])
            .filter(F.col("a") < F.col("b"))
            .select("a", "b")
            .distinct()
            .collect()
        )
    }
    assert via_op == via_join


def test_incremental_flags_exact_copy_via_both_tests(spark):
    """A batch doc that is a byte-identical copy of a corpus doc MUST be
    flagged by BOTH mechanisms: md5 equality (exact_dup) and band-key
    collision (identical text → identical signature → every band bucket
    collides).  A batch doc with disjoint vocabulary must be flagged by
    neither.  Synthetic frames — the guarantee, not the testdata."""
    from pyspark.sql import functions as F

    from beacon_data_importer_spark.operators import dedup as DD

    corpus = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon zeta token{i} end") for i in range(20)],
        ["doc_id", "text"],
    )
    batch = spark.createDataFrame(
        # 100: exact copy of corpus doc 7; 101: disjoint vocabulary
        [
            (100, "alpha beta gamma delta epsilon zeta token7 end"),
            (101, "qqq www eee rrr ttt yyy uuu iii"),
        ],
        ["doc_id", "text"],
    )
    chash = corpus.select(F.md5("text").alias("h")).distinct()
    csig = DD.minhash_signatures(corpus, "text", "doc_id", 16)
    nsig = DD.minhash_signatures(batch, "text", "doc_id", 16)
    cband = DD.lsh_bands(csig).select("band", "bucket")
    nband = DD.lsh_bands(nsig)
    near_ids = {
        r.id
        for r in nband.join(cband, ["band", "bucket"]).select("id").distinct().collect()
    }
    exact_ids = {
        r.doc_id
        for r in batch.join(chash, F.md5(batch.text) == chash.h, "left_semi").collect()
    }
    assert 100 in exact_ids and 100 in near_ids
    assert 101 not in exact_ids and 101 not in near_ids
