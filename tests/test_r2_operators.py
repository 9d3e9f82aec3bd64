"""Round-2 operator tests: connected-components label propagation,
product-quantization encode/search, and the new TPC-H shapes.

Registered-query cross-engine equality is the driver's job (and
tools/check_oracle.py locally); these tests pin the OPERATOR semantics
on hand-built frames where the expected answer is known by construction.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.conftest import SF_DIR


# ---------------------------------------------------------------------------
# graph: min-label propagation
# ---------------------------------------------------------------------------

def test_label_propagation_two_components(spark):
    from pyspark.sql import functions as F

    from beacon_data_importer_spark.operators.graph import (
        min_label_propagation,
        symmetrize,
    )

    # components {1,2,3,4} (path) and {10, 11}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "a bigint, b bigint"
    )
    got = {
        (r.v, r.lbl)
        for r in min_label_propagation(symmetrize(pairs), iters=4).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1), (10, 10), (11, 10)}


def test_label_propagation_iteration_bound(spark):
    """A 6-vertex path needs 5 rounds to fully converge; after 2 rounds
    each vertex holds the min within 2 hops — exactly the fixed-point
    prefix the oracle replays."""
    from beacon_data_importer_spark.operators.graph import (
        min_label_propagation,
        symmetrize,
    )

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 6)], "a bigint, b bigint"
    )
    after2 = {
        (r.v, r.lbl)
        for r in min_label_propagation(symmetrize(pairs), iters=2).collect()
    }
    assert after2 == {(1, 1), (2, 1), (3, 1), (4, 2), (5, 3), (6, 4)}


def test_label_propagation_isolated_vertices_excluded(spark):
    from beacon_data_importer_spark.operators.graph import (
        min_label_propagation,
        symmetrize,
    )

    pairs = spark.createDataFrame([(7, 9)], "a bigint, b bigint")
    rows = min_label_propagation(symmetrize(pairs), iters=1).collect()
    assert {(r.v, r.lbl) for r in rows} == {(7, 7), (9, 7)}


# ---------------------------------------------------------------------------
# product quantization
# ---------------------------------------------------------------------------

def _toy_vectors(spark, n=40, dim=8):
    """Deterministic vectors: v[i][j] = ((i * 7 + j * 3) % 11) / 11."""
    rows = [
        (i, [((i * 7 + j * 3) % 11) / 11.0 for j in range(dim)])
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


def test_pq_encode_codebook_rows_self_code(spark):
    """A codebook-source vector's nearest codeword in every subspace is
    itself (distance 0), so its codes are (id, id, ...)."""
    from beacon_data_importer_spark.operators.pq import pq_encode

    df = _toy_vectors(spark)
    enc = pq_encode(df, n_subspaces=2, n_codes=4)
    rows = {r.vec_id: r.codes for r in enc.filter("vec_id < 4").collect()}
    for vid, codes in rows.items():
        assert codes == [vid, vid], f"vec {vid} encoded as {codes}"


def test_pq_encode_matches_numpy(spark):
    import numpy as np

    from beacon_data_importer_spark.operators.pq import pq_encode

    df = _toy_vectors(spark)
    vecs = {r.vec_id: np.array(r.embedding) for r in df.collect()}
    m, k, dsub = 2, 4, 4
    books = {
        s: {c: vecs[c][s * dsub : (s + 1) * dsub] for c in range(k)}
        for s in range(m)
    }

    def expect(vid):
        out = []
        for s in range(m):
            sub = vecs[vid][s * dsub : (s + 1) * dsub]
            dists = [(float(((sub - books[s][c]) ** 2).sum()), c) for c in range(k)]
            out.append(min(dists)[1])
        return out

    got = {r.vec_id: r.codes for r in pq_encode(df, m, k).collect()}
    for vid in vecs:
        assert got[vid] == expect(vid), vid


def test_pq_search_excludes_query_and_ranks_ascending(spark):
    from beacon_data_importer_spark.operators.pq import pq_search

    df = _toy_vectors(spark)
    out = pq_search(
        df, df.filter("vec_id = 0"), k=5, n_subspaces=2, n_codes=4, exclude_id=0
    ).collect()
    assert len(out) == 5
    assert all(r.neighbor_id != 0 for r in out)
    dists = [r.approx_dist_e6 for r in out]
    assert dists == sorted(dists)
    # vectors with i ≡ 0 (mod 11's cycle) repeat: vec 11*? shares v[0]'s
    # pattern when (i*7) % 11 cycles — at minimum the top hit must have
    # approx distance ≤ every other candidate's true quantized distance.
    assert dists[0] >= 0


def test_pq_search_exact_duplicate_is_top_hit(spark):
    """A vector identical to the query must score approx-distance equal
    to the query's own quantized distance — rank 1."""
    from pyspark.sql import functions as F

    from beacon_data_importer_spark.operators.pq import pq_search

    # n=10 < the formula's period-11 cycle, so no pre-existing duplicate
    # of vec 0 outranks the injected one on the id tie-break
    base = _toy_vectors(spark, n=10)
    dup = base.filter("vec_id = 0").select(
        (F.col("vec_id") + 100).alias("vec_id"), "embedding"
    )
    df = base.unionByName(dup)
    out = pq_search(
        df, df.filter("vec_id = 0"), k=3, n_subspaces=2, n_codes=4, exclude_id=0
    ).collect()
    assert out[0].neighbor_id == 100


# ---------------------------------------------------------------------------
# new TPC-H shapes on the test tables
# ---------------------------------------------------------------------------

def test_min_cost_supplier_invariants(spark):
    from beacon_data_importer_spark import catalog_r2

    rows = catalog_r2.q_min_cost_supplier(spark, SF_DIR).collect()
    assert rows, "expected at least one qualifying part"
    by_part: dict = {}
    for r in rows:
        by_part.setdefault(r.partkey, set()).add(r.cost_cents)
    # all surviving rows for one part share the per-part minimum
    assert all(len(costs) == 1 for costs in by_part.values())


def test_top_supplier_q15_is_global_max(spark):
    from pyspark.sql import functions as F

    from beacon_data_importer_spark import catalog_r2

    out = catalog_r2.q_top_supplier_q15(spark, SF_DIR)
    rows = out.collect()
    assert rows
    top = {r.total_revenue_cents for r in rows}
    assert len(top) == 1, "every returned supplier ties the max"


def test_entity_clusters_ids_are_component_members(spark):
    from beacon_data_importer_spark import catalog_r2

    rows = catalog_r2.q_entity_clusters(spark, SF_DIR).collect()
    assert rows
    keys = {r.custkey for r in rows}
    # cluster ids are custkeys, and each is ≤ every member it labels
    for r in rows:
        assert r.cluster_id in keys
        assert r.cluster_id <= r.custkey


# ---------------------------------------------------------------------------
# sketches: error-bounded, not oracle-hashed (engine-specific estimates)
# ---------------------------------------------------------------------------

def test_hll_distinct_within_error_bound(spark, sf_dir):
    from pyspark.sql import functions as F

    from beacon_data_importer_spark.operators.sketch import approx_distinct
    from beacon_data_importer_spark.sources.parquet import read_table

    o = read_table(spark, sf_dir, "orders")
    got = {
        r.o_orderpriority: r.approx_distinct
        for r in approx_distinct(o, ["o_orderpriority"], "o_custkey").collect()
    }
    want = {
        r.o_orderpriority: r.exact
        for r in o.groupBy("o_orderpriority")
        .agg(F.count_distinct("o_custkey").alias("exact"))
        .collect()
    }
    assert set(got) == set(want)
    for k, exact in want.items():
        assert abs(got[k] - exact) <= max(3, 0.05 * exact), (k, got[k], exact)


def test_hll_sketch_merge_equals_direct_estimate(spark, sf_dir):
    """Rollup property: union of per-priority sketches == one global
    sketch (identical estimate — merging is lossless for HLL)."""
    from beacon_data_importer_spark.operators.sketch import (
        approx_distinct,
        distinct_sketches,
        merge_distinct_sketches,
    )
    from beacon_data_importer_spark.sources.parquet import read_table

    from pyspark.sql import functions as F

    o = read_table(spark, sf_dir, "orders").withColumn("all", F.lit(1))
    per = distinct_sketches(o, ["o_orderpriority", "all"], "o_custkey")
    merged = merge_distinct_sketches(per, ["all"]).collect()[0].approx_distinct
    direct = approx_distinct(o, ["all"], "o_custkey").collect()[0].approx_distinct
    assert merged == direct


def test_approx_quantiles_rank_error(spark, sf_dir):
    from pyspark.sql import functions as F

    from beacon_data_importer_spark.operators.sketch import approx_quantiles
    from beacon_data_importer_spark.sources.parquet import read_table

    li = read_table(spark, sf_dir, "lineitem")
    rows = approx_quantiles(
        li, ["l_returnflag"], "l_extendedprice", (0.5,), accuracy=10000
    ).collect()
    exact = {
        r.l_returnflag: r.m
        for r in li.groupBy("l_returnflag")
        .agg(F.median("l_extendedprice").alias("m"))
        .collect()
    }
    for r in rows:
        # GK guarantees rank error; on this data the value gap at
        # +-1/accuracy rank around the median is tiny — 1% value slack
        assert abs(r.q[0] - exact[r.l_returnflag]) <= 0.01 * exact[r.l_returnflag]


def test_connected_components_converges_past_fixed_iters(spark):
    """A 21-vertex path has diameter 20: 4 neighbor-min rounds cannot
    converge it, but pointer jumping reaches the fixpoint in ~log2(20)
    doubled rounds.  Every vertex must label 1."""
    from beacon_data_importer_spark.operators.graph import (
        connected_components,
        symmetrize,
    )

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 21)], "a bigint, b bigint"
    )
    got = {(r.v, r.lbl) for r in connected_components(symmetrize(pairs)).collect()}
    assert got == {(v, 1) for v in range(1, 22)}


def test_connected_components_multiple_components(spark):
    from beacon_data_importer_spark.operators.graph import (
        connected_components,
        symmetrize,
    )

    # star {1..5}, triangle {20,21,22}, pair {30,31}
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (1, 5), (20, 21), (21, 22), (20, 22), (30, 31)],
        "a bigint, b bigint",
    )
    got = {(r.v, r.lbl) for r in connected_components(symmetrize(pairs)).collect()}
    expect = {(v, 1) for v in (1, 2, 3, 4, 5)}
    expect |= {(v, 20) for v in (20, 21, 22)}
    expect |= {(30, 30), (31, 30)}
    assert got == expect
