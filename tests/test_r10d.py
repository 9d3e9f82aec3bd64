"""Independent brute-force checks for the round-10 tier-4 (ANN index
health / graph / layout) queries — plain-Python (numpy) recomputation
from raw sf0.001 rows."""

from __future__ import annotations

import math
from collections import Counter

import duckdb
import numpy as np
import pytest

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("embeddings", "lineitem", "orders", "documents"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'"
        )
    return c


@pytest.fixture(scope="module")
def vecs(con):
    rows = con.execute(
        "SELECT vec_id, embedding FROM embeddings ORDER BY vec_id"
    ).fetchall()
    return {int(v): np.array(e, dtype=np.float64) for v, e in rows}


def _cos_e6(a, b):
    return math.floor(
        1e6
        * _dot(a, b)
        / (math.sqrt(_dot(a, a)) * math.sqrt(_dot(b, b)))
    )


def _dot(a, b):
    # left-to-right sequential fold, matching operators/similarity.py
    acc = 0.0
    for x, y in zip(a, b):
        acc += float(x) * float(y)
    return acc


def _idiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


@pytest.fixture(scope="module")
def assign(vecs):
    cents = {v: e for v, e in vecs.items() if v % 100 == 0}
    out = {}
    for v, e in vecs.items():
        best = max(
            sorted(cents), key=lambda c: (_cos_e6(e, cents[c]), -c)
        )
        out[v] = best
    return out


def test_core_distances_brute(spark, vecs, assign):
    by_cell = {}
    for v, c in assign.items():
        by_cell.setdefault(c, []).append(v)
    expect = {}
    for c, members in by_cell.items():
        cores = []
        for v in members:
            ds = sorted(
                (1_000_000 - _cos_e6(vecs[v], vecs[w]), w)
                for w in members
                if w != v
            )
            if len(ds) >= 4:
                cores.append(ds[3][0])
        expect[c] = (
            len(members),
            len(cores),
            _idiv(sum(cores), len(cores)) if cores else None,
            max(cores) if cores else None,
        )
    rows = entry.queries()["hdbscan_core_distances"](
        spark, SF
    ).collect()
    got = {
        r.cell_id: (
            r.n_pts,
            r.n_with_core,
            r.mean_core_dist_e6,
            r.max_core_dist_e6,
        )
        for r in rows
    }
    assert got == expect


def test_reciprocity_brute(spark, vecs, assign):
    by_cell = {}
    for v, c in assign.items():
        by_cell.setdefault(c, []).append(v)
    edges = set()
    for c, members in by_cell.items():
        for v in members:
            nn = sorted(
                ((-_cos_e6(vecs[v], vecs[w]), w) for w in members if w != v)
            )[:5]
            for _, w in nn:
                edges.add((v, w))
    recip = sum(1 for (a, b) in edges if (b, a) in edges)
    rows = entry.queries()["knn_reciprocity_audit"](spark, SF).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.n_edges, r.n_reciprocal) == (len(edges), recip)
    assert r.reciprocity_ppm == _idiv(recip * 1_000_000, len(edges))


def test_centroid_drift_brute(spark, vecs, assign):
    by_cell = {}
    for v, c in assign.items():
        by_cell.setdefault(c, []).append(v)
    rows = entry.queries()["centroid_drift_audit"](spark, SF).collect()
    got = {r.cell_id: (r.n_pts, r.drift_ppm) for r in rows}
    for c, members in by_cell.items():
        e6 = [
            [math.floor(float(x) * 1e6) for x in vecs[v]]
            for v in members
        ]
        m = [
            _idiv(sum(col), len(members)) for col in zip(*e6)
        ]
        ce6 = [math.floor(float(x) * 1e6) for x in vecs[c]]
        cm = sum(a * b for a, b in zip(m, ce6))
        mm = sum(a * a for a in m)
        cc = sum(a * a for a in ce6)
        drift = 1_000_000 - math.floor(
            1_000_000 * float(cm) / (math.sqrt(float(mm)) * math.sqrt(float(cc)))
        )
        assert got[c] == (len(members), drift), f"cell {c}"


def test_overlap_brute(spark, vecs):
    qs = [v for v in vecs if v % 50 == 0]
    rows = entry.queries()["cosine_dot_topk_overlap"](
        spark, SF
    ).collect()
    got = {r.query_id: (r.n_common, r.overlap_ppm) for r in rows}
    assert set(got) == set(qs)
    for q in qs:
        others = [v for v in vecs if v != q]
        cos_rank = sorted(
            others, key=lambda v: (-_cos_e6(vecs[v], vecs[q]), v)
        )[:10]
        dot_rank = sorted(
            others,
            key=lambda v: (
                -math.floor(
                    1e6 * ((4 + v % 5) / 4 * _dot(vecs[v], vecs[q]))
                ),
                v,
            ),
        )[:10]
        common = len(set(cos_rank) & set(dot_rank))
        assert got[q] == (common, _idiv(common * 1_000_000, 10)), q
    # calibration property: the injected norm profile must actually
    # separate the rankings somewhere
    assert any(c < 10 for c, _ in got.values())


def test_contrast_brute(spark, vecs):
    qs = [v for v in vecs if v % 50 == 0]
    rows = entry.queries()["ann_contrast_audit"](spark, SF).collect()
    got = {
        r.query_id: (
            r.n_corpus,
            r.nn_dist_e6,
            r.mean_dist_e6,
            r.relative_contrast_e6,
        )
        for r in rows
    }
    for q in qs:
        ds = [
            1_000_000 - _cos_e6(vecs[v], vecs[q])
            for v in vecs
            if v != q
        ]
        mean = _idiv(sum(ds), len(ds))
        rc = _idiv(mean * 1_000_000, min(ds))
        assert got[q] == (len(ds), min(ds), mean, rc), q


def test_degree_gini_brute(spark, con):
    rows = con.execute(
        "SELECT DISTINCT l_suppkey, l_partkey FROM lineitem"
    ).fetchall()
    deg = Counter(s for s, _ in rows)
    xs = sorted(deg.values())
    n = len(xs)
    t = sum(xs)
    s2 = 2 * sum((i + 1) * x for i, x in enumerate(xs))
    gini = _idiv((s2 - (n + 1) * t) * 1_000_000, n * t)
    r = entry.queries()["graph_degree_gini"](spark, SF).collect()[0]
    assert (r.n_suppliers, r.n_edges, r.degree_gini_e6) == (n, t, gini)


def test_planner_brute(spark, con):
    rows = con.execute(
        """
        SELECT CAST(round(o_totalprice * 100) AS BIGINT) // 1000 AS v,
          count(*) FROM orders GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    hist = [(int(v), int(m)) for v, m in rows]
    n = sum(m for _, m in hist)
    cum = []
    c = 0
    for v, m in hist:
        c += m
        cum.append((v, c))
    bounds = {}
    for pid in range(1, 33):
        target = pid * n // 32
        bounds[pid] = min(v for v, c in cum if c >= target)
    r_rows = entry.queries()["range_partition_planner"](
        spark, SF
    ).collect()
    assert len(r_rows) == 32
    total_planned = 0
    for r in sorted(r_rows, key=lambda x: x.pid):
        assert r.hi_bucket_incl == bounds[r.pid]
        lo = bounds[r.pid - 1] if r.pid > 1 else None
        assert r.lo_bucket_excl == lo
        hi_c = max(c for v, c in cum if v <= r.hi_bucket_incl)
        lo_c = (
            max(c for v, c in cum if v <= lo) if lo is not None else 0
        )
        assert r.rows_planned == hi_c - lo_c
        assert r.skew_ppm == _idiv(r.rows_planned * 32 * 1_000_000, n)
        total_planned += r.rows_planned
    assert total_planned == n  # the plan covers every row exactly once


def test_loglen_brute(spark, con):
    lens = [
        int(x)
        for (x,) in con.execute(
            "SELECT n_chars FROM documents WHERE n_chars > 0"
        ).fetchall()
    ]
    ln_e6 = [math.floor(math.log(x) * 1e6) for x in lens]
    n = len(ln_e6)
    s1, s2 = sum(ln_e6), sum(x * x for x in ln_e6)
    mu = _idiv(s1, n)
    sig2 = _idiv(_idiv(s2 * n - s1 * s1, n * (n - 1)), 1_000_000)
    med = sorted(lens)[(n + 1) // 2 - 1]
    r = entry.queries()["doc_length_lognormal_fit"](spark, SF).collect()[0]
    assert (r.n_docs, r.ln_mu_e6, r.ln_sigma2_e6, r.median_chars) == (
        n,
        mu,
        sig2,
        med,
    )
