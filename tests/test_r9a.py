"""Independent brute-force checks for the round-9 tier-1 tests.

The DuckDB oracles share formula TEXT with the Spark queries, so gate
parity can't catch a formula-level mistake (the round-8 Hurst lesson).
These tests recompute each statistic from raw sf0.001 rows in plain
Python — independent code path, same math definition.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("orders", "customer", "lineitem"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'"
        )
    return c


@pytest.fixture(scope="module")
def seg_values(con):
    rows = con.execute(
        """
        SELECT c.c_mktsegment, CAST(round(o.o_totalprice * 100) AS BIGINT)
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
        """
    ).fetchall()
    g1 = sorted(c // 1000 for s, c in rows if s == "BUILDING")
    g2 = sorted(c // 1000 for s, c in rows if s == "MACHINERY")
    return g1, g2


def _idiv(a: int, b: int) -> int:
    """Integer division truncating toward zero — Spark's `div` and
    DuckDB's integer `//` both truncate; Python's `//` floors."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _one(spark, name):
    rows = entry.queries()[name](spark, SF).collect()
    assert len(rows) == 1
    return rows[0]


def test_wilcoxon_brute(spark, con):
    rows = con.execute(
        """
        SELECT year(o_orderdate), month(o_orderdate),
          CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
        FROM orders WHERE year(o_orderdate) IN (1997, 1998)
        GROUP BY 1, 2
        """
    ).fetchall()
    rev = {(y, m): v for y, m, v in rows}
    ds = [
        rev[(1998, m)] - rev[(1997, m)]
        for m in range(1, 13)
        if (1997, m) in rev and (1998, m) in rev
    ]
    ds = [d for d in ds if d != 0]
    # doubled midranks of |d|
    srt = sorted(abs(d) for d in ds)
    r2 = {}
    i = 0
    while i < len(srt):
        j = i
        while j < len(srt) and srt[j] == srt[i]:
            j += 1
        r2[srt[i]] = i + j + 1  # doubled midrank: (i+1)+j, 1-indexed
        i = j
    w2p = sum(r2[abs(d)] for d in ds if d > 0)
    sr2 = sum(r2[abs(d)] for d in ds)
    sr2sq = sum(r2[abs(d)] ** 2 for d in ds)
    r = _one(spark, "wilcoxon_signed_rank")
    assert r.n_pairs == len(ds)
    assert r.w2_plus == w2p
    assert r.z2_ppm == ((2 * w2p - sr2) ** 2 * 1_000_000) // sr2sq


def test_sign_test_brute(spark, con):
    import math

    rows = con.execute(
        """
        SELECT year(o_orderdate), month(o_orderdate),
          CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
        FROM orders WHERE year(o_orderdate) IN (1997, 1998)
        GROUP BY 1, 2
        """
    ).fetchall()
    rev = {(y, m): v for y, m, v in rows}
    ds = [
        rev[(1998, m)] - rev[(1997, m)]
        for m in range(1, 13)
        if (1997, m) in rev and (1998, m) in rev
    ]
    m = sum(1 for d in ds if d != 0)
    k = sum(1 for d in ds if d > 0)
    tail_ge = sum(math.comb(m, i) for i in range(k, m + 1))
    tail_le = sum(math.comb(m, i) for i in range(0, k + 1))
    p_e6 = min(
        1_000_000, 2 * (min(tail_ge, tail_le) * 1_000_000 // 2**m)
    )
    r = _one(spark, "sign_test_paired")
    assert (r.n_nonzero, r.n_positive) == (m, k)
    assert r.p_two_sided_e6 == p_e6


def test_cliffs_delta_brute(spark, seg_values):
    g1, g2 = seg_values
    from collections import Counter

    c2 = Counter(g2)
    vals2 = sorted(c2)
    import bisect

    # cumulative counts of g2 strictly below v
    cum = []
    tot = 0
    for v in vals2:
        cum.append(tot)
        tot += c2[v]
    n_gt = n_lt = 0
    for v in g1:
        i = bisect.bisect_left(vals2, v)
        below = cum[i] if i < len(vals2) else tot
        j = bisect.bisect_right(vals2, v)
        above = tot - (cum[j - 1] + c2[vals2[j - 1]] if j > 0 else 0)
        n_gt += below
        n_lt += above
    delta = (n_gt - n_lt) * 1_000_000
    r = _one(spark, "cliffs_delta_effect")
    assert r.n1 == len(g1) and r.n2 == len(g2)
    # Spark `div` / DuckDB integer `//` truncate toward zero
    assert r.delta_ppm == _idiv(delta, len(g1) * len(g2))


def test_brunner_munzel_phat_brute(spark, seg_values):
    g1, g2 = seg_values
    gt = sum(1 for a in g1 for b in g2 if b > a)
    eq = sum(1 for a in g1 for b in g2 if b == a)
    p_hat = (2 * gt + eq) * 1_000_000 // (2 * len(g1) * len(g2))
    r = _one(spark, "brunner_munzel")
    assert r.p_hat_ppm == p_hat
    assert 0 <= r.p_hat_ppm <= 1_000_000
    assert r.var_e12 > 0


def test_hodges_lehmann_brute(spark, seg_values):
    g1, g2 = seg_values
    b1 = [v // 100 for v in g1]  # $10 → $1000 buckets
    b2 = [v // 100 for v in g2]
    diffs = sorted(a - b for a in b1 for b in b2)
    t = len(diffs)
    hl = diffs[(t + 1) // 2 - 1]  # rank (T+1)//2, 1-indexed
    r = _one(spark, "hodges_lehmann_shift")
    assert r.n_pairs == t
    assert r.hl_shift_bucket == hl
    assert r.hl_shift_cents == hl * 100_000


def test_gamma_somers_brute(spark, con):
    from collections import Counter

    rows = con.execute(
        "SELECT l_discount, l_quantity FROM lineitem"
    ).fetchall()
    cells = Counter(rows)
    ks = list(cells)
    p = q = tx = ty = 0
    for i, a in enumerate(ks):
        for b in ks[i + 1 :]:
            w = cells[a] * cells[b]
            (d1, q1), (d2, q2) = a, b
            if d1 == d2 and q1 == q2:
                continue
            if d1 == d2:
                tx += w
            elif q1 == q2:
                ty += w
            elif (d1 - d2) * (q1 - q2) > 0:
                p += w
            else:
                q += w
    g = _one(spark, "kruskal_gamma")
    assert (g.concordant, g.discordant) == (p, q)
    assert g.gamma_ppm == _idiv((p - q) * 1_000_000, p + q)
    s = _one(spark, "somers_d")
    assert (s.tied_qty_only, s.tied_disc_only) == (ty, tx)
    assert s.somers_d_qty_given_disc_ppm == _idiv(
        (p - q) * 1_000_000, p + q + ty
    )


def test_cox_stuart_and_turning_points_sane(spark):
    cs = _one(spark, "cox_stuart_trend")
    assert 0 <= cs.n_increases <= cs.n_untied_pairs
    assert cs.z2_ppm >= 0
    tp = _one(spark, "turning_points_test")
    assert 0 < tp.n_turning_points < tp.n_days
    # i.i.d. expectation is 2/3 of interior days; a real series with
    # weekly structure lands in a broad band around it
    assert tp.expected_tp_e6 == 2 * (tp.n_days - 2) * 1_000_000 // 3
