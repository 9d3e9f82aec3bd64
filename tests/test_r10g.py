"""Independent brute-force checks for the round-10 tier-7 (dependence
and concordance second wave) queries.

Same discipline as tests/test_r10a.py: the DuckDB oracles share formula
TEXT with the Spark queries, so the gate can't catch a formula-level
mistake — these tests recompute each statistic from raw sf0.001 rows
in plain Python (independent code path, same math definition).
"""

from __future__ import annotations

import math

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
def days(con):
    """The r8d daily-revenue frame: t = days since first order,
    y = sum(cents) // 100000 per day."""
    rows = con.execute(
        """
        SELECT datediff('day', (SELECT min(o_orderdate) FROM orders),
                        o_orderdate) AS t,
          sum(CAST(round(o_totalprice * 100) AS BIGINT)) // 100000 AS y
        FROM orders GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    return [(int(t), int(y)) for t, y in rows]


def _idiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _lowmed(vals):
    s = sorted(vals)
    return s[(len(s) + 1) // 2 - 1]


def _one(spark, name):
    rows = entry.queries()[name](spark, SF).collect()
    assert len(rows) == 1
    return rows[0]


def _lex_ranks(days):
    """(r, s, c) per point: r = rank by t, s = rank by (y, t), c =
    #{j : t_j < t_i and (y_j, t_j) < (y_i, t_i) lexicographically}."""
    n = len(days)
    by_t = sorted(range(n), key=lambda i: days[i][0])
    by_yt = sorted(range(n), key=lambda i: (days[i][1], days[i][0]))
    r = {i: k + 1 for k, i in enumerate(by_t)}
    s = {i: k + 1 for k, i in enumerate(by_yt)}
    c = {}
    for i in range(n):
        ti, yi = days[i]
        c[i] = sum(
            1
            for j in range(n)
            if days[j][0] < ti and (days[j][1], days[j][0]) < (yi, ti)
        )
    return r, s, c


def test_hoeffding_brute(spark, days):
    n = len(days)
    r, s, c = _lex_ranks(days)
    d1 = sum(ci * (ci - 1) for ci in c.values())
    d2 = sum(
        (r[i] - 1) * (r[i] - 2) * (s[i] - 1) * (s[i] - 2)
        for i in range(n)
    )
    d3 = sum((r[i] - 2) * (s[i] - 2) * c[i] for i in range(n))
    num = (n - 2) * (n - 3) * d1 + d2 - 2 * (n - 2) * d3
    den = n * (n - 1) * (n - 2) * (n - 3) * (n - 4)
    row = _one(spark, "hoeffding_d")
    assert (row.n_days, row.d1, row.d2, row.d3) == (n, d1, d2, d3)
    assert row.hoeffding_d_e6 == _idiv(num * 30_000_000, den)
    # time-ordered revenue is dependent on the day index, but weakly —
    # D should land well inside (-0.5, 1)
    assert -500_000 < row.hoeffding_d_e6 < 1_000_000


def test_dcor_brute(spark, days):
    n = len(days)
    ts = [t for t, _ in days]
    ys = [y for _, y in days]

    def moments(xs, zs):
        sab = sum(
            abs(xs[j] - xs[k]) * abs(zs[j] - zs[k])
            for j in range(n)
            for k in range(n)
        )
        sa = sum(abs(xs[j] - xs[k]) for j in range(n) for k in range(n))
        sb = sum(abs(zs[j] - zs[k]) for j in range(n) for k in range(n))
        sr = sum(
            sum(abs(xs[j] - xs[k]) for k in range(n))
            * sum(abs(zs[j] - zs[k]) for k in range(n))
            for j in range(n)
        )
        return n * n * sab + sa * sb - 2 * n * sr

    ncov = moments(ts, ys)
    nx = moments(ts, ts)
    ny = moments(ys, ys)
    row = _one(spark, "distance_correlation_lite")
    assert row.n_days == n
    assert row.dcov2_e6 == _idiv(ncov * 1_000_000, n**4)
    assert row.dcor4_e6 == math.floor(
        1_000_000 * (ncov / nx) * (ncov / ny)
    )
    # dCor^4 is a squared quantity — never negative, bounded by 1
    assert 0 <= row.dcor4_e6 <= 1_000_000


def test_blomqvist_brute(spark, days):
    mt = _lowmed([t for t, _ in days])
    my = _lowmed([(y, t) for t, y in days])[0]
    conc = sum(
        1
        for t, y in days
        if (t > mt and y > my) or (t < mt and y < my)
    )
    disc = sum(
        1
        for t, y in days
        if (t > mt and y < my) or (t < mt and y > my)
    )
    row = _one(spark, "blomqvist_beta")
    assert (row.n_days, row.concordant, row.discordant) == (
        len(days),
        conc,
        disc,
    )
    assert row.beta_e6 == _idiv((conc - disc) * 1_000_000, conc + disc)


def test_footrule_brute(spark, days):
    n = len(days)
    r, s, _ = _lex_ranks(days)
    f = sum(abs(r[i] - s[i]) for i in range(n))
    row = _one(spark, "spearman_footrule")
    assert (row.n_days, row.footrule_distance) == (n, f)
    assert row.footrule_sim_e6 == _idiv(
        (n * n - 1 - 3 * f) * 1_000_000, n * n - 1
    )


def test_mann_kendall_brute(spark, days):
    n = len(days)
    ys = [y for _, y in days]  # days is t-sorted
    s_stat = sum(
        (ys[j] > ys[i]) - (ys[j] < ys[i])
        for i in range(n)
        for j in range(i + 1, n)
    )
    from collections import Counter

    ties = sum(
        c * (c - 1) * (2 * c + 5)
        for c in Counter(ys).values()
        if c > 1
    )
    var18 = n * (n - 1) * (2 * n + 5) - ties
    if s_stat > 0:
        z = (s_stat - 1) / math.sqrt(var18 / 18.0)
    elif s_stat < 0:
        z = (s_stat + 1) / math.sqrt(var18 / 18.0)
    else:
        z = 0.0
    row = _one(spark, "mann_kendall_test")
    assert (row.n_days, row.mk_s, row.var18) == (n, s_stat, var18)
    expected_z = math.floor(1_000_000 * z) if s_stat else 0
    assert row.z_e6 == expected_z
    assert row.reject_no_trend == (abs(row.z_e6) > 1_959_963)


def test_cucconi_brute(spark, con):
    rows = con.execute(
        """
        SELECT c.c_mktsegment,
          CAST(round(o.o_totalprice * 100) AS BIGINT) // 1000 AS v
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
        """
    ).fetchall()
    g1 = sorted(v for s, v in rows if s == "BUILDING")
    g2 = sorted(v for s, v in rows if s == "MACHINERY")
    allv = sorted(g1 + g2)
    n1, n2 = len(g1), len(g2)
    nn = n1 + n2

    def r2(x):  # doubled midrank in the combined sample
        less = sum(1 for v in allv if v < x)
        eq = sum(1 for v in allv if v == x)
        return 2 * less + eq + 1

    q2 = sum(r2(x) ** 2 for x in g2)
    q2c = sum((2 * (nn + 1) - r2(x)) ** 2 for x in g2)
    den = 4.0 * math.sqrt(
        n1 * n2 * (nn + 1) * (2 * nn + 1) * (8 * nn + 11) / 5.0
    )
    u = (6.0 * q2 - 4.0 * n2 * (nn + 1) * (2 * nn + 1)) / den
    v = (6.0 * q2c - 4.0 * n2 * (nn + 1) * (2 * nn + 1)) / den
    rho = 2.0 * (nn * nn - 4.0) / ((2.0 * nn + 1.0) * (8.0 * nn + 11.0)) - 1.0
    c_stat = (u * u + v * v - 2.0 * rho * u * v) / (2.0 * (1.0 - rho * rho))
    row = _one(spark, "cucconi_test")
    assert (row.n1, row.n2) == (n1, n2)
    assert row.u_e6 == math.floor(1_000_000 * u)
    assert row.v_e6 == math.floor(1_000_000 * v)
    assert row.rho_e6 == math.floor(1_000_000 * rho)
    assert row.c_e6 == math.floor(1_000_000 * c_stat)
    assert row.reject_same_distribution == (row.c_e6 > 2_995_732)
    # U and V are standardized — both should sit in a sane z-range
    assert abs(row.u_e6) < 10_000_000 and abs(row.v_e6) < 10_000_000


def test_cronbach_brute(spark, con):
    rows = con.execute(
        """
        SELECT o_custkey,
          datediff('day', (SELECT min(o_orderdate) FROM orders),
                   o_orderdate) AS dd,
          CAST(round(o_totalprice * 100) AS BIGINT) // 1000 AS x
        FROM orders
        """
    ).fetchall()
    span = max(dd for _, dd, _ in rows) + 1
    items: dict[int, list[int]] = {}
    for ck, dd, x in rows:
        k = (3 * dd) // span
        items.setdefault(ck, [0, 0, 0])[k] += x
    n = len(items)
    s = [0, 0, 0]
    q = [0, 0, 0]
    qt = 0
    for xs in items.values():
        for k in range(3):
            s[k] += xs[k]
            q[k] += xs[k] * xs[k]
        tot = sum(xs)
        qt += tot * tot
    num = sum(n * q[k] - s[k] * s[k] for k in range(3))
    den = n * qt - sum(s) ** 2
    row = _one(spark, "cronbach_alpha")
    assert row.n_customers == n
    assert row.item_var_share_e6 == _idiv(num * 1_000_000, den)
    assert row.alpha_e6 == _idiv(3 * (den - num) * 1_000_000, 2 * den)
    # alpha <= 1 by construction; tertile revenues of a random-ish
    # order stream are weakly consistent, not anti-consistent
    assert row.alpha_e6 <= 1_000_000


def test_tauc_brute(spark, con):
    rows = con.execute(
        "SELECT l_discount, l_quantity FROM lineitem"
    ).fetchall()
    from collections import Counter

    cells = Counter(rows)
    keys = list(cells)
    p = q = 0
    for i, (d1, q1) in enumerate(keys):
        for d2, q2 in keys[i + 1 :]:
            lo, hi = ((d1, q1), (d2, q2))
            prod = cells[lo] * cells[hi]
            dd = (d2 > d1) - (d2 < d1)
            dq = (q2 > q1) - (q2 < q1)
            if dd * dq > 0:
                p += prod
            elif dd * dq < 0:
                q += prod
    m = min(
        len({d for d, _ in keys}),
        len({qq for _, qq in keys}),
    )
    nt = sum(cells.values())
    row = _one(spark, "stuart_tau_c")
    assert (row.concordant, row.discordant) == (p, q)
    assert (row.m_min_dim, row.n_rows) == (m, nt)
    assert row.tau_c_ppm == _idiv(
        2 * m * (p - q) * 1_000_000, nt * nt * (m - 1)
    )
