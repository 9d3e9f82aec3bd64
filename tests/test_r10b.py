"""Independent brute-force checks for the round-10 tier-2
(time-series second wave) queries — plain-Python recomputation from
raw sf0.001 rows, same discipline as tests/test_r9a.py."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW orders AS SELECT * FROM '{SF}/orders.parquet'"
    )
    return c


@pytest.fixture(scope="module")
def days(con):
    rows = con.execute(
        """
        SELECT datediff('day', (SELECT min(o_orderdate) FROM orders),
                        o_orderdate) AS t,
          sum(CAST(round(o_totalprice * 100) AS BIGINT)) // 100000 AS y
        FROM orders GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    return [(int(t), int(y)) for t, y in rows]


@pytest.fixture(scope="module")
def months(con):
    rows = con.execute(
        """
        SELECT year(o_orderdate) * 100 + month(o_orderdate) AS ym,
          sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS y_c
        FROM orders GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    return [int(y) for _, y in rows]


def _idiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _one(spark, name):
    rows = entry.queries()[name](spark, SF).collect()
    assert len(rows) == 1
    return rows[0]


def test_von_neumann_brute(spark, days):
    ys = [y for _, y in days]
    n = len(ys)
    sdd = sum(
        (ys[i] - ys[i - 1]) ** 2 for i in range(1, n)
    )
    sy, syy = sum(ys), sum(y * y for y in ys)
    eta_e6 = _idiv(sdd * n * 1_000_000, syy * n - sy * sy)
    eta = float(sdd) * n / (float(syy) * n - float(sy) * float(sy))
    z_e6 = math.floor((eta - 2) * math.sqrt(n) / 2 * 1e6)
    r = _one(spark, "von_neumann_ratio")
    assert (r.n, r.vn_ratio_e6, r.z_e6) == (n, eta_e6, z_e6)
    assert r.reject_randomness == (abs(z_e6) > 1_959_963)


def test_bartels_brute(spark, days):
    n = len(days)
    order = sorted(range(n), key=lambda i: (days[i][1], days[i][0]))
    rank = [0] * n
    for pos, i in enumerate(order):
        rank[i] = pos + 1
    sdd = sum(
        (rank[i] - rank[i - 1]) ** 2 for i in range(1, n)
    )
    rvn_e6 = _idiv(sdd * 12 * 1_000_000, n * (n * n - 1))
    rvn = float(sdd) * 12 / (float(n) * (float(n) * n - 1))
    z_e6 = math.floor((rvn - 2) * math.sqrt(n) / 2 * 1e6)
    r = _one(spark, "bartels_rank_test")
    assert (r.n, r.rvn_e6, r.z_e6) == (n, rvn_e6, z_e6)


def test_foster_stuart_brute(spark, days):
    ys = [y for _, y in days]
    n = len(ys)
    d = s = nu = nl = 0
    h_ppm = 0
    for i in range(1, n):
        u = 1 if ys[i] > max(ys[:i]) else 0
        l = 1 if ys[i] < min(ys[:i]) else 0
        nu += u
        nl += l
        d += u - l
        s += u + l
        h_ppm += 1_000_000 // (i + 1)
    z_e6 = math.floor(d * 1e6 / math.sqrt(2 * h_ppm / 1e6))
    r = _one(spark, "foster_stuart_records")
    assert (r.n, r.n_upper, r.n_lower) == (n, nu, nl)
    assert (r.d_stat, r.s_stat, r.z_e6) == (d, s, z_e6)


def test_mosum_brute(spark, days):
    ys = [y for _, y in days]
    ts = [t for t, _ in days]
    n = len(ys)
    G = 60
    sy, syy = sum(ys), sum(y * y for y in ys)
    best = None
    for i in range(n):
        if i + 1 < G or i + G >= n:
            continue
        lsum = sum(ys[i - G + 1 : i + 1])
        rsum = sum(ys[i + 1 : i + G + 1])
        m = abs(rsum - lsum)
        if best is None or m > best[1]:
            best = (ts[i], m)
    sd = math.sqrt(
        (float(syy) * n - float(sy) * float(sy)) / (float(n) * (n - 1))
    )
    norm_e6 = math.floor(
        float(best[1]) * 1e6 / (math.sqrt(float(2 * G)) * sd)
    )
    r = _one(spark, "mosum_changepoint")
    assert (r.break_t, r.mosum_raw) == best
    assert r.mosum_norm_e6 == norm_e6
    assert r.break_detected == (norm_e6 > 3_000_000)


def test_runs_up_down_brute(spark, days):
    ys = [y for _, y in days]
    sg = [
        1 if ys[i] > ys[i - 1] else -1
        for i in range(1, len(ys))
        if ys[i] != ys[i - 1]
    ]
    n_eff = len(sg) + 1
    runs = 1 + sum(
        1 for i in range(1, len(sg)) if sg[i] != sg[i - 1]
    )
    z = (runs - (2 * float(n_eff) - 1) / 3) / math.sqrt(
        (16 * float(n_eff) - 29) / 90
    )
    z_e6 = math.floor(z * 1e6)
    r = _one(spark, "runs_up_down_test")
    assert (r.n_eff, r.runs, r.z_e6) == (n_eff, runs, z_e6)


def test_holt_damped_brute(spark, months):
    a, b1, phi, one = 300_000, 100_000, 900_000, 1_000_000
    ys = months
    l, b = ys[0], ys[1] - ys[0]
    pred = {1: None}
    for t in range(2, len(ys) + 1):
        pred[t] = l + _idiv(phi * b, one)
        pb = _idiv(phi * b, one)
        l_new = _idiv(a * ys[t - 1] + (one - a) * (l + pb), one)
        b = _idiv(b1 * (l_new - l) + (one - b1) * pb, one)
        l = l_new
    rows = entry.queries()["holt_damped_forecast"](spark, SF).collect()
    got = {r.t: (r.y_c, r.pred_c) for r in rows}
    n = len(ys)
    assert len(got) == n + 3
    for t in range(1, n + 1):
        assert got[t] == (ys[t - 1], pred[t]), f"month {t}"
    for h, ps in ((1, 900_000), (2, 1_710_000), (3, 2_439_000)):
        assert got[n + h] == (None, l + _idiv(ps * b, one))


def test_theta_brute(spark, months):
    ys = months
    n = len(ys)
    st = n * (n + 1) // 2
    stt = sum(t * t for t in range(1, n + 1))
    sy = sum(ys)
    sty = sum(t * y for t, y in zip(range(1, n + 1), ys))
    den = n * stt - st * st
    a_e2 = _idiv(sy * 100 * stt - st * sty * 100, den)
    b_e2 = _idiv(n * sty * 100 - st * sy * 100, den)
    z = [
        2 * y * 100 - (a_e2 + b_e2 * t)
        for t, y in zip(range(1, n + 1), ys)
    ]
    s = z[0]
    pred = {1: None}
    for t in range(2, n + 1):
        pred[t] = _idiv(s + (a_e2 + b_e2 * t), 200)
        s = _idiv(z[t - 1] + s, 2)
    rows = entry.queries()["theta_forecast"](spark, SF).collect()
    got = {r.t: (r.y_c, r.pred_c) for r in rows}
    assert len(got) == n + 3
    for t in range(2, n + 1):
        assert got[t] == (ys[t - 1], pred[t]), f"month {t}"
    for h in (1, 2, 3):
        assert got[n + h] == (
            None,
            _idiv(s + (a_e2 + b_e2 * (n + h)), 200),
        )


def test_seasonal_strength_brute(spark, con):
    rows = con.execute(
        """
        SELECT year(o_orderdate) * 100 + month(o_orderdate) AS ym,
          month(o_orderdate) AS mo,
          sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev
        FROM orders GROUP BY 1, 2 ORDER BY 1
        """
    ).fetchall()
    ms = [(int(ym), int(mo), int(rev)) for ym, mo, rev in rows]
    n = len(ms)
    trend = {}
    for i in range(6, n - 6):
        window = [ms[j][2] for j in range(i - 5, i + 6)]
        trend[ms[i][0]] = _idiv(
            ms[i - 6][2] + 2 * sum(window) + ms[i + 6][2], 24
        )
    seas_by_mo = {}
    for mo in range(1, 13):
        vals = [
            rev - trend[ym]
            for ym, m_, rev in ms
            if m_ == mo and ym in trend
        ]
        if vals:
            seas_by_mo[mo] = _idiv(sum(vals), len(vals))
    comp = [
        (
            rev - trend[ym] - seas_by_mo[mo],
            rev - trend[ym],
            rev - seas_by_mo[mo],
        )
        for ym, mo, rev in ms
        if ym in trend
    ]
    m = len(comp)

    def var_num(vals):
        s, ss = sum(vals), sum(v * v for v in vals)
        return ss * m - s * s

    vr = var_num([c[0] for c in comp])
    vs = var_num([c[1] for c in comp])
    vt = var_num([c[2] for c in comp])
    fs = max(0, 1_000_000 - _idiv(vr * 1_000_000, vs))
    ft = max(0, 1_000_000 - _idiv(vr * 1_000_000, vt))
    r = _one(spark, "seasonal_strength_audit")
    assert (r.n, r.seasonal_strength_e6, r.trend_strength_e6) == (
        m,
        fs,
        ft,
    )
