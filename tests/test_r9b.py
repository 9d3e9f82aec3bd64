"""Independent checks for the round-9 tier-2 regression/TS devices."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def day():
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT datediff('day',
                 (SELECT min(o_orderdate)
                  FROM '{SF}/orders.parquet'), o_orderdate) AS t,
          CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
            // 100000 AS y
        FROM '{SF}/orders.parquet' GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    return rows


def _one(spark, name):
    rows = entry.queries()[name](spark, SF).collect()
    assert len(rows) == 1
    return rows[0]


def test_quantile_regression_beats_ols_on_l1(spark, day):
    # LAD's whole point: its mean |residual| is <= the OLS line's.
    n = len(day)
    st = sum(t for t, _ in day)
    sy = sum(y for _, y in day)
    stt = sum(t * t for t, _ in day)
    sty = sum(t * y for t, y in day)
    b_ols = (n * sty - st * sy) / (n * stt - st * st)
    a_ols = (sy - b_ols * st) / n
    ols_l1 = sum(abs(y - a_ols - b_ols * t) for t, y in day) / n
    r = _one(spark, "quantile_regression_irls")
    assert r.n_days == n
    assert r.mean_abs_resid_e6 <= ols_l1 * 1e6 * 1.001
    # slope should be in the same regime as OLS (same data, robust fit)
    assert abs(r.slope_ppm / 1e6 - b_ols) < max(1.0, abs(b_ols))


def test_yule_walker_brute(spark, day):
    n = len(day)
    s = sum(y for _, y in day)
    dev = {t: n * y - s for t, y in day}
    den = sum(d * d for d in dev.values())
    ac1 = sum(
        dev[t] * dev[t + 1] for t in dev if t + 1 in dev
    )
    ac2 = sum(
        dev[t] * dev[t + 2] for t in dev if t + 2 in dev
    )
    r1 = ac1 * 1_000_000 // den if ac1 >= 0 else -((-ac1 * 1_000_000) // den)
    r2 = ac2 * 1_000_000 // den if ac2 >= 0 else -((-ac2 * 1_000_000) // den)
    r = _one(spark, "yule_walker_ar2")
    assert (r.r1_ppm, r.r2_ppm) == (r1, r2)
    # YW identities, float check with slack for the ppm floors
    phi1 = (r1 / 1e6) * (1 - r2 / 1e6) / (1 - (r1 / 1e6) ** 2)
    phi2 = (r2 / 1e6 - (r1 / 1e6) ** 2) / (1 - (r1 / 1e6) ** 2)
    assert abs(r.phi1_ppm - phi1 * 1e6) <= 3
    assert abs(r.phi2_ppm - phi2 * 1e6) <= 3


def test_diebold_mariano_brute(spark, day):
    ymap = dict(day)
    ds = []
    for t in ymap:
        if t + 1 in ymap and t + 2 in ymap:
            y0, y1, y2 = ymap[t], ymap[t + 1], ymap[t + 2]
            ds.append((y2 - 2 * y1 + y0) ** 2 - (y2 - y1) ** 2)
    m, sd, sdd = len(ds), sum(ds), sum(d * d for d in ds)
    r = _one(spark, "diebold_mariano_test")
    assert r.n_triples == m
    assert r.loss_diff_sum == sd
    assert r.z2_ppm == (sd * sd * (m - 1) * 1_000_000) // (
        m * sdd - sd * sd
    )


def test_permutation_entropy_brute(spark, day):
    import math
    from collections import Counter

    ys = [y for _, y in sorted(day)]
    pats = Counter()
    for a, b, c in zip(ys, ys[1:], ys[2:]):
        pats[(b >= a, c >= a, c >= b)] += 1
    m = sum(pats.values())
    h_e6 = math.floor(1e6 * math.log(m)) - (
        sum(c * math.floor(1e6 * math.log(c)) for c in pats.values())
        // m
    )
    r = _one(spark, "permutation_entropy")
    assert r.n_triples == m
    assert r.n_patterns_observed == len(pats)
    assert r.h_e6 == h_e6
    assert 0 < r.normalized_ppm <= 1_050_000


def test_sen_slope_seasonal_brute(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT year(o_orderdate), month(o_orderdate),
          CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
        FROM '{SF}/orders.parquet' GROUP BY 1, 2
        """
    ).fetchall()
    rev = {(y, m): v for y, m, v in rows}
    slopes = []
    for (y1, m1), v1 in rev.items():
        for (y2, m2), v2 in rev.items():
            if m1 == m2 and y2 > y1:
                num = (v2 - v1) * 1_000_000
                den = (y2 - y1) * 12
                q = abs(num) // den
                slopes.append(q if num >= 0 else -q)
    slopes.sort()
    med = slopes[(len(slopes) + 1) // 2 - 1]
    r = _one(spark, "sen_slope_seasonal")
    assert r.n_pairs == len(slopes)
    assert r.sen_slope_cents_per_month_e6 == med


def test_tracking_signal_and_ewma_sane(spark):
    ts = _one(spark, "tracking_signal_audit")
    assert 0 <= ts.n_alarm_days <= ts.n_days
    assert ts.alarm_share_ppm == ts.n_alarm_days * 1_000_000 // ts.n_days
    ecc = _one(spark, "ewma_control_chart")
    assert ecc.n_monitored <= ecc.n_days
    assert 0 <= ecc.n_out_of_control <= ecc.n_monitored
    assert ecc.worst_dev2_ratio_ppm >= 0


def test_granger_and_arch_bounds(spark):
    g = _one(spark, "granger_lag1_test")
    assert 0 <= g.r2_restricted_ppm <= 1_000_000
    # floors can nick the unrestricted R2 a hair under the restricted
    assert g.r2_unrestricted_ppm >= g.r2_restricted_ppm - 5
    a = _one(spark, "arch_lm_test")
    assert -1_000_000 <= a.lag1_sq_corr_ppm <= 1_000_000
    assert a.lm_ppm >= 0
