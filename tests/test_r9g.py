"""Independent brute checks for the round-9 tier-7 extras."""

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


def _one(spark, name):
    rows = entry.queries()[name](spark, SF).collect()
    assert len(rows) == 1
    return rows[0]


def test_ad2_brute(spark, con):
    rows = con.execute(
        """
        SELECT c.c_mktsegment,
          CAST(round(o.o_totalprice * 100) AS BIGINT) // 1000
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
        """
    ).fetchall()
    g1 = sorted(v for s, v in rows if s == "BUILDING")
    g2 = sorted(v for s, v in rows if s == "MACHINERY")
    n, m = len(g1), len(g2)
    big_n = n + m
    from collections import Counter

    c1, c2 = Counter(g1), Counter(g2)
    ca = cb = 0
    total = 0
    for v in sorted(set(g1) | set(g2)):
        c = c1[v] + c2[v]
        ca += c1[v]
        cb += c2[v]
        cn = ca + cb
        if cn >= big_n:
            continue
        total += (
            c * (m * ca - n * cb) ** 2 * 1_000_000
        ) // (cn * (big_n - cn))
    a2 = total // (n * m)
    r = _one(spark, "anderson_darling_2sample")
    assert (r.n1, r.n2) == (n, m)
    assert r.a2_e6 == a2


def test_page_hinkley_brute(spark, con):
    day = con.execute(
        """
        SELECT datediff('day', (SELECT min(o_orderdate) FROM orders),
                        o_orderdate) AS t,
          CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
            // 100000 AS y
        FROM orders GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    sy = sum(y for _, y in day)
    lam = (sy * 1_000_000 // len(day)) // 10
    cum = mn = mcur = 0
    cy = 0
    alarms = []
    max_ph = 0
    for i, (t, y) in enumerate(day, start=1):
        cy += y
        d = y * 1_000_000 - (cy * 1_000_000 // i)
        mcur += d
        mn = min(mn, mcur)
        ph = mcur - mn
        max_ph = max(max_ph, ph)
        if ph > lam:
            alarms.append(t)
    del cum
    r = _one(spark, "page_hinkley_drift")
    assert r.n_days == len(day)
    assert r.lambda_e6 == lam
    assert r.n_alarm_days == len(alarms)
    assert r.first_alarm_day == (alarms[0] if alarms else -1)
    assert r.max_ph_e6 == max_ph


def test_theil_sen_ci_brackets_point(spark):
    r = _one(spark, "theil_sen_ci")
    assert r.ci_lo_e6 <= r.sen_slope_cents_per_month_e6 <= r.ci_hi_e6
    assert r.n_pairs == r.n_months * (r.n_months - 1) // 2
    # C_alpha matches the MK variance formula
    n = r.n_months
    c = math.floor(
        math.sqrt(3_841_458 / 1e6 * (n * (n - 1) * (2 * n + 5)) / 18)
    )
    assert r.c_alpha == c


def test_tau_b_between_gamma_and_tau_a(spark, con):
    r = _one(spark, "kendall_tau_b")
    p, q, tx, ty = (
        r.concordant,
        r.discordant,
        r.tied_disc_only,
        r.tied_qty_only,
    )
    tau_b = math.floor(
        1e6 * (p - q) / math.sqrt((p + q + tx) * (p + q + ty))
    )
    assert r.tau_b_ppm == tau_b
    # |tau_b| <= |gamma| always (gamma excludes the tie mass)
    g = entry.queries()["kruskal_gamma"](spark, SF).collect()[0]
    assert abs(r.tau_b_ppm) <= abs(g.gamma_ppm) + 1


def test_median_polish_effects_sum_sane(spark, con):
    rows = entry.queries()["median_polish_lite"](spark, SF).collect()
    assert len(rows) == 5
    grid_max = con.execute(
        """
        SELECT max(v) FROM (
          SELECT year(o_orderdate)*100+month(o_orderdate) ym,
            c.c_mktsegment, CAST(sum(CAST(round(o_totalprice*100)
            AS BIGINT)) AS BIGINT) v
          FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
          GROUP BY 1, 2)
        """
    ).fetchone()[0]
    for r in rows:
        # residuals and effects live inside the data's magnitude
        assert abs(r.segment_effect_c) <= grid_max
        assert 0 <= r.mean_abs_resid_c <= r.max_abs_resid_c <= grid_max
        assert r.n_months == rows[0].n_months
