"""Independent brute checks for the round-9 tier-3 devices."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("orders", "customer", "nation", "lineitem"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'"
        )
    return c


def _rows(spark, name):
    return entry.queries()[name](spark, SF).collect()


def test_g_test_brute(spark, con):
    cells = con.execute(
        "SELECT l_returnflag, l_linestatus, count(*) FROM lineitem"
        " GROUP BY 1, 2"
    ).fetchall()
    n = sum(c for _, _, c in cells)
    rm, cm = {}, {}
    for rf, ls, c in cells:
        rm[rf] = rm.get(rf, 0) + c
        cm[ls] = cm.get(ls, 0) + c
    g = sum(
        2 * c * math.floor(1e6 * math.log(c * n / (rm[rf] * cm[ls])))
        for rf, ls, c in cells
    )
    (r,) = _rows(spark, "g_test_independence")
    assert r.n_rows == n
    assert r.g_e6 == g
    assert r.df == (len(rm) - 1) * (len(cm) - 1)


def test_shrinkage_pulls_toward_grand_rate(spark):
    rows = _rows(spark, "bayesian_shrinkage_rates")
    assert len(rows) == 25
    for r in rows:
        lo, hi = sorted((r.raw_ppm, r.grand_rate_ppm))
        # posterior lies between the raw rate and the grand rate
        # (±1 ppm for the staged floors)
        assert lo - 1 <= r.shrunk_ppm <= hi + 1
        assert 0 <= r.prior_weight_ppm <= 1_000_000
        # smaller n ⇒ more pull: check the weight formula shape
        if r.n > 0:
            assert r.prior_weight_ppm < 1_000_000


def test_ratio_ci_brackets_ratio(spark, con):
    rows = _rows(spark, "ratio_metric_delta_ci")
    assert len(rows) == 2
    for r in rows:
        assert r.ci_lo_c <= r.revenue_per_order_c <= r.ci_hi_c
        assert r.ci_half_c > 0
    # brute ratio per variant
    brute = dict(
        con.execute(
            """
            SELECT o_custkey % 2,
              CAST(sum(x) * 100 // sum(y) AS BIGINT)
            FROM (SELECT o_custkey,
                    CAST(sum(CAST(round(o_totalprice*100) AS BIGINT))
                         AS BIGINT) AS x,
                    count(*) AS y
                  FROM orders GROUP BY o_custkey) t
            GROUP BY 1
            """
        ).fetchall()
    )
    for r in rows:
        assert r.revenue_per_order_c == brute[r.variant]


def test_evalue_brute(spark, con):
    a, b, c, d = con.execute(
        """
        SELECT
          sum(CASE WHEN u = 1 AND h = 1 THEN 1 ELSE 0 END),
          sum(CASE WHEN u = 1 AND h = 0 THEN 1 ELSE 0 END),
          sum(CASE WHEN u = 0 AND h = 1 THEN 1 ELSE 0 END),
          sum(CASE WHEN u = 0 AND h = 0 THEN 1 ELSE 0 END)
        FROM (SELECT
                CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END u,
                CASE WHEN CAST(round(o_totalprice*100) AS BIGINT)
                     > 30000000 THEN 1 ELSE 0 END h
              FROM orders)
        """
    ).fetchone()
    rr_ppm = a * (c + d) * 1_000_000 // (c * (a + b))
    rr_star = rr_ppm if rr_ppm >= 1_000_000 else 10**12 // rr_ppm
    ev = rr_star + math.floor(math.sqrt(rr_star * (rr_star - 1_000_000)))
    (r,) = _rows(spark, "evalue_sensitivity")
    assert r.rr_ppm == rr_ppm
    assert r.evalue_ppm == ev
    # E-value is always >= the folded RR
    assert r.evalue_ppm >= rr_star


def test_ato_bounded_vs_naive(spark):
    (r,) = _rows(spark, "overlap_weights_ato")
    assert r.n_treated > 0 and r.n_control > 0
    # latency differences live in day units; both estimates bounded
    assert abs(r.ato_latency_days_e6) < 400 * 1_000_000
    assert abs(r.naive_diff_days_e6) < 400 * 1_000_000


def test_kendall_w_in_unit_range_and_friedman_consistent(spark):
    (r,) = _rows(spark, "kendall_w_concordance")
    assert 0 <= r.w_ppm <= 1_000_000
    assert r.chi2_ppm == r.n_blocks * 4 * r.w_ppm
