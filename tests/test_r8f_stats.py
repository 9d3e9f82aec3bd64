"""Tier-6 (catalog_r8f) invariants, complementing the value-exact
DuckDB parity of tests/test_registered_queries.py."""

from __future__ import annotations

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def _one(spark, name):
    rows = entry.queries()[name](spark, SF).collect()
    assert len(rows) == 1
    return rows[0]


def test_bigram_lm_scores_are_positive_per_doc_nll(spark):
    rows = entry.queries()["bigram_lm_perplexity"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r.n_bigrams >= 1
        # add-one smoothing: (c1+V)/(cb+1) > 1 whenever V > cb is not
        # guaranteed per term, but the DOC total must be positive for
        # any nondegenerate corpus (V ≥ 2 here).
        assert r.avg_nll_e6 > 0
        assert abs(r.nll_e6 // r.n_bigrams - r.avg_nll_e6) <= 1


def test_pettitt_statistic_bounds_and_gate(spark):
    r = _one(spark, "pettitt_changepoint")
    n = r.n_days
    # |U_t| ≤ t(n−t) ≤ n²/4 exactly (each of the t·(n−t) sgn terms
    # is in {−1,0,1}).
    assert 0 <= r.k_stat <= n * n // 4
    assert (
        r.reject_no_change
        == (6 * r.k_stat**2 * 1_000_000 > 3_688_879 * (n**3 + n**2))
    )


def test_croston_ewmas_stay_inside_their_series_hulls(spark):
    r = _one(spark, "croston_intermittent")
    assert r.demand_days >= 2
    assert r.interval_ewma_ppm >= 1_000_000  # gaps are ≥ 1 day
    assert r.size_ewma_c > 0
    assert (
        r.demand_rate_c_per_day
        == (r.size_ewma_c * 1_000_000) // r.interval_ewma_ppm
    )


def test_jarque_bera_components_and_gate(spark):
    r = _one(spark, "jarque_bera_test")
    assert r.skew2_ppm >= 0
    assert r.exkurt_ppm >= -3_000_000  # kurtosis ≥ 0 ⇒ excess ≥ −3
    jb = (
        r.n_days
        * (r.skew2_ppm + (r.exkurt_ppm * r.exkurt_ppm // 1_000_000) // 4)
        // 6
    )
    assert r.jb_ppm == jb
    assert r.reject_normality == (r.jb_ppm > 5_991_464)


def test_page_l_is_within_its_exact_extremes(spark):
    r = _one(spark, "page_trend_test")
    b, k = r.n_years, r.k_months
    # L = Σ_blocks Σ_j j·r_j: extremes are the anti-sorted and sorted
    # rank assignments.
    lo = b * sum(j * (k + 1 - j) for j in range(1, k + 1))
    hi = b * sum(j * j for j in range(1, k + 1))
    assert lo <= r.l_stat <= hi
    assert r.l_mean == b * k * (k + 1) * (k + 1) // 4
    assert r.z2_ppm >= 0
    if r.monotone_seasonal_trend:
        assert r.z2_ppm > 2_705_543 and r.l_stat > r.l_mean
