"""Tier-4 (catalog_r8d) invariants: bounds and internal consistency
that must hold for ANY data, complementing the value-exact DuckDB
parity that tests/test_registered_queries.py already enforces."""

from __future__ import annotations

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def _one(spark, name):
    rows = entry.queries()[name](spark, SF).collect()
    assert len(rows) == 1
    return rows[0]


def test_cox_newton_converges_and_score_test_consistent(spark):
    r = _one(spark, "cox_ph_binary")
    assert r.hazard_ratio_ppm > 0
    # Newton landed: the score at the final W is ~0, so its squared
    # ppm statistic must be tiny next to the β=0 score statistic.
    assert r.final_score_sq_ppm <= max(1, r.score_chi2_ppm // 100)
    assert r.n_events > 0 and r.n_event_days <= 365
    assert r.reject_equal_hazard == (r.score_chi2_ppm > 3_841_458)


def test_ljung_box_r_is_a_correlation_and_q_aggregates(spark):
    rows = entry.queries()["ljung_box_test"](spark, SF).collect()
    assert len(rows) == 10
    assert sorted(r.lag for r in rows) == list(range(1, 11))
    for r in rows:
        assert abs(r.r_ppm) <= 1_000_000
        assert r.pairs > 0
        assert r.q_ppm >= 0
        assert r.reject_white_noise == (r.q_ppm > 18_307_038)
    assert len({r.q_ppm for r in rows}) == 1  # Q is a shared scalar


def test_durbin_watson_bounds(spark):
    r = _one(spark, "durbin_watson_test")
    # d ∈ [0, 4] by construction (ppm; integer flooring can only
    # pull the ratio inward).
    assert 0 <= r.dw_ppm <= 4_000_000
    assert r.n_pairs < r.n_days
    assert r.positive_autocorr_side == (r.dw_ppm < 1_000_000)


def test_breusch_pagan_r2_is_a_fraction(spark):
    r = _one(spark, "breusch_pagan_test")
    assert 0 <= r.r2_ppm <= 1_000_000
    assert r.lm_ppm == r.n_days * r.r2_ppm
    assert r.reject_homoskedastic == (r.lm_ppm > 3_841_458)


def test_jonckheere_statistic_is_within_pair_space(spark):
    r = _one(spark, "jonckheere_terpstra")
    # 0 ≤ 2·U ≤ 2·Σ_{i<j} nᵢnⱼ = 4·mean₂, and mean₂ sits at the middle.
    assert 0 <= r.jt2 <= 4 * r.mean2
    assert r.z2_ppm >= 0
    assert r.monotone_trend == (r.z2_ppm > 3_841_458)
    assert r.increasing_side == (r.jt2 > r.mean2)
