"""Tier-8 (catalog_r8h, post-slot extras) invariants."""

from __future__ import annotations

import math

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def _one(spark, name):
    rows = entry.queries()[name](spark, SF).collect()
    assert len(rows) == 1
    return rows[0]


def test_mmr_picks_are_distinct_and_scores_nonincreasing_after_first(spark):
    rows = entry.queries()["mmr_diversified_rerank"](spark, SF).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        assert len(rs) == 5
        assert len({r.neighbor_id for r in rs}) == 5  # no repeats
        ranked = sorted(rs, key=lambda r: r.pick_rank)
        assert [r.pick_rank for r in ranked] == [1, 2, 3, 4, 5]
        # greedy MMR scores from step 2 on are non-increasing: the
        # candidate pool only shrinks and maxsim only grows.
        tail = [r.mmr_score_e6 for r in ranked[1:]]
        assert tail == sorted(tail, reverse=True)
        # Pick 1 is pure relevance (λ·rel) with NO diversity bonus,
        # while pick 2 can gain up to (10−λ)·1e6 div 10 from a NEGATIVE
        # max-sim (anti-similar shortlist members — observed with the
        # IVF-fed shortlist), so pick1 ≥ pick2 only up to that bonus.
        assert ranked[0].mmr_score_e6 >= tail[0] - 300_000


def test_fisher_exact_matches_lgamma_reference(spark):
    r = _one(spark, "fisher_exact_2x2")
    a, r1, c1 = r.heavy_in_b, r.n_b, r.heavy_total
    n = r.n_b + r.n_a

    def lchoose(nn: int, kk: int) -> float:
        return (
            math.lgamma(nn + 1)
            - math.lgamma(kk + 1)
            - math.lgamma(nn - kk + 1)
        )

    kmax = min(r1, c1)
    p = sum(
        math.exp(
            lchoose(r1, k) + lchoose(n - r1, c1 - k) - lchoose(n, c1)
        )
        for k in range(a, kmax + 1)
    )
    assert abs(r.p_one_sided_e6 - p * 1e6) <= 2.0
    assert 0 <= r.p_one_sided_e6 <= 1_000_000


def test_hurst_is_in_unit_range(spark):
    r = _one(spark, "hurst_exponent")
    assert r.n_window_sizes == 4
    # The true exponent lives in (0, 1); with the ADVICE-r8 fix (no
    # spurious sqrt(w) — that version biased the slope to H+0.5 and
    # read 1.0006 on near-memoryless data) the estimate sits in the
    # classic neighborhood; keep a small OLS-noise margin above 1.
    assert 0 < r.hurst_ppm < 1_050_000
    assert r.persistent_memory == (r.hurst_ppm > 500_000)


def test_partial_correlations_are_bounded_and_consistent(spark):
    rows = entry.queries()["partial_correlation_triples"](spark, SF).collect()
    assert len(rows) == 3
    assert {r.pair for r in rows} == {
        "orders_revenue_given_discount",
        "orders_discount_given_revenue",
        "revenue_discount_given_orders",
    }
    for r in rows:
        assert abs(r.marginal_ppm) <= 1_000_000
        assert 0 <= r.partial_r2_ppm <= 1_000_100  # floor slack
        # numerator sign must match the signed ppm column
        assert (r.partial_num_ppm >= 0) or (r.partial_r2_ppm >= 0)


def test_bartlett_statistic_is_nonnegative_up_to_floor_slack(spark):
    r = _one(spark, "bartlett_test")
    assert r.k_groups == 5
    # Jensen: (N−k)ln(s_p²) ≥ Σ(nᵢ−1)ln(sᵢ²); per-term floors can
    # only shift by ≤1e-6·dof each way.
    assert r.bartlett_raw_e6 >= -r.n_total
    assert r.reject_equal_variance_uncorrected == (
        r.bartlett_raw_e6 > 9_487_729
    )
