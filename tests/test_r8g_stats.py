"""Tier-7 (catalog_r8g) invariants, complementing the value-exact
DuckDB parity of tests/test_registered_queries.py."""

from __future__ import annotations

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def _one(spark, name):
    rows = entry.queries()[name](spark, SF).collect()
    assert len(rows) == 1
    return rows[0]


def test_hits_scores_are_l1_normalized_ppm(spark):
    rows = entry.queries()["hits_hub_authority"](spark, SF).collect()
    sides = {}
    for r in rows:
        assert r.score_ppm > 0
        sides.setdefault(r.side, []).append(r.score_ppm)
    assert set(sides) == {"hub", "authority"}
    for side, scores in sides.items():
        assert len(scores) == 10
        # top-10 of an L1-normalized ppm vector can't exceed the total
        assert sum(scores) <= 1_000_000
        assert scores == sorted(scores, reverse=True)


def test_dunn_pairs_and_z2_identity(spark):
    rows = entry.queries()["dunn_posthoc"](spark, SF).collect()
    assert len(rows) == 10  # C(5,2) region pairs
    for r in rows:
        assert r.var2_ppm > 0
        assert (
            r.z2_ppm
            == (r.rank_diff2_ppm * r.rank_diff2_ppm) // r.var2_ppm
        )
        assert r.significant_bonferroni == (r.z2_ppm > 7_879_438)


def test_ansari_bradley_statistic_bounds(spark):
    r = _one(spark, "ansari_bradley")
    n = r.n_urgent + r.n_rest
    # every doubled folded score lies in [2, N+2] (midrank fold of the
    # doubled 3..2N+1 rank range), so the group sum is bracketed.
    assert 2 * r.n_urgent <= r.ab2_stat <= (n + 2) * r.n_urgent
    assert r.z2_ppm >= 0
    assert r.reject_equal_dispersion == (r.z2_ppm > 3_841_458)


def test_seasonal_mk_consistency(spark):
    r = _one(spark, "seasonal_mk_trend")
    # |S| is at most the number of same-month year pairs
    assert abs(r.s_stat) <= 12 * 7 * 6 // 2
    assert r.var18 > 0
    assert r.increasing_side == (r.s_stat > 0)
    if r.seasonal_trend:
        assert r.z2_ppm > 3_841_458 and abs(r.s_stat) > 1


def test_cooks_distance_topk_ordering_and_leverage(spark):
    rows = entry.queries()["cooks_distance_outliers"](spark, SF).collect()
    assert len(rows) == 10
    ds = [r.cook_d_ppm for r in rows]
    assert ds == sorted(ds, reverse=True)
    for r in rows:
        assert 0 < r.leverage_ppm < 1_000_000
        assert r.cook_d_ppm >= 0


def test_theil_u2_is_a_ratio_of_the_reported_sums(spark):
    r = _one(spark, "theil_u2_forecast_audit")
    assert r.n_triples > 0
    assert r.u2_sq_ppm == (r.sse_drift * 1_000_000) // r.sse_naive
    assert r.drift_beats_naive == (r.u2_sq_ppm < 1_000_000)
