"""Tier-12 (catalog_r8l, post-slot extras) invariants."""

from __future__ import annotations

import math

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def test_wilson_brackets_phat_and_matches_float_reference(spark):
    rows = entry.queries()["wilson_score_interval"](spark, SF).collect()
    assert len(rows) == 5
    z = 1.959964
    for r in rows:
        assert 0 <= r.wilson_lo_ppm <= r.p_ppm <= r.wilson_hi_ppm <= 1_000_000
        # float reference within floor slack
        n, a = r.n, r.a
        center = (a + z * z / 2) / (n + z * z)
        half = (
            z
            * math.sqrt(a * (n - a) / n + z * z / 4)
            / (n + z * z)
        )
        assert abs(r.wilson_lo_ppm - (center - half) * 1e6) <= 3
        assert abs(r.wilson_hi_ppm - (center + half) * 1e6) <= 3
        assert r.excludes_quarter == (
            r.wilson_hi_ppm < 250_000 or r.wilson_lo_ppm > 250_000
        )


def test_sprt_decision_is_consistent_with_the_walk(spark):
    rows = entry.queries()["sprt_boundary_crossing"](spark, SF).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.decision in ("accept_h1", "accept_h0", "continue")
    assert r.upper_e6 == -r.lower_e6 > 0
    if r.decision == "accept_h1":
        assert r.llr_e6 >= r.upper_e6
    elif r.decision == "accept_h0":
        assert r.llr_e6 <= r.lower_e6
    else:
        assert r.lower_e6 < r.llr_e6 < r.upper_e6
        assert r.decision_day >= r.n_days - 1  # last observed day


def test_breslow_day_consistency_with_mh(spark):
    rows = entry.queries()["breslow_day_homogeneity"](spark, SF).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_strata == 5
    assert r.or_mh_ppm > 0
    assert r.bd_chi2_ppm >= 0
    assert r.or_homogeneous == (r.bd_chi2_ppm <= 9_487_729)
    # the common OR this audit gates must equal mantel_haenszel_cmh's
    (mh,) = entry.queries()["mantel_haenszel_cmh"](spark, SF).collect()
    assert r.or_mh_ppm == mh.or_mh_ppm
