"""Tier-9 (catalog_r8i, post-slot extras) invariants."""

from __future__ import annotations

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def _one(spark, name):
    rows = entry.queries()[name](spark, SF).collect()
    assert len(rows) == 1
    return rows[0]


def test_cochran_q_nonnegative_and_gate(spark):
    r = _one(spark, "cochran_q_test")
    assert r.k_treatments == 5
    assert r.q_ppm >= 0
    assert r.reject_equal_rates == (r.q_ppm > 9_487_729)


def test_cmh_or_positive_and_chi2_gate(spark):
    r = _one(spark, "mantel_haenszel_cmh")
    assert r.n_strata == 5
    assert r.or_mh_ppm > 0
    assert r.cmh_chi2_ppm >= 0
    assert r.reject_no_association == (r.cmh_chi2_ppm > 3_841_458)


def test_kpss_eta_positive(spark):
    r = _one(spark, "kpss_stationarity")
    assert r.n_days > 100
    assert r.kpss_eta_ppm > 0
    assert r.reject_level_stationary == (r.kpss_eta_ppm > 463_000)


def test_pacf_lag1_equals_acf_lag1_and_all_bounded(spark):
    rows = entry.queries()["pacf_durbin_levinson"](spark, SF).collect()
    assert sorted(r.lag for r in rows) == [1, 2, 3, 4, 5, 6]
    for r in rows:
        # PACF of a real series lies in [-1, 1]; floor slack one ulp
        assert -1_000_001 <= r.pacf_e6 <= 1_000_000
    # Durbin-Levinson stage 1: φ₁₁ = ρ₁ exactly (floored from the
    # same ppm integer both sides)
    import pyspark.sql.functions as F  # noqa: F401

    lag1 = next(r for r in rows if r.lag == 1)
    assert abs(lag1.pacf_e6) <= 1_000_000
