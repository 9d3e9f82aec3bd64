"""Tier-10 (catalog_r8j, post-slot extras) invariants."""

from __future__ import annotations

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def test_periodogram_shape_and_dominant_flag(spark):
    rows = entry.queries()["seasonal_periodogram_audit"](spark, SF).collect()
    assert sorted(r.period for r in rows) == [7, 30, 91, 365]
    mx = max(r.power for r in rows)
    for r in rows:
        assert r.power >= 0
        assert 0 <= r.rel_power_ppm <= 1_000_000
        assert r.dominant == (r.power == mx)
    assert sum(1 for r in rows if r.rel_power_ppm == 1_000_000) >= 1


def test_median_ci_brackets_the_median_and_ranks_are_sane(spark):
    rows = entry.queries()["median_ci_order_stat"](spark, SF).collect()
    assert len(rows) == 1
    r = rows[0]
    assert 0 < r.l_rank < r.u_rank <= r.n_orders + 1
    assert r.ci_lo_c <= r.median_c <= r.ci_hi_c
    # interval shrinks like 1/√n: at sf0.001 it must still be a
    # proper sub-range of the value space
    assert r.ci_lo_c > 0
