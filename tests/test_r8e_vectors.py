"""Tier-5 (catalog_r8e) invariants: packing/Hamming identities, recall
audit sanity, the Bayes closed-form vs an independent lgamma reference,
RAPPOR unbiasedness wiring — plus the pinned DuckDB list_reduce
struct-accumulator bug that forced the Horner scalar-fold design."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def test_duckdb_list_reduce_struct_accumulator_is_broken():
    """Pin the engine quirk that shaped bayes_ab_prob_superiority: a
    (t, s) struct accumulator where s sums the OLD t must yield
    t=8, s=1+2+4=7 — DuckDB returns s=13 (s sees the UPDATED t from
    step 2 on).  If this ever starts passing with 7, the Horner
    workaround can be retired."""
    (res,) = duckdb.sql(
        "SELECT list_reduce("
        " list_prepend({'t': 1.0::DOUBLE, 's': 0.0::DOUBLE},"
        "  [{'t': 0.0::DOUBLE, 's': 0.0::DOUBLE},"
        "   {'t': 0.0::DOUBLE, 's': 0.0::DOUBLE},"
        "   {'t': 0.0::DOUBLE, 's': 0.0::DOUBLE}]),"
        " (acc, x) -> {'t': acc.t * 2.0, 's': acc.s + acc.t})"
    ).fetchone()
    assert res["t"] == 8.0
    assert res["s"] != 7.0, (
        "DuckDB fixed list_reduce struct accumulators — "
        "bayes_ab could use the single-fold form again"
    )


def test_binary_quantize_search_shape_and_hamming_bounds(spark):
    rows = entry.queries()["binary_quantize_search"](spark, SF).collect()
    by_q = {}
    for r in rows:
        assert 0 <= r.hamming <= 64
        assert r.neighbor_id != r.query_id
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        assert len(rs) == 10
        assert q % 50 == 0
        ranked = sorted(rs, key=lambda r: r.rank)
        hams = [r.hamming for r in ranked]
        assert hams == sorted(hams)  # rank follows hamming


def test_binary_rerank_recall_beats_chance_and_is_a_fraction(spark):
    rows = entry.queries()["binary_rerank_recall_audit"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_matched <= 10
        assert r.recall_ppm == r.n_matched * 100_000
    # 64-bit signatures at 50-vector sf0.001 corpus: mean recall must
    # crush the ~10/49 chance level.
    mean = sum(r.n_matched for r in rows) / (10 * len(rows))
    assert mean > 0.5


def test_jl_sketch_recall_beats_chance(spark):
    rows = entry.queries()["jl_projection_recall_audit"](spark, SF).collect()
    assert rows
    mean = sum(r.n_matched for r in rows) / (10 * len(rows))
    # The synthetic embeddings are near-isotropic noise (all pairwise
    # cosines ≈ 0), the hardest case for a 16-dim sketch — recall is
    # honestly LOW here (~0.15, like ivfpq's recorded 0.7 on easier
    # geometry).  The floor asserted is chance (10/499 ≈ 0.02) with
    # head-room: the audit must still beat random guessing 3×.
    assert mean > 0.06


def test_bayes_ab_matches_independent_lgamma_reference(spark):
    (r,) = entry.queries()["bayes_ab_prob_superiority"](spark, SF).collect()
    aa_a, bb_a = 1 + r.c_a, 1 + r.n_a - r.c_a
    aa_b, bb_b = 1 + r.c_b, 1 + r.n_b - r.c_b

    def lbeta(a: float, b: float) -> float:
        return math.lgamma(a) + math.lgamma(b) - math.lgamma(a + b)

    p = sum(
        math.exp(
            lbeta(aa_a + i, bb_a + bb_b)
            - math.log(bb_b + i)
            - lbeta(1 + i, bb_b)
            - lbeta(aa_a, bb_a)
        )
        for i in range(aa_b)
    )
    # lgamma path accumulates its own rounding; agree to 1e-9 of P.
    assert r.prob_b_beats_a_e6 == pytest.approx(p * 1e6, abs=1.0)
    assert 0 <= r.prob_b_beats_a_e6 <= 1_000_000
    assert r.ship_b == (r.prob_b_beats_a_e6 / 1e6 > 0.95) or abs(
        r.prob_b_beats_a_e6 - 950_000
    ) < 5


def test_rappor_estimator_identity_and_grid(spark):
    rows = entry.queries()["rappor_freq_estimate"](spark, SF).collect()
    assert len(rows) == 5  # the five event types
    n = {r.n_users for r in rows}
    assert len(n) == 1  # full user grid per type
    for r in rows:
        assert r.est_ppm == ((r.reported * 1_000_000) // r.n_users - 250_000) * 2
        assert r.err_ppm == r.est_ppm - r.true_ppm
        assert 0 <= r.true_ppm <= 1_000_000
