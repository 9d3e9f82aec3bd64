"""Property-based checks (hypothesis) for the round-8 cross-engine
DEVICES — the algebra the catalog queries rely on, validated against
brute-force references on random inputs.  DuckDB executes the SQL side
so hundreds of examples stay fast; the Spark side runs the SAME
generated SQL strings in the catalog queries, which the oracle gate
already proves equal, so device == brute here transitively covers
both engines."""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

_EX = dict(max_examples=60, deadline=None)


def _duck(sql: str):
    return duckdb.sql(sql).fetchall()


# ---------------------------------------------------------------------------
# doubled-midrank device (pettitt / dunn / ansari / jonckheere)
# ---------------------------------------------------------------------------


@given(st.lists(st.integers(0, 8), min_size=1, max_size=40))
@settings(**_EX)
def test_doubled_midrank_map_equals_reference_midranks(values):
    """2·cumlt + c + 1 over the distinct-value histogram == 2× the
    classical midrank for EVERY occurrence, ties included."""
    vals = "), (".join(str(v) for v in values)
    got = dict(
        _duck(f"""
        WITH o(v) AS (VALUES ({vals})),
        dist AS (SELECT v, count(*)::BIGINT c FROM o GROUP BY v),
        rmap AS (
          SELECT v, 2 * (sum(c) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c)
            + c + 1 AS r2
          FROM dist)
        SELECT v, r2 FROM rmap
        """)
    )
    srt = sorted(values)
    for v in set(values):
        lo = srt.index(v) + 1
        hi = lo + values.count(v) - 1
        assert got[v] == lo + hi  # 2 × midrank = lo + hi


# ---------------------------------------------------------------------------
# Pettitt U_t identity (rank form == brute sgn double sum, with ties)
# ---------------------------------------------------------------------------


@given(st.lists(st.integers(0, 6), min_size=2, max_size=25))
@settings(**_EX)
def test_pettitt_rank_identity_matches_brute_sgn_sum(ys):
    n = len(ys)
    vals = "), (".join(f"{t}, {y}" for t, y in enumerate(ys))
    got = _duck(f"""
    WITH day(t, y) AS (VALUES ({vals})),
    dist AS (SELECT y, count(*)::BIGINT c FROM day GROUP BY y),
    rmap AS (
      SELECT y, 2 * (sum(c) OVER (ORDER BY y
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c)
        + c + 1 AS r2
      FROM dist)
    SELECT day.t,
      sum(rmap.r2) OVER (ORDER BY day.t
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        - (row_number() OVER (ORDER BY day.t)) * ({n} + 1) AS u_t
    FROM day JOIN rmap ON rmap.y = day.y
    ORDER BY day.t
    """)
    for t_idx, u in got:
        t = t_idx + 1  # 1-based prefix length
        brute = sum(
            (ys[i] > ys[j]) - (ys[i] < ys[j])
            for i in range(t)
            for j in range(t, n)
        )
        assert u == brute, (t, u, brute, ys)


# ---------------------------------------------------------------------------
# Jonckheere histogram pair count == brute pairwise comparison
# ---------------------------------------------------------------------------


@given(
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 5)),
        min_size=2,
        max_size=40,
    )
)
@settings(**_EX)
def test_jonckheere_histogram_form_matches_brute_pairs(rows):
    vals = "), (".join(f"{g}, {v}" for g, v in rows)
    got = _duck(f"""
    WITH o(g, v) AS (VALUES ({vals})),
    h AS (SELECT g, v, count(*)::BIGINT c FROM o GROUP BY g, v),
    grid AS (
      SELECT gg.g, vv.v FROM (SELECT DISTINCT g FROM o) gg
      CROSS JOIN (SELECT DISTINCT v FROM o) vv),
    cum AS (
      SELECT grid.g, grid.v, coalesce(h.c, 0) AS c,
        sum(coalesce(h.c, 0)) OVER (PARTITION BY grid.g ORDER BY grid.v
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          - coalesce(h.c, 0) AS cumlt
      FROM grid LEFT JOIN h ON h.g = grid.g AND h.v = grid.v)
    SELECT coalesce(sum(2 * b.c * a.cumlt + a.c * b.c), 0)
    FROM cum a JOIN cum b ON a.v = b.v AND a.g < b.g
    """)[0][0]
    brute = sum(
        2 * (va < vb) + (va == vb)
        for ga, va in rows
        for gb, vb in rows
        if ga < gb
    )
    assert got == brute


# ---------------------------------------------------------------------------
# Horner tail fold (bayes_ab / fisher_exact) == direct term sum
# ---------------------------------------------------------------------------


@given(
    st.lists(
        st.fractions(
            min_value=0, max_value=2, max_denominator=20
        ).map(float),
        min_size=0,
        max_size=12,
    ),
    st.floats(0.01, 10.0),
)
@settings(**_EX)
def test_horner_reversed_fold_equals_direct_prefix_product_sum(ratios, t0):
    """t0·(1 + r0(1 + r1(…))) over the reversed ratio list must equal
    t0·Σᵢ Π_{l<i} r_l — the rearrangement bayes_ab/fisher rely on."""
    lit = ", ".join(f"{r!r}::DOUBLE" for r in ratios)
    arr = f"[{lit}]" if ratios else "[]::DOUBLE[]"
    got = _duck(
        f"SELECT {t0!r}::DOUBLE * list_reduce(list_prepend(1.0::DOUBLE,"
        f" list_reverse({arr})), (acc, r) -> 1.0::DOUBLE + r * acc)"
    )[0][0]
    want, term = 0.0, t0
    for r in ratios:
        want += term
        term *= r
    want += term  # i = len(ratios) prefix product
    assert abs(got - want) <= 1e-9 * max(1.0, abs(want))


# ---------------------------------------------------------------------------
# Cox score/information collapse (binary covariate, Breslow) at β=0
# ---------------------------------------------------------------------------


@given(
    st.lists(
        st.tuples(
            st.integers(1, 6),  # event time
            st.booleans(),  # covariate x
        ),
        min_size=3,
        max_size=30,
    )
)
@settings(**_EX)
def test_cox_breslow_collapse_matches_brute_score_at_null(subjects):
    """U(0) from the per-day (d1, d, n0, n1) collapse must equal the
    brute Breslow partial-likelihood score Σ_events (x_i − n1/n) —
    all subjects are events here (no censoring in the property)."""
    vals = "), (".join(f"{t}, {int(x)}" for t, x in subjects)
    got = _duck(f"""
    WITH base(t, x) AS (VALUES ({vals})),
    percell AS (SELECT t, x, count(*)::BIGINT de, count(*)::BIGINT rr
                FROM base GROUP BY t, x),
    grid AS (SELECT g.t, xx.x
             FROM (SELECT DISTINCT t FROM base) g
             CROSS JOIN (SELECT 0 AS x UNION ALL SELECT 1) xx),
    filled AS (
      SELECT g.t, g.x, coalesce(p.de, 0) AS de,
        sum(coalesce(p.rr, 0)) OVER (PARTITION BY g.x ORDER BY g.t DESC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nr
      FROM grid g LEFT JOIN percell p ON p.t = g.t AND p.x = g.x),
    days AS (
      SELECT t,
        sum(CASE WHEN x = 1 THEN de END)::BIGINT d1,
        sum(CASE WHEN x = 0 THEN de END)::BIGINT d0,
        sum(CASE WHEN x = 1 THEN nr END)::BIGINT n1,
        sum(CASE WHEN x = 0 THEN nr END)::BIGINT n0
      FROM filled GROUP BY t)
    SELECT coalesce(sum(d1 * 1000000
      - ((d0 + d1)::HUGEINT * n1 * 1000000 * 1000000)
        // (n0::HUGEINT * 1000000 + n1 * 1000000)), 0)
    FROM days WHERE d0 + d1 > 0 AND n0 > 0 AND n1 > 0
    """)[0][0]
    # brute: per event i at time t_i, x_i − (n1(t_i)/n(t_i)); Breslow
    # ties evaluate the SAME risk set for co-timed events.  Days where
    # a risk group is empty are excluded on both sides (the catalog
    # query's documented guard).
    times = sorted({t for t, _ in subjects})
    brute = 0.0
    for t in times:
        at_risk = [(tt, xx) for tt, xx in subjects if tt >= t]
        n1 = sum(1 for _, xx in at_risk if xx)
        n0 = len(at_risk) - n1
        if n0 == 0 or n1 == 0:
            continue
        for tt, xx in subjects:
            if tt == t:
                brute += (1 if xx else 0) - n1 / len(at_risk)
    assert abs(got / 1e6 - brute) <= 5e-5 * max(
        1.0, abs(brute)
    ) + len(subjects) * 1e-6  # per-term floored ppm slack
