"""Independent brute checks for the round-9 tier-8 extras."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def day():
    con = duckdb.connect()
    return con.execute(
        f"""
        SELECT datediff('day', (SELECT min(o_orderdate)
               FROM '{SF}/orders.parquet'), o_orderdate) AS t,
          count(*) AS x,
          CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
            // 100000 AS y
        FROM '{SF}/orders.parquet' GROUP BY 1 ORDER BY 1
        """
    ).fetchall()


def _one(spark, name):
    rows = entry.queries()[name](spark, SF).collect()
    assert len(rows) == 1
    return rows[0]


def _xi_brute(pairs):
    """(x, tiebreak, y) triples → Chatterjee ξ (ties version)."""
    seq = [y for _, _, y in sorted(pairs, key=lambda p: (p[0], p[1]))]
    n = len(seq)
    sy = sorted(seq)
    import bisect

    r = [bisect.bisect_right(sy, v) for v in seq]
    l = [n - bisect.bisect_left(sy, v) for v in seq]
    num = n * sum(abs(b - a) for a, b in zip(r, r[1:]))
    den = 2 * sum(li * (n - li) for li in l)
    return 1_000_000 - num * 1_000_000 // den


def test_chatterjee_brute(spark, day):
    rows = entry.queries()["chatterjee_xi"](spark, SF).collect()
    byd = {r.direction: r for r in rows}
    assert set(byd) == {"y_on_x", "x_on_y"}
    y_on_x = _xi_brute([(x, t, y) for t, x, y in day])
    x_on_y = _xi_brute([(y, t, x) for t, x, y in day])
    assert byd["y_on_x"].xi_ppm == y_on_x
    assert byd["x_on_y"].xi_ppm == x_on_y
    # revenue is largely a function of order count; not vice versa as
    # strongly — and both live in the valid range
    for r in rows:
        assert -1_000_000 <= r.xi_ppm <= 1_000_000


def test_lepage_components_brute(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT c.c_mktsegment,
          CAST(round(o.o_totalprice * 100) AS BIGINT) // 1000
        FROM '{SF}/orders.parquet' o
        JOIN '{SF}/customer.parquet' c ON c.c_custkey = o.o_custkey
        WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
        """
    ).fetchall()
    g1 = [v for s, v in rows if s == "BUILDING"]
    g2 = [v for s, v in rows if s == "MACHINERY"]
    n1, n2 = len(g1), len(g2)
    nn = n1 + n2
    from collections import Counter

    c1, c2 = Counter(g1), Counter(g2)
    lt1 = lt2 = 0
    w1 = tw = sw2 = a1 = ta = sa2 = 0
    for v in sorted(set(g1) | set(g2)):
        r2 = 2 * (lt1 + lt2) + c1[v] + c2[v] + 1
        a2 = min(r2, 2 * (nn + 1) - r2)
        w1 += c1[v] * r2
        tw += (c1[v] + c2[v]) * r2
        sw2 += (c1[v] + c2[v]) * r2 * r2
        a1 += c1[v] * a2
        ta += (c1[v] + c2[v]) * a2
        sa2 += (c1[v] + c2[v]) * a2 * a2
        lt1 += c1[v]
        lt2 += c2[v]
    zw2 = (
        ((nn * w1 - n1 * tw) ** 2 // (n1 * n2))
        * (nn - 1)
        * 1_000_000
        // (nn * sw2 - tw * tw)
    )
    za2 = (
        ((nn * a1 - n1 * ta) ** 2 // (n1 * n2))
        * (nn - 1)
        * 1_000_000
        // (nn * sa2 - ta * ta)
    )
    r = _one(spark, "lepage_test")
    assert (r.n1, r.n2) == (n1, n2)
    assert r.wilcoxon_z2_ppm == zw2
    assert r.ansari_z2_ppm == za2
    assert r.lepage_l_ppm == zw2 + za2


def test_quade_consistent_with_friedman_frame(spark):
    r = _one(spark, "quade_test")
    assert r.n_blocks > 50
    assert r.quade_f_ppm >= 0


def test_gumbel_identities(spark, day):
    r = _one(spark, "gumbel_block_maxima")
    # MoM identities recomputed in float with slack for the floors
    from collections import defaultdict

    blocks = defaultdict(int)
    for t, _, y in day:
        blocks[t // 30] = max(blocks[t // 30], y)
    vals = list(blocks.values())
    n = len(vals)
    mean = sum(vals) / n
    # sample variance (round-11 fix: this test used to divide by an
    # extra n, mirroring the engine's own defect — stat_audit caught
    # both; see PERF.md round-11 audit sweep)
    var = (n * sum(v * v for v in vals) - sum(vals) ** 2) / (
        n * (n - 1)
    )
    scale = math.sqrt(6 * var) / math.pi
    loc = mean - 0.5772156649015329 * scale
    assert r.n_blocks == n
    assert abs(r.scale_e6 - scale * 1e6) <= 2
    assert abs(r.loc_e6 - loc * 1e6) <= 3
    assert (
        abs(
            r.return_level_100_e6
            - (r.loc_e6 + math.floor(4.600149226776579 * r.scale_e6))
        )
        <= 1
    )
    # a 100-block return level extrapolates beyond ~84 observed blocks
    assert r.return_level_100_e6 > r.loc_e6


def test_pot_identities(spark, day):
    r = _one(spark, "pot_mean_excess")
    ys = sorted(y for _, _, y in day)
    n = len(ys)
    # rank-defined P90: first distinct value whose cum count reaches .9n
    from collections import Counter

    cnt = Counter(ys)
    cum = 0
    u = None
    for v in sorted(cnt):
        cum += cnt[v]
        if cum * 10 >= 9 * n:
            u = v
            break
    exc = [y - u for y in ys if y > u]
    k = len(exc)
    assert r.threshold == u
    assert r.n_exceedances == k
    assert r.mean_excess_e6 == sum(exc) * 1_000_000 // k
    # GPD MoM identities (float, slack for staged floors)
    m = sum(exc) / k
    v = (k * sum(e * e for e in exc) - sum(exc) ** 2) / (k * (k - 1))
    xi = 0.5 * (1 - m * m / v)
    assert abs(r.xi_ppm - xi * 1e6) <= 1500
