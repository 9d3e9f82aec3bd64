"""Independent brute-force checks for the round-10 tier-3
(categorical association) queries — plain-Python recomputation from
raw sf0.001 rows."""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from statistics import NormalDist

import duckdb
import pytest

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"

Z2_E6 = 3_841_458


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("orders", "customer", "nation", "region", "lineitem"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'"
        )
    return c


@pytest.fixture(scope="module")
def prio_pairs(con):
    rows = con.execute(
        """
        SELECT o_custkey, year(o_orderdate) AS yr, o_orderpriority,
          o_orderdate, o_orderkey
        FROM orders WHERE year(o_orderdate) IN (1997, 1998)
        ORDER BY o_custkey, o_orderdate, o_orderkey
        """
    ).fetchall()
    first = {}
    for ck, yr, pr, _, _ in rows:
        first.setdefault((ck, yr), pr)
    pairs = []
    for (ck, yr), pr in first.items():
        if yr == 1997 and (ck, 1998) in first:
            pairs.append((pr, first[(ck, 1998)]))
    return pairs


@pytest.fixture(scope="module")
def seg_cells(con):
    rows = con.execute(
        """
        SELECT r.r_name, c.c_mktsegment, count(*)
        FROM customer c
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        GROUP BY 1, 2
        """
    ).fetchall()
    return {(x, y): int(n) for x, y, n in rows}


def _idiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _one(spark, name):
    rows = entry.queries()[name](spark, SF).collect()
    assert len(rows) == 1
    return rows[0]


def test_bowker_brute(spark, prio_pairs):
    cells = Counter(prio_pairs)
    prios = sorted({p for pair in prio_pairs for p in pair})
    chi2 = 0
    df = 0
    for i, pi in enumerate(prios):
        for pj in prios[i + 1 :]:
            nij = cells.get((pi, pj), 0)
            nji = cells.get((pj, pi), 0)
            if nij + nji:
                df += 1
                chi2 += _idiv(
                    (nij - nji) ** 2 * 1_000_000, nij + nji
                )
    r = _one(spark, "bowker_symmetry_test")
    assert (r.df, r.chi2_e6) == (df, chi2)
    assert r.reject_symmetry == (chi2 > 18_307_038 and df == 10)


def test_stuart_maxwell_brute(spark, prio_pairs):
    def cls(p):
        return (
            1
            if p in ("1-URGENT", "2-HIGH")
            else 2
            if p == "3-MEDIUM"
            else 3
        )

    cells = Counter((cls(a), cls(b)) for a, b in prio_pairs)
    r_m = Counter()
    c_m = Counter()
    for (i, j), n in cells.items():
        r_m[i] += n
        c_m[j] += n
    d1, d2 = r_m[1] - c_m[1], r_m[2] - c_m[2]
    s11 = r_m[1] + c_m[1] - 2 * cells.get((1, 1), 0)
    s22 = r_m[2] + c_m[2] - 2 * cells.get((2, 2), 0)
    s12 = -(cells.get((1, 2), 0) + cells.get((2, 1), 0))
    chi2 = _idiv(
        (d1 * d1 * s22 - 2 * d1 * d2 * s12 + d2 * d2 * s11)
        * 1_000_000,
        s11 * s22 - s12 * s12,
    )
    r = _one(spark, "stuart_maxwell_test")
    assert (r.n_pairs, r.d1, r.d2) == (len(prio_pairs), d1, d2)
    assert r.chi2_e6 == chi2


def test_lambda_brute(spark, seg_cells):
    N = sum(seg_cells.values())
    by_x = defaultdict(dict)
    by_y = defaultdict(dict)
    for (x, y), n in seg_cells.items():
        by_x[x][y] = n
        by_y[y][x] = n
    sum_max_x = sum(max(d.values()) for d in by_x.values())
    sum_max_y = sum(max(d.values()) for d in by_y.values())
    marg_y = {y: sum(d.values()) for y, d in by_y.items()}
    marg_x = {x: sum(d.values()) for x, d in by_x.items()}
    lam_yx = _idiv(
        (sum_max_x - max(marg_y.values())) * 1_000_000,
        N - max(marg_y.values()),
    )
    lam_xy = _idiv(
        (sum_max_y - max(marg_x.values())) * 1_000_000,
        N - max(marg_x.values()),
    )
    r = _one(spark, "lambda_goodman_kruskal")
    assert (r.n_rows, r.lambda_y_given_x_e6, r.lambda_x_given_y_e6) == (
        N,
        lam_yx,
        lam_xy,
    )


def test_gk_tau_brute(spark, seg_cells):
    N = sum(seg_cells.values())
    by_x = defaultdict(dict)
    for (x, y), n in seg_cells.items():
        by_x[x][y] = n
    s_e6 = sum(
        _idiv(sum(n * n for n in d.values()) * 1_000_000, sum(d.values()))
        for d in by_x.values()
    )
    marg_y = Counter()
    for (x, y), n in seg_cells.items():
        marg_y[y] += n
    syy = sum(n * n for n in marg_y.values())
    tau = _idiv(s_e6 * N - 1_000_000 * syy, N * N - syy)
    r = _one(spark, "goodman_kruskal_tau")
    assert (r.n_rows, r.tau_y_given_x_e6) == (N, tau)


def test_theil_u_brute(spark, seg_cells):
    N = sum(seg_cells.values())
    marg_x = Counter()
    marg_y = Counter()
    for (x, y), n in seg_cells.items():
        marg_x[x] += n
        marg_y[y] += n
    mi = sum(
        math.floor(
            1e6
            * (n / N)
            * math.log2(n * N / (marg_x[x] * marg_y[y]))
        )
        for (x, y), n in seg_cells.items()
    )
    hy = sum(
        math.floor(1e6 * (ny / N) * math.log2(N / ny))
        for ny in marg_y.values()
    )
    r = _one(spark, "theil_uncertainty_coeff")
    assert (r.n_rows, r.mi_microbits, r.hy_microbits) == (N, mi, hy)
    assert r.u_y_given_x_e6 == _idiv(mi * 1_000_000, hy)


def test_yule_brute(spark, con):
    a, b, c, d = con.execute(
        """
        SELECT
          sum(CASE WHEN l_returnflag = 'R' AND l_quantity > 25
              THEN 1 ELSE 0 END),
          sum(CASE WHEN l_returnflag = 'R' AND l_quantity <= 25
              THEN 1 ELSE 0 END),
          sum(CASE WHEN l_returnflag <> 'R' AND l_quantity > 25
              THEN 1 ELSE 0 END),
          sum(CASE WHEN l_returnflag <> 'R' AND l_quantity <= 25
              THEN 1 ELSE 0 END)
        FROM lineitem
        """
    ).fetchone()
    a, b, c, d = int(a), int(b), int(c), int(d)
    q = _idiv((a * d - b * c) * 1_000_000, a * d + b * c)
    yy = math.floor(
        (math.sqrt(float(a) * d) - math.sqrt(float(b) * c))
        / (math.sqrt(float(a) * d) + math.sqrt(float(b) * c))
        * 1e6
    )
    orr = _idiv(a * d * 1_000_000, b * c)
    r = _one(spark, "yules_q_y")
    assert (r.a, r.b, r.c, r.d) == (a, b, c, d)
    assert (r.yule_q_e6, r.yule_y_e6, r.odds_ratio_e6) == (q, yy, orr)


def _wilson(n: int, a: int):
    p = _idiv(a * 1_000_000, n)
    center = _idiv(
        (a * 1_000_000 + Z2_E6 // 2) * 1_000_000,
        n * 1_000_000 + Z2_E6,
    )
    half = math.floor(
        math.sqrt(Z2_E6 / 1e6 * (float(a * (n - a)) / n + Z2_E6 / 4e6))
        * 1e12
        / (float(n) * 1e6 + Z2_E6)
    )
    return p, center - half, center + half


def test_newcombe_brute(spark, con):
    rows = con.execute(
        """
        SELECT c.c_mktsegment, count(*),
          sum(CASE WHEN o.o_orderpriority = '1-URGENT'
              THEN 1 ELSE 0 END)
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
        GROUP BY 1
        """
    ).fetchall()
    d = {s: (int(n), int(a)) for s, n, a in rows}
    p1, l1, u1 = _wilson(*d["BUILDING"])
    p2, l2, u2 = _wilson(*d["MACHINERY"])
    lo = (
        p1
        - p2
        - math.floor(
            math.sqrt(
                float(p1 - l1) * (p1 - l1) + float(u2 - p2) * (u2 - p2)
            )
        )
    )
    hi = (
        p1
        - p2
        + math.floor(
            math.sqrt(
                float(u1 - p1) * (u1 - p1) + float(p2 - l2) * (p2 - l2)
            )
        )
    )
    r = _one(spark, "newcombe_diff_ci")
    assert (r.p1_ppm, r.p2_ppm, r.diff_ppm) == (p1, p2, p1 - p2)
    assert (r.newcombe_lo_ppm, r.newcombe_hi_ppm) == (lo, hi)
    assert r.excludes_zero == (lo > 0 or hi < 0)


def test_by_thresholds_dominate_bh(spark):
    """BY's harmonic penalty must make every |z| threshold at least
    BH's for the same (m, i) — the structural relation between the
    two audits — and the replayed threshold table must match the
    module literals."""
    from beacon_data_importer_spark.catalog_r10c import _BY_TABLE
    from beacon_data_importer_spark.catalog_r5f import _BH_TABLE

    bh = {(m, i): t for m, i, t in _BH_TABLE}
    for m, i, t in _BY_TABLE:
        c_m = sum(1.0 / j for j in range(1, m + 1))
        expect = math.floor(
            NormalDist().inv_cdf(1.0 - i / (2.0 * m * 10 * c_m)) * 1e6
        )
        assert t == expect
        assert t >= bh[(m, i)]


def test_by_rejections_subset_of_bh(spark):
    """On the same arms, BY may reject at most what BH rejects."""
    by = {
        r.nationkey: r.rejected
        for r in entry.queries()["benjamini_yekutieli_audit"](
            spark, SF
        ).collect()
    }
    bh = {
        r.nationkey: r.rejected
        for r in entry.queries()["fdr_bh_audit"](spark, SF).collect()
    }
    assert set(by) == set(bh)
    for k in by:
        assert by[k] <= bh[k]
