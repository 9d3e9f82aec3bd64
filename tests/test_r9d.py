"""Independent brute checks for the round-9 tier-4 devices."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("orders", "customer"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'"
        )
    return c


def test_gini_brute(spark, con):
    vals = [
        v
        for (v,) in con.execute(
            """
            SELECT CAST(coalesce(sum(CAST(round(o.o_totalprice*100)
                                          AS BIGINT)), 0) AS BIGINT)
                   // 100000
            FROM customer c
            LEFT JOIN orders o ON o.o_custkey = c.c_custkey
            GROUP BY c.c_custkey
            """
        ).fetchall()
    ]
    n, s = len(vals), sum(vals)
    vals.sort()
    # Gini via the sorted-rank identity on the SAME bucketed values
    md_num = sum(
        (2 * (i + 1) - n - 1) * v for i, v in enumerate(vals)
    )  # == sum_{a<b}(v_b - v_a) pair mass
    gini_ppm = md_num * 1_000_000 // (n * s)
    rows = entry.queries()["gini_lorenz_audit"](spark, SF).collect()
    assert len(rows) == 10
    assert rows[0].gini_ppm == gini_ppm
    # Lorenz is monotone and ends at 100%
    byd = sorted(rows, key=lambda r: r.decile)
    shares = [r.rev_share_ppm for r in byd]
    assert shares == sorted(shares)
    assert byd[-1].rev_share_ppm == 1_000_000
    assert all(r.rev_share_ppm <= r.pop_share_ppm for r in byd)


def test_ddsketch_within_error_bound(spark, con):
    rows = entry.queries()["ddsketch_quantile_audit"](
        spark, SF
    ).collect()
    assert {r.quantile_pct for r in rows} == {50, 90, 99}
    for r in rows:
        # estimate is a bucket LOWER bound containing the exact value:
        # est <= exact < est * (1 + 1/8) + rounding slack
        assert r.est_c <= r.exact_c
        assert r.rel_err_ppm <= 125_000 + 1000
        # cross-check exact quantile against brute
    vals = sorted(
        v
        for (v,) in con.execute(
            "SELECT CAST(round(o_totalprice*100) AS BIGINT) FROM orders"
        ).fetchall()
    )
    n = len(vals)
    for r in rows:
        rank = -(-r.quantile_pct * n // 100)  # ceil
        assert r.exact_c == vals[rank - 1]


def test_zero_inflation_brute(spark, con):
    n, tot, z = con.execute(
        """
        SELECT count(*), coalesce(sum(k), 0), sum(CASE WHEN k = 0
               THEN 1 ELSE 0 END)
        FROM (SELECT c.c_custkey, count(o.o_orderkey) AS k
              FROM customer c
              LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                AND year(o.o_orderdate) = 1997
              GROUP BY c.c_custkey)
        """
    ).fetchone()
    r = entry.queries()["poisson_zero_inflation_audit"](
        spark, SF
    ).collect()[0]
    assert (r.n_customers, r.n_zero) == (n, z)
    assert r.lambda_e6 == tot * 1_000_000 // n
    assert r.ln_p0_obs_e6 == math.floor(1e6 * math.log(z / n))
    assert r.zi_score_e6 == r.ln_p0_obs_e6 + r.lambda_e6
