"""Independent brute-force checks for the round-10 tier-8 (inequality,
concentration, cardinality-sketch) queries.

Same discipline as tests/test_r10a.py: the DuckDB oracles share formula
TEXT with the Spark queries, so the gate can't catch a formula-level
mistake — these tests recompute each statistic from raw sf0.001 rows
in plain Python (independent code path, same math definition).
"""

from __future__ import annotations

import hashlib
import math

import duckdb
import pytest

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("orders", "customer", "lineitem", "nation", "documents"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'"
        )
    return c


@pytest.fixture(scope="module")
def cust_v(con):
    """Per-customer revenue in $1000 units (cents // 100000), zero
    for customers with no orders — the gini_lorenz_audit frame."""
    rows = con.execute(
        """
        SELECT c.c_custkey,
          coalesce(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)), 0)
            // 100000 AS v
        FROM customer c
        LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey
        """
    ).fetchall()
    return sorted(int(v) for _, v in rows)


def _idiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _one(spark, name):
    rows = entry.queries()[name](spark, SF).collect()
    assert len(rows) == 1
    return rows[0]


def test_hoover_brute(spark, cust_v):
    n, s = len(cust_v), sum(cust_v)
    sumdev = sum(abs(n * v - s) for v in cust_v)
    row = _one(spark, "hoover_index")
    assert (row.n_customers, row.total_rev_k) == (n, s)
    assert row.hoover_e6 == _idiv(sumdev * 1_000_000, 2 * n * s)
    assert 0 < row.hoover_e6 < 1_000_000


def test_gmd_brute(spark, cust_v):
    n, s = len(cust_v), sum(cust_v)
    # O(n log n) pair mass over the sorted values: element i exceeds
    # exactly i earlier elements
    pm = 0
    prefix = 0
    for i, v in enumerate(cust_v):
        pm += i * v - prefix
        prefix += v
    row = _one(spark, "gini_mean_difference")
    assert row.n_customers == n
    assert row.gmd_e6 == _idiv(2 * pm * 1_000_000, n * (n - 1))
    assert row.gini_ppm == _idiv(pm * 1_000_000, n * s)
    assert row.gmd_over_2mu_e6 == _idiv(pm * 1_000_000, (n - 1) * s)
    # sample-vs-population identity: gmd/(2mu) = gini * n/(n-1)
    assert row.gmd_over_2mu_e6 >= row.gini_ppm


def test_atkinson_brute(spark, cust_v):
    from collections import Counter

    buckets = Counter(v for v in cust_v if v > 0)
    np = sum(buckets.values())
    sp = sum(c * v for v, c in buckets.items())
    slog = sum(
        c * math.floor(1_000_000 * math.log(v))
        for v, c in buckets.items()
    )
    geo = math.exp(slog / np / 1_000_000)
    row = _one(spark, "atkinson_index")
    assert row.n_positive == np
    assert row.geomean_e6 == math.floor(1_000_000 * geo)
    assert row.atkinson_e6 == math.floor(
        1_000_000 * (1.0 - geo * np / sp)
    )
    assert 0 < row.atkinson_e6 < 1_000_000


def test_theil_brute(spark, con):
    rows = con.execute(
        """
        SELECT n.n_name,
          coalesce(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)), 0)
            // 100000 AS v
        FROM customer c
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey, n.n_name
        """
    ).fetchall()
    from collections import Counter, defaultdict

    cells = Counter((nat, int(v)) for nat, v in rows)
    n = sum(cells.values())
    s = sum(c * v for (_, v), c in cells.items())
    sxlog = sum(
        c * v * math.floor(1_000_000 * math.log(v))
        for (_, v), c in cells.items()
        if v > 0
    )
    t_total = math.floor(sxlog / s - 1_000_000 * math.log(s / n))
    bynat = defaultdict(lambda: [0, 0])
    for (nat, v), c in cells.items():
        bynat[nat][0] += c
        bynat[nat][1] += c * v
    t_between = sum(
        math.floor(
            1_000_000 * (sg / s) * math.log((sg / ng) / (s / n))
        )
        for ng, sg in bynat.values()
        if sg > 0
    )
    row = _one(spark, "theil_t_decomposition")
    assert (row.n_customers, row.t_total_e6) == (n, t_total)
    assert row.t_between_e6 == t_between
    assert row.t_within_e6 == t_total - t_between
    # within-nation inequality dominates a segment-blind order stream
    assert row.t_within_e6 > row.t_between_e6 >= 0


def test_palma_brute(spark, cust_v):
    n, s = len(cust_v), sum(cust_v)
    k40, k90 = 4 * n // 10, 9 * n // 10
    bottom40 = sum(cust_v[:k40])
    top10 = sum(cust_v[k90:])
    row = _one(spark, "palma_ratio")
    assert row.n_customers == n
    assert row.bottom40_share_e6 == _idiv(bottom40 * 1_000_000, s)
    assert row.top10_share_e6 == _idiv(top10 * 1_000_000, s)
    assert row.palma_e6 == _idiv(top10 * 1_000_000, bottom40)
    # shares are proper fractions and the ratio is well-defined (the
    # TPC-H-ish revenue stream is near-uniform, so Palma sits near —
    # and at small SF below — 1; no directional claim here)
    assert 0 < row.bottom40_share_e6 < 1_000_000
    assert 0 < row.top10_share_e6 < 1_000_000
    assert row.palma_e6 > 0


def test_lac_brute(spark, cust_v):
    n, s = len(cust_v), sum(cust_v)
    cnt_b = sum(1 for v in cust_v if v * n < s)
    rev_b = sum(v for v in cust_v if v * n < s)
    row = _one(spark, "lorenz_asymmetry")
    assert row.n_customers == n
    assert row.f_mu_e6 == _idiv(cnt_b * 1_000_000, n)
    assert row.l_mu_e6 == _idiv(rev_b * 1_000_000, s)
    assert row.lac_e6 == row.f_mu_e6 + row.l_mu_e6
    assert row.large_value_driven == (row.lac_e6 > 1_000_000)


def test_hill_brute(spark, con):
    counts = [
        int(c)
        for (c,) in con.execute(
            "SELECT count(*) FROM documents GROUP BY source"
        ).fetchall()
    ]
    q0 = len(counts)
    n = sum(counts)
    sc2 = sum(c * c for c in counts)
    sclog = sum(
        c * math.floor(1_000_000 * math.log(c)) for c in counts
    )
    row = _one(spark, "hill_diversity_numbers")
    assert (row.hill_q0_richness, row.n_docs) == (q0, n)
    assert row.hill_q1_e6 == math.floor(
        1_000_000 * math.exp(math.log(n) - sclog / n / 1_000_000)
    )
    assert row.hill_q2_e6 == _idiv(n * n * 1_000_000, sc2)
    # ordering property: q0 >= q1 >= q2 (in effective-source units;
    # +1000 ppm slack for the per-group ln floors — a uniform source
    # mix puts q1 within rounding of q0)
    assert q0 * 1_000_000 + 1_000 >= row.hill_q1_e6 >= row.hill_q2_e6


def test_kmv_brute(spark, con):
    keys = {
        int(k)
        for (k,) in con.execute(
            "SELECT DISTINCT l_partkey FROM lineitem"
        ).fetchall()
    }
    hashes = sorted(
        int(hashlib.md5(str(k).encode()).hexdigest()[:15], 16)
        for k in keys
    )
    k = 128
    hk = hashes[k - 1]
    est = _idiv((k - 1) * (1 << 60), hk)
    row = _one(spark, "kmv_distinct_audit")
    assert (row.k_filled, row.kth_hash) == (k, hk)
    assert row.kmv_estimate == est
    assert row.exact_distinct == len(keys)
    assert row.rel_err_e6 == _idiv(
        (est - len(keys)) * 1_000_000, len(keys)
    )
    # the sketch should land within ~4 relative standard errors
    assert abs(row.rel_err_e6) < 360_000
