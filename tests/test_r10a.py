"""Independent brute-force checks for the round-10 tier-1 (robust
statistics) queries.

Same discipline as tests/test_r9a.py: the DuckDB oracles share formula
TEXT with the Spark queries, so the gate can't catch a formula-level
mistake — these tests recompute each statistic from raw sf0.001 rows
in plain Python (independent code path, same math definition).
"""

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


@pytest.fixture(scope="module")
def days(con):
    """The r8d daily-revenue frame: t = days since first order,
    y = sum(cents) // 100000 per day."""
    rows = con.execute(
        """
        SELECT datediff('day', (SELECT min(o_orderdate) FROM orders),
                        o_orderdate) AS t,
          sum(CAST(round(o_totalprice * 100) AS BIGINT)) // 100000 AS y
        FROM orders GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    return [(int(t), int(y)) for t, y in rows]


def _idiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _lowmed(vals):
    s = sorted(vals)
    return s[(len(s) + 1) // 2 - 1]


def _himed(vals):
    s = sorted(vals)
    return s[len(s) // 2]  # (m div 2 + 1)-th, 1-indexed


def _one(spark, name):
    rows = entry.queries()[name](spark, SF).collect()
    assert len(rows) == 1
    return rows[0]


def test_qn_brute(spark, days):
    ys = [y for _, y in days]
    n = len(ys)
    diffs = sorted(
        abs(ys[i] - ys[j])
        for i in range(n)
        for j in range(i + 1, n)
    )
    h = n // 2 + 1
    k = h * (h - 1) // 2
    raw = diffs[k - 1]
    r = _one(spark, "qn_scale_estimator")
    assert (r.n_days, r.k_order) == (n, k)
    assert r.qn_raw == raw
    assert r.qn_scaled == _idiv(2_219_140 * raw, 1_000_000)


def test_sn_brute(spark, days):
    ys = [y for _, y in days]
    n = len(ys)
    hms = [
        _himed([abs(ys[i] - ys[j]) for j in range(n) if j != i])
        for i in range(n)
    ]
    raw = _lowmed(hms)
    r = _one(spark, "sn_scale_estimator")
    assert (r.n_days, r.sn_raw) == (n, raw)
    assert r.sn_scaled == _idiv(1_192_600 * raw, 1_000_000)


def test_bwmv_brute(spark, days):
    ys = [y for _, y in days]
    n = len(ys)
    m = _lowmed(ys)
    mad = _lowmed([abs(y - m) for y in ys])
    num = den = 0
    for y in ys:
        a = y - m
        u2 = _idiv(a * a * 1_000_000, 81 * mad * mad)
        if u2 < 1_000_000:
            w = 1_000_000 - u2
            num += a * a * w**4
            den += w * (1_000_000 - 5 * u2)
    bwmv = _idiv(n * num, den * den)
    sy = sum(ys)
    syy = sum(y * y for y in ys)
    svar = _idiv(syy * n - sy * sy, n * (n - 1))
    r = _one(spark, "biweight_midvariance")
    assert (r.n_days, r.bwmv, r.sample_var) == (n, bwmv, svar)
    # the robust read should be in the sample variance's ballpark on
    # this (mostly clean) series, and strictly below it
    assert 0 < bwmv < svar


def test_trimean_brute(spark, days):
    ys = sorted(y for _, y in days)
    n = len(ys)
    mpos = (n + 1) // 2
    hpos = (mpos + 1) // 2
    q1, q2, q3 = ys[hpos - 1], ys[mpos - 1], ys[n - hpos]
    r = _one(spark, "trimean_bowley_skew")
    assert (r.q1, r.q2, r.q3) == (q1, q2, q3)
    assert r.trimean_e2 == _idiv((q1 + 2 * q2 + q3) * 100, 4)
    assert r.bowley_skew_e6 == _idiv(
        (q3 + q1 - 2 * q2) * 1_000_000, q3 - q1
    )


def test_medcouple_brute(spark, days):
    ys = [y for _, y in days]
    m = _lowmed(ys)
    kern = [
        _idiv(((b - m) - (m - a)) * 1_000_000, b - a)
        for a in ys
        if a < m
        for b in ys
        if b > m
    ]
    r = _one(spark, "medcouple_skew_lite")
    assert r.n_kernel_pairs == len(kern)
    assert r.medcouple_e6 == _lowmed(kern)
    assert r.right_skewed == (_lowmed(kern) > 0)


def test_hampel_brute(spark, days):
    by_t = dict(days)
    got = {
        r.day_t: (r.y, r.med_y, r.mad_y, r.is_outlier)
        for r in entry.queries()["hampel_outlier_flags"](
            spark, SF
        ).collect()
    }
    assert len(got) == len(days)
    n_flagged = 0
    for t, y in days:
        nbr = [by_t[s] for s in range(t - 7, t + 8) if s in by_t]
        med = _lowmed(nbr)
        mad = _lowmed([abs(v - med) for v in nbr])
        flag = abs(y - med) * 10000 > 44_478 * mad
        n_flagged += flag
        assert got[t] == (y, med, mad, flag), f"day {t}"
    # sanity: the identifier fires on SOME days but not most
    assert 0 < n_flagged < len(days) // 4


def test_siegel_brute(spark, days):
    n = len(days)
    med_i = []
    for i, (ti, yi) in enumerate(days):
        slopes = [
            _idiv((yj - yi) * 1_000_000, tj - ti)
            for j, (tj, yj) in enumerate(days)
            if j != i
        ]
        med_i.append(_lowmed(slopes))
    slope = _lowmed(med_i)
    intercept = _idiv(
        _lowmed([y * 1_000_000 - slope * t for t, y in days]), 1_000_000
    )
    r = _one(spark, "repeated_median_slope")
    assert (r.n_days, r.slope_e6, r.intercept) == (n, slope, intercept)


def test_day_kernel_chunked_path(spark, days, monkeypatch):
    """r11: the Sn / repeated-median Arrow kernels stream row CHUNKS
    through one reused buffer (memory-bounded by ``_KERNEL_CHUNK``).
    At sf0.001 (~90 days) the whole frame fits one chunk, so force a
    tiny chunk size and re-assert the brute values — exercises the
    multi-chunk boundary logic (partial last chunk, per-chunk diagonal
    offsets) that full-scale runs hit at n > 512 days.  Kernels are
    nested functions, so cloudpickle captures the patched global."""
    from beacon_data_importer_spark import catalog_r10a

    n = len(days)
    monkeypatch.setattr(catalog_r10a, "_KERNEL_CHUNK", 3 * n + 1)

    ys = [y for _, y in days]
    hms = [
        _himed([abs(ys[i] - ys[j]) for j in range(n) if j != i])
        for i in range(n)
    ]
    r = _one(spark, "sn_scale_estimator")
    assert (r.n_days, r.sn_raw) == (n, _lowmed(hms))

    med_i = []
    for i, (ti, yi) in enumerate(days):
        med_i.append(
            _lowmed(
                [
                    _idiv((yj - yi) * 1_000_000, tj - ti)
                    for j, (tj, yj) in enumerate(days)
                    if j != i
                ]
            )
        )
    slope = _lowmed(med_i)
    r = _one(spark, "repeated_median_slope")
    assert (r.slope_e6, r.n_days) == (slope, n)


def test_yuen_brute(spark, con):
    rows = con.execute(
        """
        SELECT c.c_mktsegment,
          CAST(round(o.o_totalprice * 100) AS BIGINT) // 1000 AS v
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
        """
    ).fetchall()
    g1 = sorted(v for s, v in rows if s == "BUILDING")
    g2 = sorted(v for s, v in rows if s == "MACHINERY")

    def stats(vals):
        n = len(vals)
        g = n // 5
        h = n - 2 * g
        lo, hi = vals[g], vals[n - g - 1]
        ts = sum(vals[g : n - g])
        ws = ts + g * (lo + hi)
        wss = sum(v * v for v in vals[g : n - g]) + g * (
            lo * lo + hi * hi
        )
        d = (wss - (ws * ws) / n) / (float(h) * (h - 1))
        return n, g, h, ts, d

    n1, g1_, h1, ts1, d1 = stats(g1)
    n2, g2_, h2, ts2, d2 = stats(g2)
    t = (ts1 / h1 - ts2 / h2) / math.sqrt(d1 + d2)
    t_e6 = math.floor(t * 1e6)
    r = _one(spark, "yuen_trimmed_t")
    assert (r.n1, r.n2, r.h1, r.h2) == (n1, n2, h1, h2)
    assert r.trim_mean1_e6 == _idiv(ts1 * 1_000_000, h1)
    assert r.trim_mean2_e6 == _idiv(ts2 * 1_000_000, h2)
    assert r.t_e6 == t_e6
    assert r.reject_equal_trimmed_means == (abs(t_e6) > 1_959_963)
