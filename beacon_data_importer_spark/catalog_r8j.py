"""Round-8 catalog, tier 10 (post-slot extras, round-9 promotion
candidates) —

* ``seasonal_periodogram_audit`` — which cycle dominates daily
  revenue?  Goertzel-style single-frequency power at the four
  business periods (7/30/91/365 days) computed as EXACT integer dot
  products of the deviation series against PRECOMPUTED ppm
  cosine/sine tables (the literals are generated once in Python and
  embedded in BOTH dialects, so no trig function ever executes inside
  an engine).  ``hourly_seasonality``/``stl_decomposition_lite``
  assume their period; this measures which period earns it.
* ``median_ci_order_stat`` — distribution-free confidence interval
  for the median of order values by order statistics: ranks
  l,u = (n ∓ 1.96√n)/2 (the classical binomial normal approximation;
  √n on an exact integer radicand), then the three order statistics
  read off the $10-bucket cumulative histogram — no sort of the data,
  no bootstrap, no RNG.  ``bootstrap_ci_revenue`` resamples for the
  MEAN; this is the exact-rank route for the MEDIAN.

Reference parity: beyond-reference statistics tier.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession

from .catalog import query
from .catalog_r8d import _day_sql
from .sources.parquet import read_table


# ONE shared _views (r12 round): documents/embeddings route through the
# split-gated parallel scan — repartition only when the source has fewer
# scan splits than cores (sources/parquet.py register_views), so no
# Exchange is inserted at warehouse scale.
from .sources.parquet import register_views as _views  # noqa: E402


# ---------------------------------------------------------------------------
# seasonal_periodogram_audit
# ---------------------------------------------------------------------------

_PERIODS = (7, 30, 91, 365)


def _trig_rows() -> str:
    """(period, residue, cos_ppm, sin_ppm) literal rows — identical
    strings in both dialects."""
    rows = []
    for p in _PERIODS:
        for r in range(p):
            c = math.floor(1e6 * math.cos(2 * math.pi * r / p))
            s = math.floor(1e6 * math.sin(2 * math.pi * r / p))
            rows.append(f"({p}, {r}, {c}, {s})")
    return ", ".join(rows)


def _pgram_sql(dialect: str) -> str:
    spark = dialect == "spark"
    big = "DECIMAL(38,0)" if spark else "HUGEINT"
    div = " div " if spark else " // "
    vals = _trig_rows()
    trig = (
        f"SELECT p, r, c, s FROM VALUES {vals} AS t(p, r, c, s)"
        if spark
        else f"SELECT p, r, c, s FROM (VALUES {vals}) AS t(p, r, c, s)"
    )
    hint = "/*+ BROADCAST(tg) */ " if spark else ""
    return f"""
    WITH {_day_sql(dialect)},
    st AS (
      SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS s
      FROM day
    ),
    dev AS (
      SELECT day.t, CAST(st.n * day.y - st.s AS BIGINT) AS d
      FROM day CROSS JOIN st
    ),
    spine AS (SELECT DISTINCT p FROM ({trig}) x),
    devp AS (
      SELECT {"/*+ BROADCAST(sp) */ " if spark else ""}dev.d, sp.p,
        dev.t % sp.p AS r
      FROM dev CROSS JOIN spine sp
    ),
    comps AS (
      SELECT {hint}devp.p AS period,
        CAST(sum(CAST(devp.d AS {big}) * tg.c) AS {big}) AS cc,
        CAST(sum(CAST(devp.d AS {big}) * tg.s) AS {big}) AS ss
      FROM devp JOIN ({trig}) tg
        ON tg.p = devp.p AND tg.r = devp.r
      GROUP BY devp.p
    ),
    pw AS (
      SELECT period,
        CAST((cc{div}1000000) * (cc{div}1000000)
             + (ss{div}1000000) * (ss{div}1000000) AS {big}) AS power
      FROM comps
    ),
    mx AS (SELECT max(power) AS mp FROM pw)
    SELECT pw.period, CAST(pw.power AS BIGINT) AS power,
      CAST((pw.power * 1000000){div}mx.mp AS BIGINT) AS rel_power_ppm,
      pw.power = mx.mp AS dominant
    FROM pw CROSS JOIN mx
    """


@query(
    "seasonal_periodogram_audit",
    registered=False,  # driver-proven green in CORRECTNESS_r09; slot rotated (see catalog.py docstring)
    oracle=_pgram_sql("duck"),
)
def q_seasonal_periodogram_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Single-frequency spectral power of daily revenue at the four
    business periods: per period p, C = Σ dev_t·cos_ppm(t mod p) and
    S = Σ dev_t·sin_ppm(t mod p) with the trig values baked in as
    shared ppm literals (493 rows, broadcast), power = (C/1e6)² +
    (S/1e6)² — every arithmetic step integer, every floor placed
    identically.  Output: absolute and max-relative power per period
    plus the dominant flag.

    Scale: one equi-join of the calendar-bounded deviation frame
    against a broadcast 493-row trig table, one 4-group aggregation —
    the orders scan is the only thing that grows."""
    _views(spark, sf_dir, "orders")
    return spark.sql(_pgram_sql("spark"))


# ---------------------------------------------------------------------------
# median_ci_order_stat
# ---------------------------------------------------------------------------

_MCI_BUCKET_C = 1000  # $10 units
#: 1.959964·1e6 — the two-sided 95% normal quantile, ppm
_Z_E6 = 1_959_964


def _mci_sql(dialect: str) -> str:
    spark = dialect == "spark"
    div = " div " if spark else " // "
    return f"""
    WITH o AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT){div}{_MCI_BUCKET_C}
        AS v
      FROM orders
    ),
    dist AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM o GROUP BY v),
    cum AS (
      SELECT v, c,
        sum(c) OVER (ORDER BY v
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cm
      FROM dist
    ),
    st AS (
      SELECT CAST(sum(c) AS BIGINT) AS n,
        CAST(floor(sqrt(CAST(sum(c) AS DOUBLE)) * {_Z_E6} / 1000000)
             AS BIGINT) AS halfw
      FROM dist
    ),
    ranks AS (
      SELECT n,
        (n - halfw){div}2 AS l_rank,
        n + 1 - (n - halfw){div}2 AS u_rank,
        (n + 1){div}2 AS m_rank
      FROM st
    )
    SELECT r.n AS n_orders, r.l_rank, r.u_rank,
      (SELECT min(v) FROM cum WHERE cm >= r.m_rank) * {_MCI_BUCKET_C}
        AS median_c,
      (SELECT min(v) FROM cum WHERE cm >= r.l_rank) * {_MCI_BUCKET_C}
        AS ci_lo_c,
      (SELECT min(v) FROM cum WHERE cm >= r.u_rank) * {_MCI_BUCKET_C}
        AS ci_hi_c
    FROM ranks r
    """


@query(
    "median_ci_order_stat",
    registered=False,  # driver-proven green in CORRECTNESS_r09; slot rotated (see catalog.py docstring)
    oracle=_mci_sql("duck"),
)
def q_median_ci_order_stat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-free 95% CI for the median order value: the
    classical order-statistic ranks l = (n − z√n)/2 and
    u = n + 1 − l (binomial normal approximation; √n is the only
    non-integer step and its radicand is exact), then X₍ₗ₎, X₍ₘ₎,
    X₍ᵤ₎ read from the cumulative $10-bucket histogram with three
    bounded scalar lookups — no data sort, no resampling.
    ``bootstrap_ci_revenue`` covers the mean by resampling;
    ``exact_quantiles`` gives points without intervals; this gives
    the median WITH its exact-rank interval.

    Scale: the histogram/cumsum runs over the price-bounded
    distinct-bucket frame (BOUNDED_FRAME_AUDITED class); everything
    else is 1-row arithmetic."""
    _views(spark, sf_dir, "orders")
    return spark.sql(_mci_sql("spark"))
