"""Round-7 catalog tier (b): data-quality forensics, corpus health,
causal matching, calibration, and multi-objective ranking —

* ``benford_second_digit_audit`` — SECOND-significant-digit census of
  order totals vs Benford's law with per-digit chi-square terms: the
  escalation step after the first-digit screen
  (catalog_r4.benford_digit_audit) — fabricated data tuned to the
  first-digit law rarely matches the flatter second-digit one.
  Expected shares are Python-computed literals (the S-curve-literal
  doctrine); everything data-dependent is one integer aggregation.
* ``zipf_slope_audit`` — OLS slope of ln(freq) on ln(rank) over the
  corpus vocabulary: a natural-language corpus sits near −1; a flat
  slope exposes synthetic/templated text.  Per-term floored ln (the
  psi_drift device) + DECIMAL(38,0)/HUGEINT OLS.
* ``simpson_paradox_audit`` — sign of the discount↔price association
  pooled vs within each nation stratum; a stratum whose sign opposes
  the pooled sign is a Simpson flip, the canonical aggregation trap.
* ``isotonic_calibration`` — PAV isotonic fit of return rate on
  discount bins via the minimax identity fit(i) = max_{j≤i} min_{k≥i}
  rate(j..k): catalog_r5.score_calibration DIAGNOSES miscalibration
  (the reliability table); this FITS the monotone correction a
  scorer would apply — exact over floored interval rates (bin count fixed and
  tiny, so the O(B³) identity beats an iterative pool-merge in both
  engines and needs no recursion).
* ``propensity_caliper_match`` — nearest-neighbor caliper matching of
  urgent-priority orders to controls on the price score; the matching
  step behind every observational ATT estimate (complements
  ipw/did/rdd which weight instead of match).
* ``pareto_skyline`` — the skyline (Pareto frontier) of customers on
  (total spend, order count): dominated points eliminated without any
  global sort of the full table (bucket-partitioned prefix maxima +
  a broadcast per-bucket summary).  The DISTRIBUTED replacement for
  catalog_r3c.pareto_frontier's textbook one-sort algorithm — same
  dominance semantics, proven equal to the single-window form the
  oracle keeps.
* ``heavy_hitters_audit`` — Spark 4's ``approx_top_k`` (DataSketches
  frequent-items) vs the exact top-10 vocabulary, audited as boolean
  containment + count agreement; the top-k sketch complement of
  catalog_r5.cms_frequency_audit (count-min answers point-frequency
  lookups, frequent-items answers "which items are heavy") (the hll_distinct_audit device: the
  sketch is the 100 TB product, the exact pass is the audit-scale
  referee).

Reference parity: beyond-reference analytics tiers.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import query
from .sources.parquet import read_table

# ---------------------------------------------------------------------------
# benford_first_digit_audit
# ---------------------------------------------------------------------------

#: floor(1e6 · Σ_{k=1..9} log10(1 + 1/(10k + d))) for d = 0..9 — the
#: SECOND-digit Benford expectation, Python-computed literals so
#: neither engine's log10 enters the comparison surface.  (The
#: first-digit test lives in catalog_r4.benford_digit_audit; second
#: digit is the standard escalation — fabricators who learn to fake
#: the first digit rarely fake the flatter second-digit law, and a
#: column can pass one test while failing the other.)
_BENFORD_PPM = {
    d: math.floor(
        sum(math.log10(1.0 + 1.0 / (10 * k + d)) for k in range(1, 10))
        * 1e6
    )
    for d in range(0, 10)
}
_BENFORD_CASE = (
    "CASE digit "
    + " ".join(f"WHEN {d} THEN {p}" for d, p in _BENFORD_PPM.items())
    + " END"
)


def _benford_sql(dialect: str) -> str:
    """Shared text: cents → second significant digit via
    integer-to-string (identical in both engines; float formatting is
    not), then integer ppm shares and chi-square terms with identical
    truncation placement."""
    div = " div " if dialect == "spark" else " // "
    str_t = "STRING" if dialect == "spark" else "VARCHAR"
    return f"""
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                               AS {str_t}), 2, 1) AS INT) AS digit
      FROM orders
      WHERE CAST(round(o_totalprice * 100) AS BIGINT) >= 10
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
    per AS (
      SELECT digit, CAST(count(*) AS BIGINT) AS n_orders
      FROM d GROUP BY digit
    )
    SELECT p.digit, p.n_orders,
      CAST((p.n_orders * 1000000){div}t.n AS BIGINT) AS observed_ppm,
      CAST({_BENFORD_CASE} AS BIGINT) AS expected_ppm,
      CAST(((p.n_orders * 1000000){div}t.n - {_BENFORD_CASE})
           * ((p.n_orders * 1000000){div}t.n - {_BENFORD_CASE})
           {div} {_BENFORD_CASE} AS BIGINT) AS chi2_term_ppm
    FROM per p CROSS JOIN tot t
    """


@query(
    "benford_second_digit_audit",
    registered=False,  # driver-proven green in CORRECTNESS_r07; slot rotated (see catalog.py docstring)
    oracle=_benford_sql("duck"),
)
def q_benford_second_digit_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Second-digit Benford forensic over order totals: per second
    significant digit 0–9, the observed ppm share next to
    floor(1e6·Σₖ log10(1+1/(10k+d))) and the integer chi-square term
    ((obs−exp)²/exp in ppm) — large terms localize WHICH digit
    deviates.  Escalation partner of the FIRST-digit test
    (catalog_r4.benford_digit_audit, r04 driver-proven): fabricated
    amounts tuned to pass the first-digit law rarely match the much
    flatter second-digit distribution (11.97% for 0 down to 8.50% for
    9), and price-point columns (…99) fail here while passing there.
    The digit comes from the integer cents' decimal string, not
    floor(log10(x)), because int→string is bit-identical across
    engines while log10 at power-of-ten boundaries is not.

    One map-side-combinable aggregation over orders plus a 10-row
    broadcast of the total; at 100 TB it is a single scan."""
    read_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_benford_sql("spark"))


# ---------------------------------------------------------------------------
# zipf_slope_audit
# ---------------------------------------------------------------------------

_ZIPF_TOP = 200


def _zipf_sql(dialect: str) -> str:
    spark = dialect == "spark"
    div = " div " if spark else " // "
    big = "DECIMAL(38,0)" if spark else "HUGEINT"
    words = (
        "SELECT explode(split(text, ' ')) AS w FROM documents"
        if spark
        else "SELECT unnest(string_split(text, ' ')) AS w FROM documents"
    )
    return f"""
    WITH words AS ({words}),
    freq AS (
      SELECT w, CAST(count(*) AS BIGINT) AS c
      FROM words WHERE w <> '' GROUP BY w
    ),
    ranked AS (
      SELECT row_number() OVER (ORDER BY c DESC, w) AS r, c FROM freq
    ),
    pts AS (
      SELECT CAST(floor(ln(r) * 1e6) AS BIGINT) AS x,
             CAST(floor(ln(c) * 1e6) AS BIGINT) AS y
      FROM ranked WHERE r <= {_ZIPF_TOP}
    ),
    s AS (
      SELECT CAST(count(*) AS {big}) AS n,
             CAST(sum(x) AS {big}) AS sx, CAST(sum(y) AS {big}) AS sy,
             CAST(sum(x * y) AS {big}) AS sxy,
             CAST(sum(x * x) AS {big}) AS sxx
      FROM pts
    )
    SELECT CAST(n AS BIGINT) AS n_ranks,
      CAST(((n * sxy - sx * sy) * 1000000)
           {div} (n * sxx - sx * sx) AS BIGINT) AS slope_ppm
    FROM s
    """


@query(
    "zipf_slope_audit",
    registered=False,  # driver-proven green in CORRECTNESS_r07; slot rotated (see catalog.py docstring)
    oracle=_zipf_sql("duck"),
)
def q_zipf_slope_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-health gauge: OLS slope of ln(frequency) on ln(rank) over
    the top-{top} vocabulary.  Natural language obeys Zipf (slope ≈
    −1·1e6 ppm); a flat slope is the signature of templated or
    synthetic text — exactly what this testdata's uniform generator
    shows, which is the audit's point: the number is measured, not
    assumed.  ln is floored per term so both engines run the identical
    IEEE chain (psi_drift device); the OLS moments ride
    DECIMAL(38,0)/HUGEINT since n·Sxy exceeds 2^63.

    Vocabulary is the corpus-bounded set (the word-count aggregate is
    the only full-data pass, map-side combinable); the ranking window
    runs over vocabulary rows only."""
    read_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents"
    )
    return spark.sql(_zipf_sql("spark"))


q_zipf_slope_audit.__doc__ = (q_zipf_slope_audit.__doc__ or "").format(
    top=_ZIPF_TOP
)


# ---------------------------------------------------------------------------
# simpson_paradox_audit
# ---------------------------------------------------------------------------


def _simpson_sql(dialect: str) -> str:
    spark = dialect == "spark"
    big = "DECIMAL(38,0)" if spark else "HUGEINT"
    return f"""
    WITH li AS (
      SELECT c.c_nationkey AS nationkey,
        CAST(round(l.l_discount * 100) AS BIGINT) AS x,
        CAST(round(l.l_extendedprice * 100) AS BIGINT) AS y
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    strat AS (
      SELECT nationkey, CAST(count(*) AS {big}) AS n,
        CAST(sum(CAST(x AS {big})) AS {big}) AS sx,
        CAST(sum(CAST(y AS {big})) AS {big}) AS sy,
        CAST(sum(CAST(x * y AS {big})) AS {big}) AS sxy
      FROM li GROUP BY nationkey
    ),
    pool AS (
      SELECT CAST(count(*) AS {big}) AS n,
        CAST(sum(CAST(x AS {big})) AS {big}) AS sx,
        CAST(sum(CAST(y AS {big})) AS {big}) AS sy,
        CAST(sum(CAST(x * y AS {big})) AS {big}) AS sxy
      FROM li
    )
    SELECT s.nationkey,
      CAST(s.n AS BIGINT) AS n_items,
      CAST(CASE WHEN s.n * s.sxy - s.sx * s.sy > 0 THEN 1
                WHEN s.n * s.sxy - s.sx * s.sy < 0 THEN -1
                ELSE 0 END AS INT) AS stratum_sign,
      CAST(CASE WHEN p.n * p.sxy - p.sx * p.sy > 0 THEN 1
                WHEN p.n * p.sxy - p.sx * p.sy < 0 THEN -1
                ELSE 0 END AS INT) AS pooled_sign,
      (CASE WHEN s.n * s.sxy - s.sx * s.sy > 0 THEN 1
            WHEN s.n * s.sxy - s.sx * s.sy < 0 THEN -1
            ELSE 0 END)
      * (CASE WHEN p.n * p.sxy - p.sx * p.sy > 0 THEN 1
              WHEN p.n * p.sxy - p.sx * p.sy < 0 THEN -1
              ELSE 0 END) = -1 AS sign_flipped
    FROM strat s CROSS JOIN pool p
    """


@query(
    "simpson_paradox_audit",
    registered=False,  # driver-proven green in CORRECTNESS_r07; slot rotated (see catalog.py docstring)
    oracle=_simpson_sql("duck"),
)
def q_simpson_paradox_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson's-paradox census: the sign of the discount↔price
    covariance pooled over all lineitems vs within each customer
    nation.  A stratum whose sign opposes the pooled sign
    (sign_flipped) is an aggregation-reversal — the report-level
    correlation would mislead every per-nation decision.  Signs come
    from the integer covariance numerator n·Σxy − Σx·Σy in
    DECIMAL(38,0)/HUGEINT (it exceeds 2^63 at scale), so the
    comparison is exact, never a rounded r.

    Two shuffle equi-joins (lineitem→orders→customer, the standard
    TPC-H spine; AQE handles skew) feeding one map-side-combinable
    aggregation per stratum plus a 1-row pooled broadcast."""
    for t in ("lineitem", "orders", "customer"):
        read_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_simpson_sql("spark"))


# ---------------------------------------------------------------------------
# isotonic_calibration
# ---------------------------------------------------------------------------


def _isotonic_sql(dialect: str) -> str:
    div = " div " if dialect == "spark" else " // "
    return f"""
    WITH pts AS (
      SELECT CAST(round(l_discount * 100) AS BIGINT) AS bin,
             CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS yv
      FROM lineitem
    ),
    bins AS (
      SELECT bin, CAST(count(*) AS BIGINT) AS w, CAST(sum(yv) AS BIGINT) AS s
      FROM pts GROUP BY bin
    ),
    cum AS (
      SELECT bin, w, s,
        CAST(sum(w) OVER (ORDER BY bin) AS BIGINT) AS cw,
        CAST(sum(s) OVER (ORDER BY bin) AS BIGINT) AS cs
      FROM bins
    ),
    rates AS (
      SELECT j.bin AS jb, k.bin AS kb,
        ((k.cs - j.cs + j.s) * 1000000){div}(k.cw - j.cw + j.w) AS r
      FROM cum j JOIN cum k ON k.bin >= j.bin
    ),
    mins AS (
      SELECT i.bin AS ib, r.jb, min(r.r) AS mn
      FROM cum i JOIN rates r ON r.jb <= i.bin AND r.kb >= i.bin
      GROUP BY i.bin, r.jb
    )
    SELECT b.bin, b.w AS n_items,
      CAST((b.s * 1000000){div}b.w AS BIGINT) AS rate_ppm,
      CAST(max(m.mn) AS BIGINT) AS isotonic_ppm
    FROM bins b JOIN mins m ON m.ib = b.bin
    GROUP BY b.bin, b.w, b.s
    """


@query(
    "isotonic_calibration",
    registered=False,  # driver-proven green in CORRECTNESS_r07; slot rotated (see catalog.py docstring)
    oracle=_isotonic_sql("duck"),
)
def q_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (PAV) calibration of return rate on discount bins via
    the minimax identity fit(i) = max_{j≤i} min_{k≥i} rate(j..k) —
    the closed form of pool-adjacent-violators, so no iteration and no
    merge-order ambiguity; the fitted curve is non-decreasing by
    construction.  Interval rates are floored ppm integers, making the
    minimax exact and engine-portable (the fit is DEFINED over floored
    rates; with B=11 discount bins the worst flooring displacement is
    sub-ppm).

    The full-data pass is one aggregation to B=11 bin rows; the O(B³)
    identity then runs on an 11-row table (bounded broadcast joins —
    the 100 TB cost is the scan, not the fit)."""
    read_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "lineitem"
    )
    return spark.sql(_isotonic_sql("spark"))


# ---------------------------------------------------------------------------
# propensity_caliper_match
# ---------------------------------------------------------------------------

_CALIPER_C = 10_000  # match window: |price difference| ≤ $100, in cents


@query(
    "propensity_caliper_match",
    registered=False,  # driver-proven green in CORRECTNESS_r07; slot rotated (see catalog.py docstring)
    oracle=f"""
    WITH sc AS (
      SELECT o_orderkey AS k,
             CAST(round(o_totalprice * 100) AS BIGINT) AS s,
             (o_orderpriority = '1-URGENT') AS treated
      FROM orders
    ),
    t AS (SELECT k, s, s // {_CALIPER_C} AS b FROM sc WHERE treated),
    c AS (SELECT k, s, s // {_CALIPER_C} AS b FROM sc WHERE NOT treated),
    cand AS (
      SELECT t.k AS treated_key, c.k AS control_key, abs(t.s - c.s) AS d
      FROM t JOIN c ON c.b BETWEEN t.b - 1 AND t.b + 1
      WHERE abs(t.s - c.s) <= {_CALIPER_C}
    ),
    r AS (
      SELECT treated_key, control_key, d,
        row_number() OVER (PARTITION BY treated_key
                           ORDER BY d, control_key) AS rn
      FROM cand
    )
    SELECT treated_key, control_key, CAST(d AS BIGINT) AS score_diff_cents
    FROM r WHERE rn = 1
    """,
)
def q_propensity_caliper_match(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Caliper matching: each urgent-priority (treated) order matched
    to the control order with the nearest total-price score, admitted
    only within a ±$100 caliper — the matching estimator that
    complements the weighting-based causal tier (ipw/did/rdd).
    Tie-break (distance, then control key) makes the match
    deterministic.

    Scale shape: the treated side explodes to its 3 adjacent caliper
    buckets and equi-joins controls ON bucket — a shuffle hash join
    whose per-key fan-out the caliper itself bounds (candidates per
    treated = controls within ±$100), where the naive |s_t − s_c|
    range join would be a nested loop.  The oracle keeps the BETWEEN
    form; results are identical because bucket width = caliper, so
    every within-caliper pair shares adjacent buckets."""
    sc = read_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice") * 100)
        .cast("bigint")
        .alias("s"),
        (F.col("o_orderpriority") == "1-URGENT").alias("treated"),
    )
    # integer `div`, not double-divide-then-cast: a double quotient can
    # round across a bucket boundary once s nears 2^53, silently
    # diverging from the oracle's exact `//` (ADVICE r7)
    bucket = F.expr(f"s div {_CALIPER_C}")  # s ≥ 0: trunc = floor
    t = sc.filter("treated").select(
        F.col("k").alias("treated_key"),
        F.col("s").alias("ts"),
        F.explode(
            F.array(bucket - 1, bucket, bucket + 1)
        ).alias("b"),
    )
    c = sc.filter(~F.col("treated")).select(
        F.col("k").alias("control_key"),
        F.col("s").alias("cs"),
        bucket.alias("b"),
    )
    cand = (
        t.join(c, "b")
        .withColumn("d", F.abs(F.col("ts") - F.col("cs")))
        .filter(F.col("d") <= _CALIPER_C)
    )
    # argmin as min(struct(d, control_key)) (r11 optimization round,
    # guide §2.3 "aggregate before you shuffle"): the row_number window
    # shuffled + sorted the full candidate stream; the struct-min
    # aggregate partial-combines map-side and picks the SAME (distance,
    # control key)-lexicographic winner per treated order.
    return (
        cand.groupBy("treated_key")
        .agg(F.min(F.struct("d", "control_key")).alias("__m"))
        .select(
            "treated_key",
            F.col("__m.control_key").alias("control_key"),
            F.col("__m.d").cast("bigint").alias("score_diff_cents"),
        )
    )


# ---------------------------------------------------------------------------
# pareto_skyline
# ---------------------------------------------------------------------------

_SKY_BUCKET_C = 1_000_000  # spend bucket width for the partitioned pass


@query(
    "pareto_skyline",
    registered=False,  # driver-proven green in CORRECTNESS_r07; slot rotated (see catalog.py docstring)
    oracle="""
    WITH agg AS (
      SELECT o_custkey,
        CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
          AS spend_c,
        CAST(count(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY o_custkey
    ),
    pts AS (SELECT DISTINCT spend_c, n_orders FROM agg),
    w AS (
      SELECT spend_c, n_orders,
        max(n_orders) OVER (ORDER BY spend_c DESC, n_orders DESC
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mx
      FROM pts
    )
    SELECT spend_c, n_orders FROM w WHERE mx IS NULL OR mx < n_orders
    """,
)
def q_pareto_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto frontier) of distinct customer profiles on
    (total spend, order count), both maximized: a point survives iff no
    other point is ≥ in both coordinates and > in one.  The classic
    multi-objective shortlist (best-value customers / no-regret
    configurations).

    The oracle uses the textbook single prefix-maximum over the
    (spend DESC, n DESC) order — dominated ⟺ a lexicographically
    earlier point has n ≥ mine.  A global ORDER BY of all points is
    exactly what a 100 TB plan must avoid, so the Spark side computes
    the SAME predicate two-level: points hash into spend buckets;
    (a) a per-bucket prefix max (window PARTITIONED by bucket) catches
    dominators in my bucket, and (b) a per-bucket max-n summary —
    bounded rows, broadcast — suffix-maxed over strictly higher
    buckets catches dominators above (their spend is strictly greater
    by construction, so only n ≥ mine is needed).  Equivalence is
    exact, not approximate: every dominator is either in my bucket or
    a higher one."""
    agg = (
        read_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("spend_c"),
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        )
    )
    # integer `div` for bucket ids (ADVICE r7): exact at any magnitude,
    # matching the oracle's `//` even past 2^53
    pts = agg.select("spend_c", "n_orders").distinct().withColumn(
        "__b", F.expr(f"spend_c div {_SKY_BUCKET_C}")
    )
    # (b) cross-bucket: max n per bucket, then the running max over
    # strictly-higher buckets — a bounded summary table (spend range /
    # bucket width rows), so its window and the join back are cheap.
    bmax = pts.groupBy("__b").agg(F.max("n_orders").alias("__bn"))
    wb = Window.orderBy(F.col("__b").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    bsuf = bmax.withColumn("__sufn", F.max("__bn").over(wb)).select(
        "__b", "__sufn"
    )
    # (a) within-bucket prefix max over the lexicographic order.
    wi = Window.partitionBy("__b").orderBy(
        F.col("spend_c").desc(), F.col("n_orders").desc()
    ).rowsBetween(Window.unboundedPreceding, -1)
    flagged = (
        pts.join(F.broadcast(bsuf), "__b")
        .withColumn("__inb", F.max("n_orders").over(wi))
    )
    dominated = (
        F.coalesce(F.col("__inb") >= F.col("n_orders"), F.lit(False))
    ) | (F.coalesce(F.col("__sufn") >= F.col("n_orders"), F.lit(False)))
    return flagged.filter(~dominated).select("spend_c", "n_orders")


# ---------------------------------------------------------------------------
# heavy_hitters_audit
# ---------------------------------------------------------------------------

_HH_K = 10
_HH_SKETCH_K = 20  # sketch list deliberately wider than the audited k
_HH_MAX_TRACKED = 10_000


@query(
    "heavy_hitters_audit",
    registered=False,  # driver-proven green in CORRECTNESS_r07; slot rotated (see catalog.py docstring)
    oracle=f"""
    WITH words AS (
      SELECT unnest(string_split(text, ' ')) AS w FROM documents
    ),
    freq AS (
      SELECT w, CAST(count(*) AS BIGINT) AS n FROM words
      WHERE w <> '' GROUP BY w
    ),
    top AS (
      SELECT w, n, row_number() OVER (ORDER BY n DESC, w) AS rn FROM freq
    )
    SELECT w AS word, n AS exact_count, true AS sketch_agrees
    FROM top WHERE rn <= {_HH_K}
    """,
)
def q_heavy_hitters_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitters audit: the exact top-{k} vocabulary next to a
    boolean per word — does Spark 4's ``approx_top_k`` (DataSketches
    frequent-items, maxItemsTracked={mt}) report the same word with
    the same count in its top-{sk} list?  The sketch is the 100 TB
    product (bounded state, merge-associative, one pass); the exact
    count-and-rank is the audit-scale referee; the sketch list is
    wider than the audited k so count ties at the boundary cannot
    fake a miss.  Raw sketch output is never surfaced (its tie order
    is engine-specific) — only the boolean, per the
    hll_distinct_audit device.

    Both passes are one map-side-combinable aggregation over the
    exploded token stream; the ranking window runs over
    vocabulary-bounded rows."""
    docs = read_table(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(F.split(F.col("text"), " ")).alias("w")
    ).filter(F.col("w") != "")
    freq = words.groupBy("w").agg(F.count(F.lit(1)).alias("n"))
    wr = Window.orderBy(F.col("n").desc(), "w")
    top = (
        freq.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= _HH_K)
        .select(F.col("w").alias("word"), F.col("n").alias("exact_count"))
    )
    sketch = words.agg(
        F.expr(
            f"approx_top_k(w, {_HH_SKETCH_K}, {_HH_MAX_TRACKED})"
        ).alias("tk")
    ).select(
        F.explode("tk").alias("e")
    ).select(
        F.col("e.item").alias("word"),
        F.col("e.count").alias("sketch_count"),
    )
    return top.join(F.broadcast(sketch), "word", "left").select(
        "word",
        F.col("exact_count").cast("bigint").alias("exact_count"),
        F.coalesce(
            F.col("sketch_count") == F.col("exact_count"), F.lit(False)
        ).alias("sketch_agrees"),
    )


q_heavy_hitters_audit.__doc__ = (q_heavy_hitters_audit.__doc__ or "").format(
    k=_HH_K, sk=_HH_SKETCH_K, mt=_HH_MAX_TRACKED
)
