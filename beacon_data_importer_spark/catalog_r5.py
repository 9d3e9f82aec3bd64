"""Round-5 catalog tier: change-data-capture apply, incremental
aggregate maintenance (partial-state merge + reaggregable sketches),
probabilistic pruning (bloom semi-join reduction, Count-Min audit),
gaps-and-islands, rolling bivariate statistics, and the ML-experiment /
feature-engineering family (CUPED, leave-one-out target encoding,
calibration, purged temporal splits, negative sampling).

Same cross-engine parity discipline as catalog.py (cents trick, floor
micro-units, md5 hashing, id tie-breakers, identical aliases on both
engines).  New round-5 queries register into the driver's 50 slots
(never-driver-proven first — see catalog.py's rotation docstring).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import cents, query
from .catalog_r2 import _duck_hash64
from .sources.parquet import read_table

# ---------------------------------------------------------------------------
# cdc_apply — changelog → snapshot (last-writer-wins upserts + deletes)
# ---------------------------------------------------------------------------


@query(
    "cdc_apply",
    # registered (round-5): new query, no driver row yet
    oracle="""
    WITH log AS (
      SELECT o_orderkey AS k, 0 AS seq, 'U' AS op,
             CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
      FROM orders WHERE o_orderkey % 3 <> 0
      UNION ALL
      SELECT o_orderkey, 1, 'U',
             CAST(round(o_totalprice * 105) AS BIGINT)
      FROM orders WHERE o_orderkey % 5 = 0
      UNION ALL
      SELECT o_orderkey, 2, 'U',
             CAST(round(o_totalprice * 100) AS BIGINT)
      FROM orders WHERE o_orderkey % 3 = 0
      UNION ALL
      SELECT o_orderkey, 3, 'D', CAST(NULL AS BIGINT)
      FROM orders WHERE o_orderkey % 7 = 0
    ),
    ranked AS (
      SELECT k, op, price_cents, seq,
             row_number() OVER (PARTITION BY k ORDER BY seq DESC) AS rn,
             count(*) OVER (PARTITION BY k) AS n_versions
      FROM log
    )
    SELECT k AS orderkey, price_cents,
           CAST(n_versions AS BIGINT) AS n_versions
    FROM ranked WHERE rn = 1 AND op = 'U'
    """,
)
def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHANGE-DATA-CAPTURE apply: collapse an ordered changelog of
    upserts and deletes onto a base snapshot — the Debezium-to-
    warehouse MERGE pattern (and the batch twin of a streaming CDC
    sink).  The changelog is derived deterministically from orders
    (base load at seq 0, a 5%-price correction wave at seq 1, a
    late-arriving insert wave at seq 2, a delete wave at seq 3);
    last-writer-wins picks each key's highest-seq entry and a trailing
    delete erases the key entirely.

    Plan: one union (no shuffle — same source scanned with disjoint
    pushed filters) then ONE hash exchange on the key for the
    row_number/count window pair.  At 100 TB the changelog partition
    count scales with data and per-key state is the version list —
    bounded by write amplification, never by corpus size.  Reference
    parity: this is the scalable form of the staged UPDATE…FROM +
    DELETE sequence (`import_stage.py` M4/M5)."""
    o = read_table(spark, sf_dir, "orders")
    base = o.filter(F.col("o_orderkey") % 3 != 0).select(
        F.col("o_orderkey").alias("k"),
        F.lit(0).alias("seq"),
        F.lit("U").alias("op"),
        cents(F.col("o_totalprice")).alias("price_cents"),
    )
    corrections = o.filter(F.col("o_orderkey") % 5 == 0).select(
        F.col("o_orderkey").alias("k"),
        F.lit(1).alias("seq"),
        F.lit("U").alias("op"),
        F.round(F.col("o_totalprice") * 105, 0)
        .cast("bigint")
        .alias("price_cents"),
    )
    inserts = o.filter(F.col("o_orderkey") % 3 == 0).select(
        F.col("o_orderkey").alias("k"),
        F.lit(2).alias("seq"),
        F.lit("U").alias("op"),
        cents(F.col("o_totalprice")).alias("price_cents"),
    )
    deletes = o.filter(F.col("o_orderkey") % 7 == 0).select(
        F.col("o_orderkey").alias("k"),
        F.lit(3).alias("seq"),
        F.lit("D").alias("op"),
        F.lit(None).cast("bigint").alias("price_cents"),
    )
    log = base.unionAll(corrections).unionAll(inserts).unionAll(deletes)
    w = Window.partitionBy("k")
    ranked = log.select(
        "k",
        "op",
        "price_cents",
        F.row_number()
        .over(w.orderBy(F.col("seq").desc()))
        .alias("rn"),
        F.count(F.lit(1)).over(w).alias("n_versions"),
    )
    return ranked.filter((F.col("rn") == 1) & (F.col("op") == "U")).select(
        F.col("k").alias("orderkey"),
        "price_cents",
        F.col("n_versions").cast("bigint").alias("n_versions"),
    )


# ---------------------------------------------------------------------------
# incremental_agg_merge — partial aggregate state, merged == direct
# ---------------------------------------------------------------------------


@query(
    "incremental_agg_merge",
    # registered (round-5): new query, no driver row yet
    oracle="""
    SELECT o_orderpriority AS priority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS revenue_cents,
           CAST(min(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS min_cents,
           CAST(max(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS max_cents,
           CAST((sum(CAST(round(o_totalprice * 100) AS BIGINT)) * 1000000)
                // count(*) AS BIGINT) AS avg_cents_micro
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL VIEW MAINTENANCE via mergeable partial-aggregate
    state: per-batch (here: per order-year) partials of
    (count, sum, min, max) are MERGED to the final per-priority totals
    — count/sum by summing, min/max by re-min/maxing, avg derived from
    the merged (sum, count) pair at the very end.  The oracle computes
    the same result DIRECTLY from the raw table, so a green row proves
    merge(partials) ≡ direct — the algebraic property that lets a
    100 TB warehouse maintain dashboards by folding in each day's
    partial instead of rescanning history (Spark's own map-side
    partial aggregation is this exact algebra one level down).

    avg is integer micro-cents via BIGINT floor-division (both engines
    floor on positives), never a float sum."""
    o = read_table(spark, sf_dir, "orders")
    partials = o.groupBy(
        F.year("o_orderdate").alias("batch"),
        F.col("o_orderpriority").alias("priority"),
    ).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(cents(F.col("o_totalprice"))).alias("s"),
        F.min(cents(F.col("o_totalprice"))).alias("mn"),
        F.max(cents(F.col("o_totalprice"))).alias("mx"),
    )
    merged = partials.groupBy("priority").agg(
        F.sum("cnt").alias("n_orders"),
        F.sum("s").alias("revenue_cents"),
        F.min("mn").alias("min_cents"),
        F.max("mx").alias("max_cents"),
    )
    return merged.select(
        "priority",
        F.col("n_orders").cast("bigint").alias("n_orders"),
        F.col("revenue_cents").cast("bigint").alias("revenue_cents"),
        F.col("min_cents").cast("bigint").alias("min_cents"),
        F.col("max_cents").cast("bigint").alias("max_cents"),
        F.expr("(revenue_cents * 1000000) div n_orders")
        .cast("bigint")
        .alias("avg_cents_micro"),
    )


# ---------------------------------------------------------------------------
# gaps_islands — consecutive-month activity streaks per customer
# ---------------------------------------------------------------------------


@query(
    "gaps_islands",
    # registered (round-5): new query, no driver row yet
    oracle="""
    WITH months AS (
      SELECT DISTINCT o_custkey AS custkey,
             CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
               AS m
      FROM orders
    ),
    grp AS (
      SELECT custkey, m,
             m - row_number() OVER (PARTITION BY custkey ORDER BY m)
               AS island
      FROM months
    ),
    islands AS (
      SELECT custkey, island, count(*) AS len
      FROM grp GROUP BY custkey, island
    )
    SELECT custkey,
           CAST(count(*) AS BIGINT) AS n_islands,
           CAST(max(len) AS BIGINT) AS max_streak_months,
           CAST(sum(len) AS BIGINT) AS n_active_months
    FROM islands
    GROUP BY custkey
    """,
)
def q_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GAPS-AND-ISLANDS: per-customer streaks of consecutive active
    months (month_index − row_number is constant within a run — the
    classic islands device), yielding streak count, longest streak,
    and total active months.  The retention/engagement primitive next
    to cohort_retention's calendar matrix: "longest consecutive-month
    purchase streak" is unanswerable with plain grouping.

    Plan: distinct (customer, month) — one exchange — then the
    row_number window and both aggregations all share the customer
    partitioning, so AQE coalesces them onto the same shuffle.  Island
    state is per-customer and month-granular: bounded by the calendar,
    not the order count."""
    o = read_table(spark, sf_dir, "orders")
    months = o.select(
        F.col("o_custkey").alias("custkey"),
        (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
        .cast("bigint")
        .alias("m"),
    ).distinct()
    grp = months.select(
        "custkey",
        "m",
        (
            F.col("m")
            - F.row_number().over(
                Window.partitionBy("custkey").orderBy("m")
            )
        ).alias("island"),
    )
    islands = grp.groupBy("custkey", "island").agg(
        F.count(F.lit(1)).alias("len")
    )
    return islands.groupBy("custkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_islands"),
        F.max("len").cast("bigint").alias("max_streak_months"),
        F.sum("len").cast("bigint").alias("n_active_months"),
    )


# ---------------------------------------------------------------------------
# rolling_correlation — trailing 28-day Pearson r of revenue vs volume
# ---------------------------------------------------------------------------


@query(
    "rolling_correlation",
    # registered (round-5): new query, no driver row yet
    oracle="""
    WITH daily AS (
      SELECT CAST(year(o_orderdate) AS INT) AS yr,
             CAST(datediff('day', DATE '1992-01-01',
                           CAST(o_orderdate AS DATE)) AS BIGINT) AS ep,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS x,
             CAST(count(*) AS BIGINT) AS y
      FROM orders GROUP BY 1, 2
    ),
    win AS (
      SELECT yr, ep,
        count(*) OVER w AS n,
        sum(x) OVER w AS sx, sum(y) OVER w AS sy,
        sum(CAST(x AS DECIMAL(38,0)) * x) OVER w AS sxx,
        sum(CAST(y AS DECIMAL(38,0)) * y) OVER w AS syy,
        sum(CAST(x AS DECIMAL(38,0)) * y) OVER w AS sxy
      FROM daily
      WINDOW w AS (PARTITION BY yr ORDER BY ep
                   RANGE BETWEEN 27 PRECEDING AND CURRENT ROW)
    )
    SELECT yr, ep, CAST(n AS BIGINT) AS n_days,
      CASE WHEN n >= 2
             AND CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx > 0
             AND CAST(n AS DECIMAL(38,0)) * syy - CAST(sy AS DECIMAL(38,0)) * sy > 0
        THEN CAST(floor(
          1e6 * CAST(CAST(n AS DECIMAL(38,0)) * sxy
                     - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE)
          / sqrt(CAST(CAST(n AS DECIMAL(38,0)) * sxx
                      - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE)
                 * CAST(CAST(n AS DECIMAL(38,0)) * syy
                        - CAST(sy AS DECIMAL(38,0)) * sy AS DOUBLE))
        ) AS BIGINT)
        ELSE NULL END AS r_micro
    FROM win
    """,
)
def q_rolling_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 28-day PEARSON CORRELATION between daily revenue and
    daily order volume — the rolling bivariate statistic behind
    "has the price/volume relationship changed this month".  The six
    sufficient statistics (n, Σx, Σy, Σx², Σy², Σxy) accumulate over a
    RANGE window as exact integers/decimals; doubles appear only in
    the final num/√(d₁·d₂) — deterministic IEEE ops on exact inputs,
    surfaced as floor micro-units with a NULL guard for degenerate
    windows (n<2 or zero variance).

    The window PARTITIONS BY YEAR (the streak resets each January):
    trailing stats stay parallel across years instead of the
    single-task global-ORDER-BY window this module's conventions ban.
    One exchange for the daily rollup; the year partition reuses it."""
    o = read_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.year("o_orderdate").cast("int").alias("yr"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")
        )
        .cast("bigint")
        .alias("ep"),
    ).agg(
        F.sum(cents(F.col("o_totalprice"))).cast("bigint").alias("x"),
        F.count(F.lit(1)).cast("bigint").alias("y"),
    )
    dec = "decimal(38,0)"
    w = (
        Window.partitionBy("yr")
        .orderBy("ep")
        .rangeBetween(-27, Window.currentRow)
    )
    win = daily.select(
        "yr",
        "ep",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("x").over(w).alias("sx"),
        F.sum("y").over(w).alias("sy"),
        F.sum(F.col("x").cast(dec) * F.col("x")).over(w).alias("sxx"),
        F.sum(F.col("y").cast(dec) * F.col("y")).over(w).alias("syy"),
        F.sum(F.col("x").cast(dec) * F.col("y")).over(w).alias("sxy"),
    )
    n_d = F.col("n").cast(dec)
    dx = n_d * F.col("sxx") - F.col("sx").cast(dec) * F.col("sx")
    dy = n_d * F.col("syy") - F.col("sy").cast(dec) * F.col("sy")
    num = n_d * F.col("sxy") - F.col("sx").cast(dec) * F.col("sy")
    r = F.floor(
        F.lit(1e6)
        * num.cast("double")
        / F.sqrt(dx.cast("double") * dy.cast("double"))
    ).cast("bigint")
    return win.select(
        "yr",
        "ep",
        F.col("n").cast("bigint").alias("n_days"),
        F.when((F.col("n") >= 2) & (dx > 0) & (dy > 0), r)
        .otherwise(F.lit(None).cast("bigint"))
        .alias("r_micro"),
    )


# ---------------------------------------------------------------------------
# order_gap_features — per-customer inter-order gap features
# ---------------------------------------------------------------------------


@query(
    "order_gap_features",
    # registered (round-5): new query, no driver row yet
    oracle="""
    WITH seq AS (
      SELECT o_custkey AS custkey,
             CAST(o_orderdate AS DATE) AS d,
             datediff('day',
               lag(CAST(o_orderdate AS DATE)) OVER
                 (PARTITION BY o_custkey
                  ORDER BY o_orderdate, o_orderkey),
               CAST(o_orderdate AS DATE)) AS gap
      FROM orders
    )
    SELECT custkey,
           CAST(count(*) AS BIGINT) AS n_orders,
           min(d) AS first_order,
           max(d) AS last_order,
           CAST(max(gap) AS BIGINT) AS max_gap_days,
           CASE WHEN count(*) >= 2 THEN
             CAST((CAST(datediff('day', min(d), max(d)) AS BIGINT)
                   * 1000000) // (count(*) - 1) AS BIGINT)
           ELSE NULL END AS avg_gap_micro_days
    FROM seq
    GROUP BY custkey
    """,
)
def q_order_gap_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ML FEATURE ENGINEERING: per-customer inter-order gap features
    (order count, first/last date, longest gap, mean gap) — the
    recency/frequency signal block a churn model trains on, computed
    as one pass.  The mean gap uses the telescoping identity
    Σgaps = last − first, so it needs no per-gap float math: exact
    integer micro-days via floor-division.  max gap comes from a lag
    window ordered by (date, orderkey) — the id tie-break makes the
    lag deterministic under same-day orders (the gap value itself is
    date-based either way).

    One exchange on customer; the lag window and the aggregation share
    it.  Feature state is per-customer scalars — at 100 TB this is the
    canonical "feature table build" shape: key-partitioned, no global
    ordering anywhere."""
    o = read_table(spark, sf_dir, "orders")
    wl = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderdate").cast("date").alias("d"),
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lag(F.col("o_orderdate").cast("date")).over(wl),
        ).alias("gap"),
    )
    agg = seq.groupBy("custkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.min("d").alias("first_order"),
        F.max("d").alias("last_order"),
        F.max("gap").cast("bigint").alias("max_gap_days"),
    )
    span = F.datediff(F.col("last_order"), F.col("first_order")).cast(
        "bigint"
    )
    return agg.select(
        "custkey",
        "n_orders",
        "first_order",
        "last_order",
        "max_gap_days",
        F.when(
            F.col("n_orders") >= 2,
            F.expr(
                "(CAST(datediff(last_order, first_order) AS BIGINT) "
                "* 1000000) div (n_orders - 1)"
            ).cast("bigint"),
        )
        .otherwise(F.lit(None).cast("bigint"))
        .alias("avg_gap_micro_days"),
    )
