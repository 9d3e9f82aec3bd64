"""Round-7 catalog tier (f): physical-layout engineering + graph
core decomposition —

* ``layout_skip_compare`` — the data-layout decision a 100 TB table
  owner actually faces, measured instead of asserted: the same rows
  written as 64 files under three orderings — natural (arrival
  order), linear sort on one column, and Z-order (Morton interleave)
  on two — and, for each layout, how many files a zonemap
  (per-file min/max) can PROVE irrelevant for a one-column and a
  two-column predicate.  Linear sort wins the single-column scan,
  collapses on the second column; Z-order trades a little of the
  first for pruning on both — this query outputs that exact trade as
  integers.  The Spark side assigns file positions with the
  range-partitioned ``global_rank`` operator (no single-task sort);
  the oracle uses the textbook global ``row_number``.
* ``k_core_decomposition`` — the 3-core of the part↔supplier
  co-supply graph by ROUNDS unrolled peeling steps (drop nodes with
  induced degree < 3, recompute, repeat): the densest-backbone
  extraction that complements pagerank (influence), SSSP (distance),
  and connected components (membership).  Peeling is monotone, so a
  fixed round count is sound when the last round removes nothing —
  the ``converged`` column PROVES fixpoint instead of assuming it
  (same honesty device as the CC queries).

Reference parity: beyond-reference layout/graph tiers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import query
from .sources.parquet import read_table

# ---------------------------------------------------------------------------
# layout_skip_compare
# ---------------------------------------------------------------------------

_SKIP_FILES = 64
_SKIP_BITS = 10  # normalize both columns to 0..1023 before interleaving
_PRED_X = (100, 199)  # ~10% band on the normalized part axis
_PRED_Y = (500, 549)  # ~5% band on the normalized supplier axis


def _morton(dialect: str, xs: str, ys: str) -> str:
    """Bit-interleave two {bits}-bit integers (Z-order / Morton code);
    identical integer math in both engines, different shift syntax."""
    terms = []
    for i in range(_SKIP_BITS):
        if dialect == "spark":
            terms.append(f"shiftleft(shiftright({xs}, {i}) & 1, {2 * i})")
            terms.append(
                f"shiftleft(shiftright({ys}, {i}) & 1, {2 * i + 1})"
            )
        else:
            terms.append(f"((({xs} >> {i}) & 1) << {2 * i})")
            terms.append(f"((({ys} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


_SKIP_MAX = (1 << _SKIP_BITS) - 1


def _skip_norm_sql(dialect: str) -> str:
    """Shared head: lineitem → normalized integer (xs, ys) plus the
    total-order tiebreak columns."""
    div = " div " if dialect == "spark" else " // "
    return f"""
    base AS (
      SELECT l_orderkey AS ok, l_linenumber AS ln, l_partkey AS pk,
             l_suppkey AS sk,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS pc,
             l_partkey AS x, l_suppkey AS y
      FROM lineitem
    ),
    bounds AS (
      SELECT min(x) AS minx, max(x) AS maxx, min(y) AS miny,
             max(y) AS maxy, CAST(count(*) AS BIGINT) AS n
      FROM base
    ),
    norm AS (
      SELECT b.ok, b.ln, b.pk, b.sk, b.pc,
        CAST(((b.x - t.minx) * {_SKIP_MAX}){div}(t.maxx - t.minx)
             AS BIGINT) AS xs,
        CAST(((b.y - t.miny) * {_SKIP_MAX}){div}(t.maxy - t.miny)
             AS BIGINT) AS ys,
        t.n AS n
      FROM base b CROSS JOIN bounds t
    )"""


def _skip_tail_sql(dialect: str) -> str:
    """Shared tail over rows (layout, file_id, xs, ys): zonemaps +
    provable-skip counts per layout."""
    return f"""
    zone AS (
      SELECT layout, file_id,
        min(xs) AS min_xs, max(xs) AS max_xs,
        min(ys) AS min_ys, max(ys) AS max_ys
      FROM placed GROUP BY layout, file_id
    )
    SELECT layout, CAST(count(*) AS BIGINT) AS n_files,
      CAST(sum(CASE WHEN max_xs < {_PRED_X[0]} OR min_xs > {_PRED_X[1]}
               THEN 1 ELSE 0 END) AS BIGINT) AS skipped_x_pred,
      CAST(sum(CASE WHEN max_xs < {_PRED_X[0]} OR min_xs > {_PRED_X[1]}
                 OR max_ys < {_PRED_Y[0]} OR min_ys > {_PRED_Y[1]}
               THEN 1 ELSE 0 END) AS BIGINT) AS skipped_xy_pred
    FROM zone GROUP BY layout
    """


def _skip_oracle() -> str:
    div = " // "
    m = _morton("duck", "xs", "ys")

    def placed(layout: str, order: str) -> str:
        return f"""
      SELECT '{layout}' AS layout,
        ((row_number() OVER (ORDER BY {order}) - 1)
         * {_SKIP_FILES}){div}n AS file_id,
        xs, ys
      FROM norm"""

    return f"""
    WITH {_skip_norm_sql("duck")},
    placed AS (
      {placed("natural", "ok, ln, pk, sk, pc")}
      UNION ALL
      {placed("sorted_x", "xs, ok, ln, pk, sk, pc")}
      UNION ALL
      {placed("zorder", f"({m}), ok, ln, pk, sk, pc")}
    ),
    {_skip_tail_sql("duck")}
    """


@query(
    "layout_skip_compare",
    registered=False,  # extra (round-7): rotation candidate for round 8
    oracle=_skip_oracle(),
)
def q_layout_skip_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zonemap-skip advisor across three physical layouts of the same
    rows (64 files each): natural order, linear sort on the part axis,
    and Z-order on (part, supplier).  Both columns normalize to
    0..1023 integers; the Morton code interleaves their bits so
    near-rectangular predicate boxes map to few code ranges.  For each
    layout the query counts files whose per-file min/max PROVES they
    cannot match (a) the one-column predicate on xs and (b) the
    two-column predicate adding ys — exactly what a scan planner
    skips without reading.  Expected and measured shape: linear sort
    maximizes (a) but its ys zonemaps are full-range so (b) gains
    almost nothing over (a); Z-order prunes on BOTH axes.

    Scale shape: each layout costs ONE range exchange — file positions
    come from the range-partitioned ``global_rank`` operator, never a
    single-task global window; zonemaps are a map-side-combinable
    aggregate; the bounds row broadcasts.  The oracle replays the same
    integer math with a textbook row_number."""
    from .operators.order import global_rank

    li = read_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("ok"),
        F.col("l_linenumber").alias("ln"),
        F.col("l_partkey").alias("pk"),
        F.col("l_suppkey").alias("sk"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("pc"),
        F.col("l_partkey").alias("x"),
        F.col("l_suppkey").alias("y"),
    )
    bounds = F.broadcast(
        li.agg(
            F.min("x").alias("minx"),
            F.max("x").alias("maxx"),
            F.min("y").alias("miny"),
            F.max("y").alias("maxy"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
    )
    norm = li.crossJoin(bounds).select(
        "ok", "ln", "pk", "sk", "pc", "n",
        F.expr(
            f"CAST(((x - minx) * {_SKIP_MAX}) div (maxx - minx) AS BIGINT)"
        ).alias("xs"),
        F.expr(
            f"CAST(((y - miny) * {_SKIP_MAX}) div (maxy - miny) AS BIGINT)"
        ).alias("ys"),
    )
    zcol = F.expr(_morton("spark", "xs", "ys"))
    layouts = [
        ("natural", norm, ["ok", "ln", "pk", "sk", "pc"]),
        ("sorted_x", norm, ["xs", "ok", "ln", "pk", "sk", "pc"]),
        (
            "zorder",
            norm.withColumn("__z", zcol),
            ["__z", "ok", "ln", "pk", "sk", "pc"],
        ),
    ]
    placed = None
    for name, df, order_cols in layouts:
        ranked = global_rank(df, order_cols, out_col="__rn")
        part = ranked.select(
            F.lit(name).alias("layout"),
            # integer div, not float `/` + cast: a double quotient can
            # land one ulp under an integer and truncate off-by-one
            F.expr(f"((__rn - 1) * {_SKIP_FILES}) div n").alias("file_id"),
            "xs",
            "ys",
        )
        placed = part if placed is None else placed.unionByName(part)
    placed.createOrReplaceTempView("placed")
    return spark.sql("WITH " + _skip_tail_sql("spark"))


# ---------------------------------------------------------------------------
# k_core_decomposition
# ---------------------------------------------------------------------------

_KCORE_K = 3
_KCORE_ROUNDS = 6


def _kcore_oracle() -> str:
    steps = []
    for i in range(1, _KCORE_ROUNDS + 1):
        steps.append(f"""
    v{i} AS MATERIALIZED (
      SELECT e.src AS node FROM edges e
      JOIN v{i - 1} a ON a.node = e.src
      JOIN v{i - 1} b ON b.node = e.dst
      GROUP BY e.src HAVING count(*) >= {_KCORE_K}
    )""")
    return f"""
    WITH raw AS MATERIALIZED (
      SELECT DISTINCT l_partkey * 2 AS p, l_suppkey * 2 + 1 AS s
      FROM lineitem
    ),
    edges AS MATERIALIZED (
      SELECT p AS src, s AS dst FROM raw
      UNION ALL
      SELECT s AS src, p AS dst FROM raw
    ),
    v0 AS MATERIALIZED (SELECT DISTINCT src AS node FROM edges),
    {",".join(steps)}
    SELECT
      CASE WHEN node % 2 = 0 THEN 'part' ELSE 'supplier' END AS kind,
      CAST(count(*) AS BIGINT) AS n_core_nodes,
      ((SELECT count(*) FROM v{_KCORE_ROUNDS})
        = (SELECT count(*) FROM v{_KCORE_ROUNDS - 1})) AS converged
    FROM v{_KCORE_ROUNDS} GROUP BY 1
    """


@query(
    "k_core_decomposition",
    registered=False,  # extra (round-7): rotation candidate for round 8
    oracle=_kcore_oracle(),
)
def q_k_core_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{k}-core of the bipartite part↔supplier co-supply graph
    (pagerank_parts' node encoding): {r} unrolled peeling rounds, each
    keeping only nodes whose degree WITHIN the surviving subgraph is
    ≥ {k}.  The k-core is the standard dense-backbone extractor —
    nodes that stay connected even after every marginal participant
    is recursively removed — and peeling is monotone, so the
    ``converged`` column (last round removed nothing) turns the fixed
    round count into a PROOF of the true fixpoint rather than an
    assumption; if a bigger graph needed more rounds, both engines
    would report converged=false identically.

    Spark runs the rounds as localCheckpointed DataFrame steps (the
    weighted_sssp doctrine — unrolled iterative-join lineage compounds
    past ~8 rounds, tools/sssp_probe.py) with each round one
    shuffle-join + aggregate; the oracle unrolls MATERIALIZED CTEs."""
    li = read_table(spark, sf_dir, "lineitem")
    raw = li.select(
        (F.col("l_partkey") * 2).alias("p"),
        (F.col("l_suppkey") * 2 + 1).alias("s"),
    ).distinct()
    edges = raw.select(
        F.col("p").alias("src"), F.col("s").alias("dst")
    ).unionByName(
        raw.select(F.col("s").alias("src"), F.col("p").alias("dst"))
    ).localCheckpoint()
    cur = edges.select(F.col("src").alias("node")).distinct()
    prev_n = None
    for _ in range(_KCORE_ROUNDS):
        prev_n = cur.count()
        cur = (
            edges.join(cur.withColumnRenamed("node", "src"), "src")
            .join(
                cur.select(F.col("node").alias("dst")), "dst"
            )
            .groupBy("src")
            .agg(F.count(F.lit(1)).alias("__deg"))
            .filter(F.col("__deg") >= _KCORE_K)
            .select(F.col("src").alias("node"))
            .localCheckpoint()
        )
    converged = cur.count() == prev_n
    return cur.groupBy(
        F.when(F.col("node") % 2 == 0, F.lit("part"))
        .otherwise(F.lit("supplier"))
        .alias("kind")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_core_nodes"),
    ).select(
        "kind", "n_core_nodes", F.lit(converged).alias("converged")
    )


q_k_core_decomposition.__doc__ = (q_k_core_decomposition.__doc__ or "").format(
    k=_KCORE_K, r=_KCORE_ROUNDS
)
