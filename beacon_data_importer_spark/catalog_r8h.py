"""Round-8 catalog, tier 8 (post-slot extras, round-9 promotion
candidates) —

* ``mmr_diversified_rerank`` — maximal-marginal-relevance re-ranking:
  greedy λ-tradeoff between query relevance and redundancy against
  the already-picked set, unrolled to 5 picks over a bounded top-20
  shortlist FED BY THE IVF INDEX (ratio-scaled probe cells, one
  cell-bounded equi-join — no full-corpus scan on the relevance
  path; VERDICT r8 item 3).  The diversity-aware member of the
  retrieval family (``similarity_topk`` optimizes relevance only;
  near-dup results are exactly what dedup'd training data does NOT
  want).  ``mmr_shortlist_recall_audit`` is its brute twin: the
  exact top-20 scan lives there, pricing the IVF shortlist's recall
  per query.
* ``fisher_exact_2x2`` — one-sided Fisher exact test on the variant ×
  heavy-purchaser 2×2 table: the full hypergeometric tail evaluated
  by three SCALAR folds (pmf(0) product, walk-to-a product, Horner
  tail sum — the bayes_ab device), so the EXACT p-value crosses
  engines bit-identically with no lgamma and no approximation.
  ``mcnemar_test``/``chi_square_independence`` are asymptotic; this
  is the small-table exact gate.
* ``hurst_exponent`` — R/S analysis of daily revenue: rescaled range
  per dyadic window size (16..128), each block's R/S floored to ppm
  BEFORE cross-block averaging (float sums across partitions are
  order-dependent — integer sums are not), ln-ln slope by exact
  integer OLS over the 4 window sizes.  H > 0.5 = long-range
  persistence; the memory-structure complement to ``acf``/``ljung``.
* ``partial_correlation_triples`` — for the daily (orders, revenue,
  discount) triple: each pair's correlation with the third variable
  partialled out, from ppm-floored pairwise correlations via
  r²ₓᵧ.ᵤ = (rₓᵧ − rₓᵤrᵧᵤ)²/((1−rₓᵤ²)(1−rᵧᵤ²)) — all integer after
  the three floors.  ``correlation_matrix`` reports marginal
  structure; this separates direct from mediated association.
* ``bartlett_test`` — k-group variance homogeneity on order values by
  region: the classical χ²-approximate statistic with per-term
  floored ln of the exact rational variances (woe_iv device) and the
  exact integer correction factor assembled by cross-multiplication.
  Complements ``levene_test`` (robust) with the powerful-under-
  normality member of the family (pair with ``jarque_bera_test``).

Reference parity: beyond-reference retrieval/statistics tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .catalog import query
from .catalog_r8d import _day_sql
from .catalog_r8e import _cos_e6
from .sources.parquet import read_table


# ONE shared _views (r12 round): documents/embeddings route through the
# split-gated parallel scan — repartition only when the source has fewer
# scan splits than cores (sources/parquet.py register_views), so no
# Exchange is inserted at warehouse scale.
from .sources.parquet import register_views as _views  # noqa: E402


# ---------------------------------------------------------------------------
# mmr_diversified_rerank (+ mmr_shortlist_recall_audit)
# ---------------------------------------------------------------------------

_MMR_SHORTLIST = 20
_MMR_PICKS = 5
_MMR_LAMBDA10 = 7    # λ = 0.7 → score = (7·rel − 3·maxsim) div 10
_MMR_QUERY_MOD = 50  # vec_id % 50 == 0 → 2% of vectors are queries
_MMR_CENT_MOD = 100  # deterministic centroids, same as ivf_search
_MMR_RATIO = (4, 5)  # nprobe = ceil(4·nlist/5) — the PERF doctrine ratio


def _mmr_base_sql(dialect: str) -> tuple[str, str]:
    """(BRUTE shortlist SELECT, pairsim SELECT over view ``short``).

    The brute shortlist (full corpus × broadcast queries) is the
    exactness twin — consumed only by ``mmr_shortlist_recall_audit``,
    which deliberately pays the full scan to price the IVF shortlist's
    recall (VERDICT r8 item 3)."""
    spark = dialect == "spark"
    hint = "/*+ BROADCAST(q) */ " if spark else ""
    cos = _cos_e6(dialect, "emb", "qvec")
    pcos = _cos_e6(dialect, "a.emb", "b.emb")
    if spark:
        # spark side: norm once per vector → one interpreted fold per
        # pair in ``rel`` (r11 round; bit-identical to _cos_e6 — see
        # catalog_r8e._cos_e6_pre).  Duck twin keeps the plain form.
        from .catalog_r8e import _cos_e6_pre, _norm as _nrm

        src = f"""embn AS (
      SELECT vec_id, embedding, {_nrm(dialect, "embedding")} AS nrm
      FROM embeddings
    ),
    qs AS (
      SELECT vec_id AS query_id, embedding AS qvec, nrm AS qnrm
      FROM embn WHERE vec_id % {_MMR_QUERY_MOD} = 0
    ),
    pairs AS (
      SELECT {hint}q.query_id, e.vec_id, e.embedding AS emb,
             e.nrm, q.qvec, q.qnrm
      FROM embn e CROSS JOIN qs q
      WHERE e.vec_id <> q.query_id
    ),
    rel AS (
      SELECT query_id, vec_id, emb,
        {_cos_e6_pre(dialect, "emb", "qvec", "nrm", "qnrm")} AS rel_e6
      FROM pairs
    ),"""
    else:
        src = f"""qs AS (
      SELECT vec_id AS query_id, embedding AS qvec FROM embeddings
      WHERE vec_id % {_MMR_QUERY_MOD} = 0
    ),
    pairs AS (
      SELECT {hint}q.query_id, e.vec_id, e.embedding AS emb, q.qvec
      FROM embeddings e CROSS JOIN qs q
      WHERE e.vec_id <> q.query_id
    ),
    rel AS (
      SELECT query_id, vec_id, emb, {cos} AS rel_e6 FROM pairs
    ),"""
    shortlist = f"""
    WITH {src}
    scored AS (
      SELECT query_id, vec_id, emb, rel_e6,
        row_number() OVER (PARTITION BY query_id
                           ORDER BY rel_e6 DESC, vec_id) AS rn
      FROM rel
    )
    SELECT query_id, vec_id, emb, rel_e6 FROM scored
    WHERE rn <= {_MMR_SHORTLIST}"""
    if spark:
        # norm once per shortlist row, one fold per pair (r11 round;
        # bit-identical to _cos_e6 — see catalog_r8e._cos_e6_pre)
        from .catalog_r8e import _cos_e6_pre, _norm

        pcos_pre = _cos_e6_pre(
            dialect, "a.emb", "b.emb", "a.nrm", "b.nrm"
        )
        pairsim = f"""
    WITH shortn AS (
      SELECT query_id, vec_id, emb, {_norm(dialect, "emb")} AS nrm
      FROM short
    )
    SELECT a.query_id, a.vec_id AS id_a, b.vec_id AS id_b,
      {pcos_pre} AS sim_e6
    FROM shortn a JOIN shortn b
      ON b.query_id = a.query_id AND b.vec_id <> a.vec_id"""
    else:
        pairsim = f"""
    SELECT a.query_id, a.vec_id AS id_a, b.vec_id AS id_b,
      {pcos} AS sim_e6
    FROM short a JOIN short b
      ON b.query_id = a.query_id AND b.vec_id <> a.vec_id"""
    return shortlist, pairsim


def _mmr_ivf_short_duck() -> str:
    """DuckDB twin of the IVF-fed shortlist: deterministic centroids →
    nearest-cell assignment → ratio-scaled probe cells → cell-join
    candidates → per-query top-{k} by floored micro-cosine.  Same CTE
    pattern as ``hard_negative_mining_ivf_scaled``'s proven oracle
    (catalog_r7/_r8), labels dropped, MMR's query set."""
    from .catalog_r7 import _DUCK_COS

    cos_ec = _DUCK_COS.format(a="e.embedding", b="c.cvec")
    cos_qc = _DUCK_COS.format(a="q.qvec", b="c.cvec")
    rel = _cos_e6("duck", "e.embedding", "q.qvec")
    num, den = _MMR_RATIO
    nprobe = (
        f"greatest(1, ({num} * (SELECT count(*) FROM cent)"
        f" + {den} - 1) // {den})"
    )
    return f"""
    WITH cent AS (SELECT vec_id AS cell_id, embedding AS cvec
                  FROM embeddings WHERE vec_id % {_MMR_CENT_MOD} = 0),
    assign AS (
      SELECT vec_id, cell_id FROM (
        SELECT e.vec_id, c.cell_id,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY {cos_ec} DESC, c.cell_id) AS rn
        FROM embeddings e CROSS JOIN cent c
      ) t WHERE rn = 1
    ),
    q AS (SELECT vec_id AS query_id, embedding AS qvec
          FROM embeddings WHERE vec_id % {_MMR_QUERY_MOD} = 0),
    qprobe AS (
      SELECT query_id, cell_id FROM (
        SELECT q.query_id, c.cell_id,
               row_number() OVER (PARTITION BY q.query_id
                 ORDER BY {cos_qc} DESC, c.cell_id) AS rn
        FROM q CROSS JOIN cent c
      ) t WHERE rn <= {nprobe}
    ),
    icand AS (
      SELECT q.query_id, e.vec_id, e.embedding AS emb, {rel} AS rel_e6
      FROM q
      JOIN qprobe p ON p.query_id = q.query_id
      JOIN assign a ON a.cell_id = p.cell_id
      JOIN embeddings e ON e.vec_id = a.vec_id
      WHERE e.vec_id <> q.query_id
    )
    SELECT query_id, vec_id, emb, rel_e6 FROM (
      SELECT query_id, vec_id, emb, rel_e6,
        row_number() OVER (PARTITION BY query_id
                           ORDER BY rel_e6 DESC, vec_id) AS rn
      FROM icand
    ) s WHERE rn <= {_MMR_SHORTLIST}"""


def _mmr_ivf_short(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark side of the IVF-fed shortlist: map-only cell assignment
    (packed-broadcast fold, zero shuffle), ratio-scaled probe cells per
    query (same device), then ONE shuffle equi-join ON cell_id — the
    candidate volume is bounded by nprobe × cell population, nothing
    query-sided is broadcast against the corpus.  Columns:
    (query_id, vec_id, emb, rel_e6)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from .operators import similarity as SIM

    e = read_table(spark, sf_dir, "embeddings")
    centroids = e.filter(F.col("vec_id") % _MMR_CENT_MOD == 0).select(
        F.col("vec_id").alias("cell_id"),
        F.col("embedding").alias("centroid"),
    )
    corpus = e.repartition(
        spark.sparkContext.defaultParallelism, "vec_id"
    )
    # __enrm once per vector → ONE fold per candidate pair below
    # (r11 round; dot/(na·nb) keeps SIM.cosine's exact operand order).
    assigned = SIM.assign_cells(corpus, centroids).select(
        "vec_id", "embedding", "cell_id"
    ).withColumn("__enrm", SIM.norm("embedding"))
    packed = F.broadcast(
        centroids.agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("cell_id").alias("cid"),
                        F.col("centroid").alias("cvec"),
                    )
                )
            ).alias("__cells")
        )
    )
    queries = e.filter(F.col("vec_id") % _MMR_QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("__qvec"),
        SIM.norm("embedding").alias("__qnrm"),
    )
    num, den = _MMR_RATIO
    qcells = (
        queries.crossJoin(packed)
        .withColumn(
            "__scored",
            F.transform(
                F.col("__cells"),
                lambda c: F.struct(
                    (-SIM.cosine("__qvec", c["cvec"])).alias("negsim"),
                    c["cid"].alias("cid"),
                ),
            ),
        )
        .withColumn(
            "__probe",
            F.slice(
                F.array_sort("__scored"),
                F.lit(1),
                F.greatest(
                    F.lit(1),
                    F.expr(
                        f"(size(__scored) * {num} + {den} - 1) div {den}"
                    ),
                ).cast("int"),
            ),
        )
        .select(
            "query_id",
            "__qvec",
            "__qnrm",
            F.explode(F.transform("__probe", lambda s: s["cid"])).alias(
                "cell_id"
            ),
        )
    )
    cand = (
        qcells.join(assigned, "cell_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.col("embedding").alias("emb"),
            F.floor(
                SIM.dot("embedding", "__qvec")
                / (F.col("__enrm") * F.col("__qnrm"))
                * 1e6
            )
            .cast("bigint")
            .alias("rel_e6"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rel_e6").desc(), "vec_id"
    )
    return (
        cand.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= _MMR_SHORTLIST)
        .drop("__rn")
    )


def _mmr_steps_sql(dialect: str) -> str:
    """Greedy unroll over views ``short``/``psim``: selk = picks 1..k."""
    lam, k = _MMR_LAMBDA10, _MMR_PICKS
    div = " div " if dialect == "spark" else " // "
    steps = [
        f"""sel1 AS (
      SELECT query_id, vec_id, CAST(1 AS BIGINT) AS pick_rank,
        CAST(({lam} * rel_e6){div}10 AS BIGINT) AS mmr_score_e6
      FROM (
        SELECT query_id, vec_id, rel_e6,
          row_number() OVER (PARTITION BY query_id
                             ORDER BY rel_e6 DESC, vec_id) AS rn
        FROM short
      ) s WHERE rn = 1
    )"""
    ]
    prev = "sel1"
    for step in range(2, k + 1):
        steps.append(f"""cand{step} AS (
      SELECT s.query_id, s.vec_id, s.rel_e6,
        max(p.sim_e6) AS maxsim_e6
      FROM short s
      JOIN psim p ON p.query_id = s.query_id AND p.id_a = s.vec_id
      JOIN {prev} l ON l.query_id = s.query_id AND l.vec_id = p.id_b
      WHERE NOT EXISTS (
        SELECT 1 FROM {prev} x
        WHERE x.query_id = s.query_id AND x.vec_id = s.vec_id)
      GROUP BY s.query_id, s.vec_id, s.rel_e6
    ),
    pick{step} AS (
      SELECT query_id, vec_id, CAST({step} AS BIGINT) AS pick_rank,
        CAST(({lam} * rel_e6 - {10 - lam} * maxsim_e6){div}10 AS BIGINT)
          AS mmr_score_e6
      FROM (
        SELECT query_id, vec_id, rel_e6, maxsim_e6,
          row_number() OVER (PARTITION BY query_id
            ORDER BY ({lam} * rel_e6 - {10 - lam} * maxsim_e6){div}10 DESC,
                     vec_id) AS rn
        FROM cand{step}
      ) s WHERE rn = 1
    ),
    sel{step} AS (SELECT * FROM {prev} UNION ALL SELECT * FROM pick{step})""")
        prev = f"sel{step}"
    return (
        "WITH "
        + ",\n    ".join(steps)
        + f"\n    SELECT query_id, pick_rank, vec_id AS neighbor_id,"
        f" mmr_score_e6 FROM sel{k}"
    )


def _mmr_greedy(spark: SparkSession, short_df: DataFrame) -> DataFrame:
    """Greedy MMR over a (query_id, vec_id, emb, rel_e6) shortlist:
    pick₁ = best relevance, then argmax of
    (7·rel − 3·max-sim-to-picked) div 10 with (score, vec_id) total
    order, four greedy steps.  The shortlist and its pairwise sims are
    persisted ONCE; each pick is materialized as Q bounded rows before
    the next step sees it (the hits_hub_authority per-level lesson —
    a single-statement unroll re-inlines the sel chain 2× per step,
    measured 15 s warm vs ~2 s materialized at sf0.1)."""
    from pyspark.sql import functions as F  # noqa: F401 (parity import)

    _, ps = _mmr_base_sql("spark")
    # localCheckpoint, not persist: the shortlist feeds the pairsim SQL
    # AND the cogroup directly; checkpointing materializes it once and
    # needs no unpersist hand-off to the (lazy) caller.
    short = short_df.localCheckpoint()
    short.createOrReplaceTempView("short")
    psim = spark.sql(ps)
    lam, k = _MMR_LAMBDA10, _MMR_PICKS

    # r11 optimization round: the greedy used to run as a 4-step DRIVER
    # loop (collect each step's Q picks, re-plan the next step against a
    # temp view — ~10 sequential jobs, ~3 s of scheduling latency at
    # sf0.1 for µs of per-query work).  Each query's greedy depends only
    # on ITS ≤20 shortlist rows and their ≤20×19 pairwise sims, so the
    # whole selection is one cogrouped-map pass (guide §4.2: Spark does
    # the distribution, the kernel does the bounded per-group loop) —
    # fully distributed over queries, no driver round-trips, which is
    # also the shape that survives a large query set.  Arithmetic is
    # EXACT-integer and replays the SQL form bit-for-bit: pick 1's
    # score is Python floor-div (the old driver loop's `//`), later
    # steps use Spark `div` truncation toward zero for both the ranking
    # key and the reported score, ties break on lowest vec_id, and a
    # candidate enters a step only if it has a pairwise-sim row to at
    # least one picked vector (the old inner join's behavior).
    def _greedy(short_pdf, psim_pdf):
        import pandas as pd

        out = {
            "query_id": [],
            "pick_rank": [],
            "neighbor_id": [],
            "mmr_score_e6": [],
        }
        if len(short_pdf) == 0:
            return pd.DataFrame(out)
        q = int(short_pdf["query_id"].iloc[0])
        cand = {
            int(v): int(r)
            for v, r in zip(short_pdf["vec_id"], short_pdf["rel_e6"])
        }
        sim = {
            (int(a), int(b)): int(s)
            for a, b, s in zip(
                psim_pdf["id_a"], psim_pdf["id_b"], psim_pdf["sim_e6"]
            )
        }

        def sdiv10(x: int) -> int:  # Spark SQL `div`: trunc toward zero
            return -((-x) // 10) if x < 0 else x // 10

        first = max(cand.items(), key=lambda kv: (kv[1], -kv[0]))
        picked = [first[0]]
        out["query_id"].append(q)
        out["pick_rank"].append(1)
        out["neighbor_id"].append(first[0])
        out["mmr_score_e6"].append((lam * first[1]) // 10)
        for step in range(2, k + 1):
            best = None
            for v, rel in cand.items():
                if v in picked:
                    continue
                sims = [
                    sim[(v, p)] for p in picked if (v, p) in sim
                ]
                if not sims:
                    continue
                sc = sdiv10(lam * rel - (10 - lam) * max(sims))
                if best is None or (sc, -v) > (best[1], -best[0]):
                    best = (v, sc)
            if best is None:
                break
            picked.append(best[0])
            out["query_id"].append(q)
            out["pick_rank"].append(step)
            out["neighbor_id"].append(best[0])
            out["mmr_score_e6"].append(best[1])
        return pd.DataFrame(out)

    return (
        short.select("query_id", "vec_id", "rel_e6")
        .groupBy("query_id")
        .cogroup(psim.groupBy("query_id"))
        .applyInPandas(
            _greedy,
            "query_id bigint, pick_rank bigint, neighbor_id bigint,"
            " mmr_score_e6 bigint",
        )
    )


@query(
    "mmr_diversified_rerank",
    registered=False,  # driver-proven green in CORRECTNESS_r09; slot rotated (see catalog.py docstring)
    oracle=(
        lambda sl=_mmr_ivf_short_duck(),
        ps=_mmr_base_sql("duck")[1],
        st=_mmr_steps_sql("duck"): st.replace(
            "WITH ",
            f"WITH short AS ({sl}),\n    psim AS ({ps}),\n    ",
            1,
        )
    )(),
)
def q_mmr_diversified_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR-diversified top-5 per query over an INDEX-FED top-20
    shortlist: candidates come from the repo's own IVF path (map-only
    cell assignment + ratio-scaled probe cells + ONE cell_id equi-join
    — the ``hard_negative_mining_ivf_scaled`` machinery, labels
    dropped), then the greedy λ-tradeoff picks 5 of 20.  All scores are
    floored micro-cosines, so the greedy path is engine-exact.

    VERDICT r8's one weak mark closed at the cause: the previous form
    generated candidates with a brute Q×N query-broadcast cosine scan —
    fine for an audit, wrong for the production default whose relevance
    pass should ride the index.  No full-corpus scan remains on the
    relevance path; the shortlist's recall price is measured next door
    by ``mmr_shortlist_recall_audit``.

    Scale: assignment is zero-shuffle (packed-broadcast fold); the one
    relevance shuffle is the cell-bounded equi-join (candidates ≤
    nprobe × cell population, √n-scaled nlist doctrine); the greedy
    stage runs on Q×20 persisted rows with Q-row bounded collects."""
    _views(spark, sf_dir, "embeddings")
    return _mmr_greedy(spark, _mmr_ivf_short(spark, sf_dir))


@query(
    "mmr_shortlist_recall_audit",
    registered=False,  # driver-proven green in CORRECTNESS_r09; slot rotated (see catalog.py docstring)
    oracle=f"""
    WITH bshort AS ({_mmr_base_sql("duck")[0]}),
    ishort AS ({_mmr_ivf_short_duck()}),
    hit AS (
      SELECT b.query_id, count(*) AS n_hit
      FROM bshort b
      JOIN ishort i ON i.query_id = b.query_id AND i.vec_id = b.vec_id
      GROUP BY b.query_id
    ),
    base AS (SELECT query_id, count(*) AS n_brute FROM bshort
             GROUP BY query_id)
    SELECT base.query_id, CAST(base.n_brute AS BIGINT) AS n_brute,
      CAST(coalesce(hit.n_hit, 0) AS BIGINT) AS n_hit,
      CAST((coalesce(hit.n_hit, 0) * 1000000) // base.n_brute AS BIGINT)
        AS recall_ppm
    FROM base LEFT JOIN hit ON hit.query_id = base.query_id
    """,
)
def q_mmr_shortlist_recall_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Shortlist-recall meter for ``mmr_diversified_rerank``: per
    query, how much of the EXACT top-20 cosine shortlist (brute
    query-broadcast scan — this audit deliberately pays the full Q×N
    cost, like ``binary_rerank_recall_audit``) the IVF-fed shortlist
    recovered.  The brute pass lives HERE, priced as measurement, not
    inside the production query's relevance path (VERDICT r8 item 3).

    recall_ppm = ⌊1e6 · |ivf ∩ brute| / |brute|⌋ per query — the
    approximation's price as a recorded number, not a doctrine."""
    from pyspark.sql import functions as F

    _views(spark, sf_dir, "embeddings")
    brute = spark.sql(_mmr_base_sql("spark")[0]).select(
        "query_id", "vec_id"
    )
    ivf = _mmr_ivf_short(spark, sf_dir).select("query_id", "vec_id")
    base = brute.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_brute")
    )
    hit = (
        brute.join(ivf, ["query_id", "vec_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    return (
        base.join(hit, "query_id", "left")
        .select(
            "query_id",
            "n_brute",
            F.coalesce(F.col("n_hit"), F.lit(0))
            .cast("bigint")
            .alias("n_hit"),
            F.expr(
                "CAST((coalesce(n_hit, 0) * 1000000) div n_brute"
                " AS BIGINT)"
            ).alias("recall_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# fisher_exact_2x2
# ---------------------------------------------------------------------------

_FISHER_CONV_MIN = 17  # rarer than the bayes_ab 14 → c1 stays interior


def _fisher_sql(dialect: str) -> str:
    spark = dialect == "spark"

    def seq(n: str) -> str:
        return f"sequence(0, {n} - 1)" if spark else f"range(0, {n})"

    if spark:
        pmf0 = (
            f"aggregate(transform({seq('c1')}, j ->"
            " CAST(r2 - j AS DOUBLE) / CAST(nn - j AS DOUBLE)),"
            " CAST(1 AS DOUBLE), (acc, x) -> acc * x)"
        )
        walk = (
            f"aggregate(transform({seq('a')}, k ->"
            " (CAST(r1 - k AS DOUBLE) * CAST(c1 - k AS DOUBLE))"
            " / (CAST(k + 1 AS DOUBLE)"
            " * CAST(r2 - c1 + k + 1 AS DOUBLE))),"
            " p0, (acc, x) -> acc * x)"
        )
        tail = (
            "pa * aggregate(reverse(transform("
            "filter(sequence(a, kmax), k -> k < kmax), k ->"
            " (CAST(r1 - k AS DOUBLE) * CAST(c1 - k AS DOUBLE))"
            " / (CAST(k + 1 AS DOUBLE)"
            " * CAST(r2 - c1 + k + 1 AS DOUBLE)))),"
            " CAST(1 AS DOUBLE), (acc, r) -> CAST(1 AS DOUBLE) + r * acc)"
        )
    else:
        pmf0 = (
            f"list_reduce(list_prepend(1.0::DOUBLE, list_transform("
            f"{seq('c1')}, j -> (r2 - j)::DOUBLE / (nn - j)::DOUBLE)),"
            " (acc, x) -> acc * x)"
        )
        walk = (
            f"list_reduce(list_prepend(p0, list_transform({seq('a')},"
            " k -> ((r1 - k)::DOUBLE * (c1 - k)::DOUBLE)"
            " / ((k + 1)::DOUBLE * (r2 - c1 + k + 1)::DOUBLE))),"
            " (acc, x) -> acc * x)"
        )
        tail = (
            "pa * list_reduce(list_prepend(1.0::DOUBLE, list_reverse("
            "list_transform(list_filter(range(a, kmax + 1), k -> k < kmax),"
            " k -> ((r1 - k)::DOUBLE * (c1 - k)::DOUBLE)"
            " / ((k + 1)::DOUBLE * (r2 - c1 + k + 1)::DOUBLE)))),"
            " (acc, r) -> 1.0::DOUBLE + r * acc)"
        )
    return f"""
    WITH conv AS (
      SELECT user_id, CAST(user_id % 2 AS BIGINT) AS variant,
        CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             >= {_FISHER_CONV_MIN} THEN 1 ELSE 0 END AS c
      FROM events GROUP BY user_id
    ),
    st AS (
      SELECT
        CAST(sum(CASE WHEN variant = 1 THEN c ELSE 0 END) AS BIGINT) AS a,
        CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS r1,
        CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS r2,
        CAST(sum(c) AS BIGINT) AS c1,
        CAST(count(*) AS BIGINT) AS nn
      FROM conv
    ),
    lim AS (
      SELECT a, r1, r2, c1, nn,
        CASE WHEN r1 < c1 THEN r1 ELSE c1 END AS kmax
      FROM st
    ),
    w0 AS (SELECT *, {pmf0} AS p0 FROM lim),
    w1 AS (SELECT *, {walk} AS pa FROM w0),
    p AS (SELECT *, {tail} AS ptail FROM w1)
    SELECT a AS heavy_in_b, r1 AS n_b, r2 AS n_a, c1 AS heavy_total,
      CAST(floor(1000000 * ptail) AS BIGINT) AS p_one_sided_e6,
      ptail < 0.05 AS reject_at_5pct
    FROM p
    """


@query(
    "fisher_exact_2x2",
    registered=False,  # driver-proven green in CORRECTNESS_r09; slot rotated (see catalog.py docstring)
    oracle=_fisher_sql("duck"),
)
def q_fisher_exact_2x2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided Fisher exact p-value P(X ≥ a) for the variant ×
    heavy-purchaser table: pmf(0) as a product fold over the
    second-margin terms, a walk-up product to pmf(a), and the
    hypergeometric tail Horner-folded over the reversed likelihood
    ratios rₖ = (r₁−k)(c₁−k)/((k+1)(r₂−c₁+k+1)) — the bayes_ab scalar
    fold device, IEEE-fixed-order ×/÷/+ only, bit-identical across
    engines.  Requires the table interior (c₁ ≤ r₂; the ≥17 threshold
    keeps the success margin ≈ quarter of users at every sf).

    Scale: one per-user groupBy; the folds run on ONE row over
    success-count-sized arrays — O(successes), no lgamma, no RNG."""
    _views(spark, sf_dir, "events")
    return spark.sql(_fisher_sql("spark"))


# ---------------------------------------------------------------------------
# hurst_exponent
# ---------------------------------------------------------------------------

_HURST_WINDOWS = (16, 32, 64, 128)


def _hurst_sql(dialect: str) -> str:
    spark = dialect == "spark"
    big = "DECIMAL(38,0)" if spark else "HUGEINT"
    div = " div " if spark else " // "
    ws = ", ".join(
        f"({w})" for w in _HURST_WINDOWS
    )
    wtab = (
        f"SELECT w FROM (VALUES {ws}) AS t(w)"
        if not spark
        else "SELECT w FROM VALUES " + ws + " AS t(w)"
    )
    hint = "/*+ BROADCAST(wt) */ " if spark else ""
    return f"""
    WITH {_day_sql(dialect)},
    idx AS (
      SELECT CAST(row_number() OVER (ORDER BY t) AS BIGINT) AS i, y
      FROM day
    ),
    blocks AS (
      SELECT {hint}wt.w, (idx.i - 1){div}wt.w AS b, idx.i, idx.y
      FROM idx CROSS JOIN ({wtab}) wt
    ),
    bstat AS (
      SELECT w, b, CAST(count(*) AS BIGINT) AS cnt,
        CAST(sum(y) AS BIGINT) AS s,
        CAST(sum(CAST(y AS {big}) * y) AS {big}) AS q
      FROM blocks GROUP BY w, b
    ),
    fullb AS (SELECT * FROM bstat WHERE cnt = w),
    cum AS (
      SELECT bl.w, bl.b,
        sum(bl.w * bl.y - fb.s) OVER (
          PARTITION BY bl.w, bl.b ORDER BY bl.i
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cd,
        fb.s AS s, fb.q AS q
      FROM blocks bl JOIN fullb fb ON fb.w = bl.w AND fb.b = bl.b
    ),
    rs AS (
      SELECT w, b,
        CAST(floor(1000000 * (max(cd) - min(cd))
          / sqrt(CAST(max(q) * w - CAST(max(s) AS {big}) * max(s)
                      AS DOUBLE))) AS BIGINT) AS rs_e6
      FROM cum GROUP BY w, b
    ),
    pts AS (
      SELECT w, CAST(floor(1000000 * ln(CAST(w AS DOUBLE))) AS BIGINT) AS x,
        CAST(floor(1000000 * ln(
          CAST(sum(rs_e6){div}count(*) AS DOUBLE) / 1000000e0)) AS BIGINT)
          AS yv,
        CAST(count(*) AS BIGINT) AS n_blocks
      FROM rs GROUP BY w
    ),
    fit AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
        CAST(sum(x) AS BIGINT) AS sx, CAST(sum(yv) AS BIGINT) AS sy,
        CAST(sum(CAST(x AS {big}) * x) AS {big}) AS sxx,
        CAST(sum(CAST(x AS {big}) * yv) AS {big}) AS sxy
      FROM pts
    )
    SELECT k AS n_window_sizes,
      CAST(((k * sxy - CAST(sx AS {big}) * sy) * 1000000)
           {div}(k * sxx - CAST(sx AS {big}) * sx) AS BIGINT)
        AS hurst_ppm,
      ((k * sxy - CAST(sx AS {big}) * sy) * 1000000)
        {div}(k * sxx - CAST(sx AS {big}) * sx) > 500000
        AS persistent_memory
    FROM fit
    """


@query(
    "hurst_exponent",
    registered=False,  # driver-proven green in CORRECTNESS_r09; slot rotated (see catalog.py docstring)
    oracle=_hurst_sql("duck"),
)
def q_hurst_exponent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent of daily revenue by R/S analysis: for each
    dyadic window size w ∈ {16..128}, full blocks of w consecutive
    days get their rescaled range R/S = range(cumdev)/√(w·Σy²−S²)
    — range(cumdev) carries the cross-multiplied deviations w·y−S, so
    it equals w·R, and √(w·Σy²−S²) = w·σ: the w factors cancel and the
    quotient is the classic R/σ (a spurious extra √w here would bias
    the ln-ln slope to H+½ — ADVICE r8, fixed at source).  One sqrt per
    block — sqrt is IEEE correctly-rounded and the radicands are EXACT
    integers — floored to ppm PER BLOCK before the
    cross-block mean (float accumulation across partitions is
    order-dependent; integer sums are not), then H = the exact-integer
    OLS slope of floored ln(mean R/S) on ln(w).

    Scale: block machinery is windows PARTITIONED by (w, block); the
    day frame is calendar-bounded; the ln/OLS stage sees 4 rows."""
    _views(spark, sf_dir, "orders")
    return spark.sql(_hurst_sql("spark"))


# ---------------------------------------------------------------------------
# partial_correlation_triples
# ---------------------------------------------------------------------------


def _pcorr_sql(dialect: str) -> str:
    spark = dialect == "spark"
    big = "DECIMAL(38,0)" if spark else "HUGEINT"
    div = " div " if spark else " // "
    dd = (
        "datediff(l_shipdate, (SELECT min(l_shipdate) FROM lineitem))"
        if spark
        else "datediff('day', (SELECT min(l_shipdate) FROM lineitem),"
        " l_shipdate)"
    )

    def corr(u: str, v: str) -> str:
        """floor(1e6·corr) via sqrt of exact integer dispersions."""
        return (
            f"CAST(floor(1000000 * CAST(n * s_{u}{v}"
            f" - CAST(s_{u} AS {big}) * s_{v} AS DOUBLE)"
            f" / (sqrt(CAST(n * s_{u}{u} - CAST(s_{u} AS {big}) * s_{u}"
            f" AS DOUBLE)) * sqrt(CAST(n * s_{v}{v}"
            f" - CAST(s_{v} AS {big}) * s_{v} AS DOUBLE)))) AS BIGINT)"
        )

    def partial(xy: str, xz: str, yz: str) -> str:
        """1e6-scaled partial corr numerator and squared form from the
        three ppm marginals (exact integers after the floors)."""
        return (
            f"CAST((CAST(r_{xy} AS {big}) * 1000000"
            f" - CAST(r_{xz} AS {big}) * r_{yz}){div}1000000 AS BIGINT)"
        )

    return f"""
    WITH d AS (
      SELECT CAST({dd} AS BIGINT) AS t,
        CAST(count(*) AS BIGINT) AS x,
        CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
             AS BIGINT){div}100000 AS y,
        CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) AS z
      FROM lineitem GROUP BY 1
    ),
    st AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
        CAST(sum(x) AS BIGINT) AS s_x, CAST(sum(y) AS BIGINT) AS s_y,
        CAST(sum(z) AS BIGINT) AS s_z,
        CAST(sum(CAST(x AS {big}) * x) AS {big}) AS s_xx,
        CAST(sum(CAST(y AS {big}) * y) AS {big}) AS s_yy,
        CAST(sum(CAST(z AS {big}) * z) AS {big}) AS s_zz,
        CAST(sum(CAST(x AS {big}) * y) AS {big}) AS s_xy,
        CAST(sum(CAST(x AS {big}) * z) AS {big}) AS s_xz,
        CAST(sum(CAST(y AS {big}) * z) AS {big}) AS s_yz
      FROM d
    ),
    r AS (
      SELECT n, {corr("x", "y")} AS r_xy, {corr("x", "z")} AS r_xz,
        {corr("y", "z")} AS r_yz
      FROM st
    )
    SELECT 'orders_revenue_given_discount' AS pair, n AS n_days,
      r_xy AS marginal_ppm, {partial("xy", "xz", "yz")} AS partial_num_ppm,
      CAST(((CAST(r_xy AS {big}) * 1000000 - CAST(r_xz AS {big}) * r_yz)
        * (CAST(r_xy AS {big}) * 1000000 - CAST(r_xz AS {big}) * r_yz))
        {div}(((1000000000000 - CAST(r_xz AS {big}) * r_xz)
          {div}1000000)
          * ((1000000000000 - CAST(r_yz AS {big}) * r_yz){div}1000000))
        {div}1000000 AS BIGINT) AS partial_r2_ppm
    FROM r
    UNION ALL
    SELECT 'orders_discount_given_revenue', n, r_xz,
      {partial("xz", "xy", "yz")},
      CAST(((CAST(r_xz AS {big}) * 1000000 - CAST(r_xy AS {big}) * r_yz)
        * (CAST(r_xz AS {big}) * 1000000 - CAST(r_xy AS {big}) * r_yz))
        {div}(((1000000000000 - CAST(r_xy AS {big}) * r_xy)
          {div}1000000)
          * ((1000000000000 - CAST(r_yz AS {big}) * r_yz){div}1000000))
        {div}1000000 AS BIGINT)
    FROM r
    UNION ALL
    SELECT 'revenue_discount_given_orders', n, r_yz,
      {partial("yz", "xy", "xz")},
      CAST(((CAST(r_yz AS {big}) * 1000000 - CAST(r_xy AS {big}) * r_xz)
        * (CAST(r_yz AS {big}) * 1000000 - CAST(r_xy AS {big}) * r_xz))
        {div}(((1000000000000 - CAST(r_xy AS {big}) * r_xy)
          {div}1000000)
          * ((1000000000000 - CAST(r_xz AS {big}) * r_xz){div}1000000))
        {div}1000000 AS BIGINT)
    FROM r
    """


@query(
    "partial_correlation_triples",
    registered=False,  # driver-proven green in CORRECTNESS_r09; slot rotated (see catalog.py docstring)
    oracle=_pcorr_sql("duck"),
)
def q_partial_correlation_triples(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Partial correlations for the daily (order count, revenue,
    discount volume) triple: one 9-sum aggregation gives the three
    ppm-floored marginal correlations (sqrt only of EXACT integer
    dispersions), then each pair's third-variable-partialled r² comes
    out by pure integer cross-multiplication of those three floored
    values — r²ₓᵧ.ᵤ = (rₓᵧ−rₓᵤrᵧᵤ)²/((1−rₓᵤ²)(1−rᵧᵤ²)).  The signed
    numerator rides along at 1e3 scale.  ``correlation_matrix`` stops
    at marginals; this is the direct-vs-mediated decomposition.

    Scale: one scan, one aggregation, three constant-width rows."""
    _views(spark, sf_dir, "lineitem")
    return spark.sql(_pcorr_sql("spark"))


# ---------------------------------------------------------------------------
# bartlett_test
# ---------------------------------------------------------------------------

#: floor(1e6 · χ²(df=4, α=0.05)) — 5 regions
_BARTLETT_CHI2_E6 = 9_487_729


def _bartlett_sql(dialect: str) -> str:
    spark = dialect == "spark"
    big = "DECIMAL(38,0)" if spark else "HUGEINT"
    div = " div " if spark else " // "
    return f"""
    WITH o AS (
      SELECT r.r_name AS grp,
        CAST(round(ord.o_totalprice * 100) AS BIGINT){div}1000 AS v
      FROM orders ord
      JOIN customer c ON c.c_custkey = ord.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
    ),
    g AS (
      SELECT grp, CAST(count(*) AS BIGINT) AS n,
        CAST(sum(v) AS BIGINT) AS s,
        CAST(sum(CAST(v AS {big}) * v) AS {big}) AS q
      FROM o GROUP BY grp
    ),
    gi AS (
      SELECT grp, n,
        -- (n-1)·ln(s_i²) with s_i² = (n·q − s²)/(n(n−1)): per-term
        -- floored micro-nats (woe_iv device).  Round-11 fix (caught
        -- by tools/stat_audit.py): the divisor was n·n·(n−1) — i.e.
        -- ln(s_i²/n) — inflating the statistic by Σ(nᵢ−1)ln(nᵢ) and
        -- forcing reject=true; both engines shared it, so parity was
        -- green (the gumbel √n class).
        (n - 1) * CAST(floor(1000000 * ln(
          CAST(n * q - CAST(s AS {big}) * s AS DOUBLE)
          / CAST(CAST(n AS {big}) * (n - 1) AS DOUBLE))) AS BIGINT)
          AS term_e6,
        CAST(n * q - CAST(s AS {big}) * s AS {big}) AS disp,
        n - 1 AS dof
      FROM g
    ),
    pool AS (
      SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(count(*) AS BIGINT) AS k,
        CAST(sum(term_e6) AS BIGINT) AS sum_terms_e6,
        -- (nᵢ−1)·sᵢ² = dispᵢ/nᵢ, so s_p²·(N−k) = Σ dispᵢ/nᵢ
        CAST(sum(disp{div}n) AS {big}) AS pooled_num,
        CAST(sum(n - 1) AS BIGINT) AS dof_tot
      FROM gi
    ),
    stat AS (
      SELECT nn, k, dof_tot,
        dof_tot * CAST(floor(1000000 * ln(
          CAST(pooled_num AS DOUBLE) / CAST(dof_tot AS DOUBLE)))
          AS BIGINT) - sum_terms_e6 AS num_e6
      FROM pool
    )
    SELECT nn AS n_total, k AS k_groups, num_e6 AS bartlett_raw_e6,
      num_e6 > {_BARTLETT_CHI2_E6} AS reject_equal_variance_uncorrected
    FROM stat
    """


@query(
    "bartlett_test",
    registered=False,  # driver-proven green in CORRECTNESS_r09; slot rotated (see catalog.py docstring)
    oracle=_bartlett_sql("duck"),
)
def q_bartlett_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bartlett's variance-homogeneity statistic for order values ($10
    units) across the 5 regions: (N−k)·ln(s_p²) − Σ(nᵢ−1)ln(sᵢ²) with
    every logarithm floored to micro-nats per term (woe_iv device) and
    the variance RATIOS formed from exact integer dispersions before
    the single double division each.  At these group sizes the
    correction factor C = 1 + (Σ1/(nᵢ−1) − 1/(N−k))/(3(k−1)) is
    1 + O(1e−4), so the uncorrected statistic is reported and gated —
    documented, engine-identical.  ``levene_test``/
    ``ansari_bradley`` are the robust members; Bartlett is the
    normal-theory power member (pair with ``jarque_bera_test``).

    Scale: one aggregation to 5 rows behind broadcast dim joins."""
    _views(spark, sf_dir, "orders", "customer", "nation", "region")
    return spark.sql(_bartlett_sql("spark"))
