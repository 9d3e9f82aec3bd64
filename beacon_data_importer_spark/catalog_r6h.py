"""Round-6 catalog tier (h): LLM-evaluation estimators on paired /
repeated-trial data —

* ``pass_at_k_estimate`` — the unbiased pass@k estimator
  (1 − C(n−c, k)/C(n, k), Chen et al. 2021, arXiv:2107.03374) over
  per-task repeated trials: the metric every code/reasoning eval
  reports, computed as an exact integer product with one floor per
  factor (k unrolled literal steps — no binomials, no floats).
* ``bradley_terry_rating`` — Bradley-Terry strengths for the 25
  supplier nations from within-order lineitem price comparisons
  ("which nation's line won this order?"), fit by 3 unrolled
  minorization-maximization iterations in exact ppm and normalized to
  a fixed total — the paired-comparison model behind every
  chat-arena-style leaderboard, reduced to its relational core: a
  bounded dense win matrix and an iteration that is constant work.
* ``preference_cycle_audit`` — transitivity audit of the SAME win
  matrix: count ordered triads whose majority orientations form a
  cycle (i beats j beats k beats i).  Bradley-Terry ASSUMES a total
  order; this measures how badly the data violates it — the pairwise-
  preference quality gate an RLHF data pipeline runs before fitting
  reward models.

Reference parity: beyond-reference evaluation tiers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import query
from .sources.parquet import read_table

_DEC = "decimal(38,0)"

# ---------------------------------------------------------------------------
# pass_at_k_estimate
# ---------------------------------------------------------------------------

_PAK_K = 5


def _pak_sql(dialect: str) -> str:
    div = " div " if dialect == "spark" else " // "
    # fail_ppm = 1e6 · Π_{i=0..k-1} (n-c-i)/(n-i), floored per factor;
    # a factor with n-c-i <= 0 zeroes the product (some success in
    # every k-subset).
    prod = "1000000"
    for i in range(_PAK_K):
        prod = (
            f"(CASE WHEN n - c - {i} <= 0 THEN 0 ELSE"
            f" ({prod}) * (n - c - {i}) {div} (n - {i}) END)"
        )
    return f"""
    WITH trials AS (
      SELECT user_id AS task,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS c
      FROM events GROUP BY user_id
    ),
    eligible AS (SELECT * FROM trials WHERE n >= {_PAK_K}),
    per_task AS (
      SELECT task, n, c,
             CAST(1000000 - {prod} AS BIGINT) AS pass_ppm
      FROM eligible
    )
    SELECT CAST(count(*) AS BIGINT) AS n_tasks,
           CAST(sum(pass_ppm) {div} count(*) AS BIGINT)
             AS mean_pass_at_k_ppm,
           CAST(sum(CASE WHEN c = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_zero_success,
           CAST(sum(CASE WHEN pass_ppm = 1000000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_certain,
           CAST(min(pass_ppm) AS BIGINT) AS min_pass_ppm,
           CAST(max(pass_ppm) AS BIGINT) AS max_pass_ppm
    FROM per_task
    """


@query(
    "pass_at_k_estimate",
    registered=False,  # driver-proven green in CORRECTNESS_r07; slot rotated (see catalog.py docstring)
    oracle=_pak_sql("duck"),
)
def q_pass_at_k_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pass@{k} over repeated trials: each user is a task, their events
    the trials, a purchase a success — the estimator is the unbiased
    1 − C(n−c,{k})/C(n,{k}) computed as Π (n−c−i)/(n−i) with one
    truncating division per factor ({k} unrolled literal steps), so no
    engine ever evaluates a binomial coefficient or a float.  A task
    with fewer than {k} successes short of {k} trials zeroes a factor
    — pass@k = 1 exactly, matching the combinatorial definition.
    Tasks with n < {k} are excluded (the estimator is undefined
    there), and their exclusion is identical in both engines.

    This is the canonical LLM code/reasoning eval reduction: one
    map-side-combined aggregate to (task, n, c), constant work per
    task after that — at 100 TB of eval logs the whole metric is one
    shuffle on task id.

    Reference parity: beyond-reference evaluation tier."""
    read_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_pak_sql("spark"))


q_pass_at_k_estimate.__doc__ = (q_pass_at_k_estimate.__doc__ or "").format(
    k=_PAK_K
)


# ---------------------------------------------------------------------------
# shared within-order nation win matrix (bradley_terry + cycle audit)
# ---------------------------------------------------------------------------

# (l_orderkey, l_linenumber) is NOT unique in this testdata (6000 rows,
# 4599 distinct keys at sf0.001) — a plain a.ln < b.ln pair condition
# silently dropped every same-ln duel (measured: every win count ~15%
# low).  The pair condition is strict LEXICOGRAPHIC order on
# (ln, suppkey, partkey, price): total for any two lines that could
# form a duel (full ties imply the same supplier, hence the same
# nation, which the nat <> nat conjunct excludes anyway).
_BT_PAIR_LT = (
    "(a.ln < b.ln OR (a.ln = b.ln AND (a.sk < b.sk OR (a.sk = b.sk"
    " AND (a.pk < b.pk OR (a.pk = b.pk AND a.p < b.p))))))"
)

_BT_MATCHES_SQL = f"""
    matches AS (
      SELECT a.nat AS i, b.nat AS j,
             CAST(sum(CASE WHEN a.p > b.p THEN 1 ELSE 0 END) AS BIGINT)
               AS w_ij,
             CAST(sum(CASE WHEN b.p > a.p THEN 1 ELSE 0 END) AS BIGINT)
               AS w_ji
      FROM lines a JOIN lines b
        ON a.ok = b.ok AND {_BT_PAIR_LT} AND a.nat <> b.nat
      GROUP BY a.nat, b.nat
    ),
    pairs AS (
      SELECT least(i, j) AS i, greatest(i, j) AS j,
             CAST(sum(CASE WHEN i < j THEN w_ij ELSE w_ji END) AS BIGINT)
               AS wins_i,
             CAST(sum(CASE WHEN i < j THEN w_ji ELSE w_ij END) AS BIGINT)
               AS wins_j
      FROM matches GROUP BY least(i, j), greatest(i, j)
    )
"""

_BT_LINES_SQL = """
    lines AS (
      SELECT l.l_orderkey AS ok, l.l_linenumber AS ln,
             l.l_suppkey AS sk, l.l_partkey AS pk,
             s.s_nationkey AS nat,
             CAST(round(l.l_extendedprice * 100) AS BIGINT) AS p
      FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
    )
"""

_BT_ITERS = 3
_BT_TOTAL = 25_000_000  # normalized rating mass: 25 nations × 1e6


def _bt_sql(dialect: str) -> str:
    """DuckDB-only since the round-6 perf fix (the Spark side runs the
    iterations as materialized DataFrame steps); every multiply-
    referenced CTE is AS MATERIALIZED — DuckDB otherwise re-inlines
    them and the iteration chain re-evaluates the pair expansion
    3^iters times (measured 8.2 s at sf0.001 → 0.3 s materialized)."""
    big = "DECIMAL(38,0)" if dialect == "spark" else "HUGEINT"
    div = " div " if dialect == "spark" else " // "
    mat = "" if dialect == "spark" else " MATERIALIZED"
    steps = []
    prev = "r0"
    for it in range(1, _BT_ITERS + 1):
        cur = f"r{it}"
        steps.append(
            f"""
    {cur}_raw AS{mat} (
      SELECT t.nat,
             CAST(CAST(t.wins AS {big}) * 1000000000000
                  {div} sum(CAST(g.games AS {big}) * 1000000000000
                            {div} (ri.r + rj.r))
                  AS BIGINT) AS r
      FROM teams t
      JOIN games g ON g.i = t.nat
      JOIN {prev} ri ON ri.nat = g.i
      JOIN {prev} rj ON rj.nat = g.j
      GROUP BY t.nat, t.wins
    ),
    {cur} AS{mat} (
      SELECT nat,
             CAST(CAST(r AS {big}) * {_BT_TOTAL}
                  {div} (SELECT sum(r) FROM {cur}_raw) AS BIGINT) AS r
      FROM {cur}_raw
    )"""
        )
        prev = cur
    chain = ",".join(steps)
    return f"""
    WITH {_BT_LINES_SQL},{_BT_MATCHES_SQL},
    games_dir AS{mat} (
      SELECT i, j, wins_i, wins_j FROM pairs
    ),
    games AS{mat} (
      SELECT i, j, CAST(wins_i + wins_j AS BIGINT) AS games
      FROM games_dir
      UNION ALL
      SELECT j AS i, i AS j, CAST(wins_i + wins_j AS BIGINT) AS games
      FROM games_dir
    ),
    teams AS{mat} (
      SELECT i AS nat, CAST(sum(w) AS BIGINT) AS wins
      FROM (
        SELECT i, wins_i AS w FROM games_dir
        UNION ALL
        SELECT j AS i, wins_j AS w FROM games_dir
      ) t GROUP BY i
    ),
    r0 AS (SELECT nat, CAST(1000000 AS BIGINT) AS r FROM teams),{chain}
    SELECT CAST(t.nat AS BIGINT) AS nation,
           t.wins,
           CAST(sum(g.games) AS BIGINT) AS games,
           rf.r AS rating_ppm
    FROM teams t
    JOIN games g ON g.i = t.nat
    JOIN {prev} rf ON rf.nat = t.nat
    GROUP BY t.nat, t.wins, rf.r
    ORDER BY t.nat
    """


@query(
    "bradley_terry_rating",
    registered=False,  # driver-proven green in CORRECTNESS_r07; slot rotated (see catalog.py docstring)
    oracle=_bt_sql("duck"),
)
def q_bradley_terry_rating(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley-Terry paired-comparison strengths for supplier nations,
    from within-order lineitem price duels (higher extended price wins
    the matchup; ties are no-contests).

    The MM update rᵢ ← Wᵢ / Σⱼ gᵢⱼ/(rᵢ+rⱼ) runs {it} unrolled
    iterations in exact ppm — each Σⱼ term floored once (e12 scaling
    keeps precision), each iterate renormalized to a fixed total mass
    so ratings are comparable across engines and iterations — on the
    dense ≤25×25 nation matrix, i.e. CONSTANT work after the one
    volume-bearing aggregate (the within-order pair expansion, C(L,2)
    pairs per order — L ≤ 17 in this testdata, and
    tools/bt_width_probe.py measured the expansion safe through
    L ≈ 500 with the O(L·N) running-count rewrite as the documented
    escape hatch beyond; test_bt_pair_width_bound guards the band).

    EXECUTION NOTE (measured): the iterations run as DataFrame steps
    with the win matrix AND each 25-row iterate localCheckpointed —
    expressing them as chained CTEs re-evaluated the whole pair
    expansion 3^{it} times in Spark (CTEs are not materialized;
    r_i references r_{{i-1}} three times), 36 s at sf0.001 vs ~2 s
    materialized.  DuckDB's oracle keeps the chained-CTE text (it
    materializes multiply-referenced CTEs); values are identical.

    This is the chat-arena leaderboard model reduced to its relational
    core; ``preference_cycle_audit`` measures how transitive the same
    duels actually are.

    Reference parity: beyond-reference evaluation tier."""
    for t in ("lineitem", "supplier"):
        read_table(spark, sf_dir, t).createOrReplaceTempView(t)
    big = _DEC
    # r11 optimization round: the MM loop ran as ~12 driver-dispatched
    # Spark jobs (one localCheckpoint per 25-row iterate) — pure
    # scheduling latency for CONSTANT-size work.  The volume-bearing
    # pair expansion stays in Spark; the ≤N(N−1) directed win matrix is
    # collected ONCE (bounded by nations², a constant) and the {it}
    # MM iterations run in driver Python with the identical all-integer
    # arithmetic (every operand positive, so Python // == SQL div) —
    # value-identical to the old per-iterate SQL, oracle-verified.
    base_rows = spark.sql(
        f"WITH {_BT_LINES_SQL},{_BT_MATCHES_SQL}"
        " SELECT i, j, wins_i, wins_j FROM pairs"
    ).collect()
    games: dict[tuple[int, int], int] = {}
    wins: dict[int, int] = {}
    for row in base_rows:
        i, j, wi, wj = int(row.i), int(row.j), int(row.wins_i), int(row.wins_j)
        g = wi + wj
        games[(i, j)] = games.get((i, j), 0) + g
        games[(j, i)] = games.get((j, i), 0) + g
        wins[i] = wins.get(i, 0) + wi
        wins[j] = wins.get(j, 0) + wj
    opp: dict[int, list[int]] = {}
    for (i, j) in games:
        opp.setdefault(i, []).append(j)
    r = {nat: 1_000_000 for nat in wins}
    for _ in range(_BT_ITERS):
        raw = {
            nat: (wins[nat] * 1_000_000_000_000)
            // sum(
                (games[(nat, j)] * 1_000_000_000_000) // (r[nat] + r[j])
                for j in opp[nat]
            )
            for nat in wins
        }
        tot = sum(raw.values())
        r = {nat: (v * _BT_TOTAL) // tot for nat, v in raw.items()}
    out = [
        (nat, wins[nat], sum(games[(nat, j)] for j in opp[nat]), r[nat])
        for nat in sorted(wins)
    ]
    return spark.createDataFrame(
        out, "nation bigint, wins bigint, games bigint, rating_ppm bigint"
    )


q_bradley_terry_rating.__doc__ = (q_bradley_terry_rating.__doc__ or "").format(
    it=_BT_ITERS
)


# ---------------------------------------------------------------------------
# preference_cycle_audit
# ---------------------------------------------------------------------------

def _cycle_sql(dialect: str) -> str:
    div = " div " if dialect == "spark" else " // "
    return f"""
    WITH {_BT_LINES_SQL},{_BT_MATCHES_SQL},
    oriented AS (
      SELECT i, j FROM pairs WHERE wins_i > wins_j
      UNION ALL
      SELECT j AS i, i AS j FROM pairs WHERE wins_j > wins_i
    ),
    triads AS (
      SELECT e1.i AS a, e1.j AS b, e2.j AS c
      FROM oriented e1
      JOIN oriented e2 ON e2.i = e1.j
    ),
    paths AS (
      SELECT t.a, t.b, t.c,
             CASE WHEN e3.i = t.c THEN 1 ELSE 0 END AS cyclic,
             CASE WHEN e3.i = t.a THEN 1 ELSE 0 END AS transitive
      FROM triads t
      JOIN oriented e3
        ON least(e3.i, e3.j) = least(t.a, t.c)
       AND greatest(e3.i, e3.j) = greatest(t.a, t.c)
    ),
    -- a cyclic triangle is reached by a->b->c paths from every
    -- rotation, a transitive one only from its source vertex: dedup
    -- on the UNORDERED triple (each triangle counted exactly once;
    -- cyclic/transitive is a property of the triangle so max() of
    -- either flag over its paths is well-defined and exclusive)
    closed AS (
      SELECT least(a, least(b, c)) AS lo,
             a + b + c - least(a, least(b, c))
                       - greatest(a, greatest(b, c)) AS mid,
             greatest(a, greatest(b, c)) AS hi,
             max(cyclic) AS cyclic,
             max(transitive) AS transitive
      FROM paths GROUP BY 1, 2, 3
    )
    SELECT CAST(count(*) AS BIGINT) AS n_closed_triads,
           CAST(sum(cyclic) AS BIGINT) AS n_cyclic,
           CAST(sum(transitive) AS BIGINT) AS n_transitive,
           CAST(sum(cyclic) * 1000000 {div} count(*) AS BIGINT)
             AS cyclic_ppm
    FROM closed
    """


@query(
    "preference_cycle_audit",
    registered=False,  # driver-proven green in CORRECTNESS_r07; slot rotated (see catalog.py docstring)
    oracle=_cycle_sql("duck"),
)
def q_preference_cycle_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitivity audit of the majority-win preference digraph that
    ``bradley_terry_rating`` fits: a→b when a won the majority of
    within-order price duels against b; a triad a→b→c is CYCLIC when c
    also beats a, TRANSITIVE when a beats c.  cyclic_ppm is the
    fraction of closed triads that violate the total-order assumption
    every paired-comparison model (BT, Elo) silently makes — the data-
    quality gate an RLHF preference pipeline runs before fitting
    reward models: high cyclicity means the 'preferences' are noise or
    multi-dimensional, and no scalar rating will honor them.

    The walk is two self-joins over the ≤300-edge majority digraph
    (25 nations); the closing edge joins on the CANONICAL pair key
    (least, greatest) so it stays an equi-join — the naive
    OR-of-directions condition planned as a CartesianProduct, which
    the whole-catalog plan guard (test_all_catalog_plans_stay_jvm_side)
    rejected; harmless at 300 edges, a scale-killer on a real
    preference graph.  Triads dedup on the unordered triple (a cyclic
    triangle is reachable from every rotation).

    Reference parity: beyond-reference evaluation tier."""
    for t in ("lineitem", "supplier"):
        read_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_cycle_sql("spark"))
