"""Iterative graph operators: connected components via min-label
propagation (entity-resolution clustering over a fuzzy-match pair graph,
SURVEY §7.5 extension — the cluster-and-survivor step downstream of the
reference's exact nhs_number matching, sql/import_identified_needs.sql).

Spark-first shape: one DataFrame join + partial agg per iteration, a
FIXED iteration count so the computation is deterministic (and therefore
SQL-oracle-expressible by unrolling the same iterations as a CTE chain).
Each iteration's labels frame is persisted: it is consumed twice (the
neighbor join and the final ``least``), and persisting truncates the
otherwise-doubling lineage.

At 100 TB you would (a) localCheckpoint every few iterations to cut
lineage for real, and (b) switch from plain neighbor-min propagation to
the large-star/small-star formulation (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14) whose round count is
O(log n) instead of graph diameter.  The per-round dataflow — join
labels to edges, min-aggregate on the vertex key — is identical to this
one, so the operator's plan shape is already the scale shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def symmetrize(pairs: DataFrame, a: str = "a", b: str = "b") -> DataFrame:
    """Undirected pair list (a < b) → both-direction edge list."""
    fwd = pairs.select(F.col(a).alias("src"), F.col(b).alias("dst"))
    rev = pairs.select(F.col(b).alias("src"), F.col(a).alias("dst"))
    return fwd.unionByName(rev)


def min_label_propagation(edges: DataFrame, iters: int) -> DataFrame:
    """Connected-component labels after ``iters`` rounds of neighbor-min
    propagation over a symmetric ``(src, dst)`` edge list.

    label0(v) = v; label_t(v) = min(label_{t-1}(v),
                                    min over neighbors u of label_{t-1}(u)).

    Vertices are those that appear in at least one edge (isolated rows
    have no pairs to cluster).  Returns ``(v, lbl)``.  After enough
    rounds (graph diameter) ``lbl`` is the component's minimum vertex
    id; a fixed smaller count is still deterministic — callers that need
    full convergence pick ``iters`` ≥ diameter.
    """
    # Self-loops fold the "keep your own label" term into the neighbor
    # min, so one iteration is join + min-aggregate (2 shuffles) instead
    # of join + aggregate + join-back (3) — measured ~25% faster at
    # sf0.1 and one fewer barrier per round on a cluster.
    # localCheckpoint, NOT persist: the self-loop union below references
    # this frame in two branches (directly, and through verts), and the
    # union's expr-id deduplication rewrites one branch so it no longer
    # matches the cached plan's canonical form — with persist the edge
    # generation (the expensive fuzzy-pair join) silently re-ran inside
    # the union materialization (measured +8 s at sf0.1).  Checkpointing
    # truncates lineage, so recompute is impossible by construction.  On
    # a real cluster use reliable checkpoint storage for fault tolerance.
    edges = edges.localCheckpoint()
    verts = edges.select(F.col("src").alias("v")).distinct().persist()
    loops = verts.select(F.col("v").alias("src"), F.col("v").alias("dst"))
    edges = edges.unionByName(loops).persist()
    labels = verts.withColumn("lbl", F.col("v"))
    # No per-iteration persist: with self-loops each labels frame is
    # consumed exactly once by the next round, so caching would only add
    # materialization cost.  (At 100 TB you'd localCheckpoint every few
    # rounds purely to truncate lineage.)
    for _ in range(iters):
        labels = (
            labels.join(edges, labels["v"] == edges["dst"])
            .groupBy(F.col("src").alias("v"))
            .agg(F.min("lbl").alias("lbl"))
        )
    return labels


def connected_components(
    edges: DataFrame,
    max_rounds: int = 40,
    work_dir: str | None = None,
    mem_rounds: int = 8,
) -> DataFrame:
    """FULLY-CONVERGED connected components: every vertex labeled with
    its component's minimum vertex id, in O(log n) rounds instead of
    graph diameter.

    Each round does neighbor-min propagation (as min_label_propagation)
    PLUS pointer jumping — ``lbl'(v) = lbl(lbl(v))`` — so label chains
    halve every round (the doubling idea behind hash-to-min /
    large-star–small-star: Rastogi et al. ICDE'13, Kiveris et al.
    SoCC'14).  A long path that needs ``diameter`` neighbor-min rounds
    converges in ~log2(diameter) doubled rounds.

    Convergence detection without a per-round join: labels only ever
    decrease, so ``sum(lbl)`` is strictly monotone until the fixpoint —
    one cheap scalar agg per round (a driver round-trip per iteration is
    inherent to iterate-until-converged; the payload is one value, never
    rows).  ``max_rounds`` bounds the loop defensively.

    Each round's labels are MATERIALIZED — the first ``mem_rounds``
    rounds via ``localCheckpoint`` (in-memory, no filesystem
    round-trip), parquet slots under ``work_dir`` after that.  The
    hybrid follows the round-2 probe numbers: per-round cost with
    memory-backed materialization only starts compounding (~2.7×/round,
    with ``persist``, ``localCheckpoint`` AND reliable ``checkpoint``
    alike) past ~16 rounds, while a fully detached parquet re-read
    stays flat through 40 (0.45 s/round) — so short-diameter graphs
    (LSH near-dup components, most ER graphs: 2-6 rounds) skip the
    per-round parquet I/O entirely and long chains still get the flat
    path before the blowup region.  A materialized label table per
    round is also the standard formulation for cluster-scale iterative
    jobs — restartable, and the per-round shuffle barrier is a write
    the scheduler can re-plan after.
    """
    import tempfile
    import uuid

    spark = edges.sparkSession
    edges = edges.localCheckpoint()
    verts = edges.select(F.col("src").alias("v")).distinct()
    loops = verts.select(F.col("v").alias("src"), F.col("v").alias("dst"))
    edges_l = edges.unionByName(loops).persist()

    # Round slots must be readable by every executor.  Default order:
    # (1) caller-provided work_dir (pass shared storage on a cluster);
    # (2) the session's checkpoint dir, which a cluster deployment
    #     already points at shared storage; (3) a driver-local tempdir —
    #     correct ONLY on single-node/local-mode Spark, where executors
    #     share the driver's filesystem.
    own_dir = work_dir is None
    if work_dir is not None:
        tmp = work_dir
    else:
        ckpt = spark.sparkContext.getCheckpointDir()
        tmp = (
            f"{ckpt.rstrip('/')}/cc_rounds_{uuid.uuid4().hex}"
            if ckpt
            else tempfile.mkdtemp(prefix="cc_rounds_")
        )
    wrote_parquet = False
    try:
        labels = verts.withColumn("lbl", F.col("v"))
        if mem_rounds > 0:
            labels = labels.localCheckpoint()
        else:
            labels.write.mode("overwrite").parquet(f"{tmp}/r0")
            labels = spark.read.parquet(f"{tmp}/r0")
            wrote_parquet = True
        prev_sum = labels.agg(F.sum("lbl")).first()[0]
        for i in range(max_rounds):
            # neighbor min (self-loops fold in the keep-own-label term)
            nmin = (
                labels.join(edges_l, labels["v"] == edges_l["dst"])
                .groupBy(F.col("src").alias("v"))
                .agg(F.min("lbl").alias("lbl"))
            )
            # pointer jump: follow one level of label indirection
            parent = labels.select(
                F.col("v").alias("p_v"), F.col("lbl").alias("p_lbl")
            )
            nxt = nmin.join(parent, nmin["lbl"] == parent["p_v"], "left").select(
                "v",
                F.least(F.col("lbl"), F.coalesce("p_lbl", "lbl")).alias("lbl"),
            )
            if i < mem_rounds:
                labels = nxt.localCheckpoint()
            else:
                out = f"{tmp}/r{(i % 2) + 1}"
                nxt.write.mode("overwrite").parquet(out)
                labels = spark.read.parquet(out)
                wrote_parquet = True
            cur_sum = labels.agg(F.sum("lbl")).first()[0]
            if cur_sum == prev_sum:
                break
            prev_sum = cur_sum
        # hand the final labels back as a frame with no dependence on
        # the temp dir (it is deleted below when we created it);
        # memory-round results are already localCheckpoint frames
        result = (
            labels.localCheckpoint() if (own_dir and wrote_parquet) else labels
        )
        return result
    finally:
        # in finally so a mid-round failure cannot leak the cached
        # union frame for the session's lifetime
        edges_l.unpersist()
        if own_dir:
            # Hadoop FS delete handles local tempdirs and shared-storage
            # checkpoint paths (hdfs://, s3a://, ...) uniformly
            try:
                jvm = spark._jvm
                jpath = jvm.org.apache.hadoop.fs.Path(tmp)
                fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
                fs.delete(jpath, True)
            except Exception:
                import shutil

                shutil.rmtree(tmp, ignore_errors=True)


def star_connected_components(
    edges: DataFrame, max_rounds: int = 40, mem_rounds: int = 8
) -> DataFrame:
    """Connected components by alternating LARGE-STAR / SMALL-STAR
    contraction (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC'14) — the diameter-robust formulation the
    pointer-jumping docstring cites as the canonical cluster-scale
    alternative.  Both operations are one groupBy-min plus one join per
    application, every intermediate is an EDGE LIST (never per-vertex
    label state carried through joins), and the paper proves
    convergence in O(log² n) rounds with monotone total edge weight.

        large-star(u): connect every neighbor v > u to m = min(N(u)∪{u})
        small-star(u): connect every neighbor v ≤ u (and u) to m

    On convergence the edge set is a union of stars centered at each
    component's minimum; labels read off as each vertex's minimum
    neighbor.  Output (v, lbl) for every vertex of the input edge list
    — identical by definition to ``connected_components`` (both
    converge to component-minimum labels), so the two implementations
    cross-validate and share oracles.

    Round materialization follows the same hybrid as
    ``connected_components``: localCheckpoint for the first
    ``mem_rounds``, then per-round parquet via localCheckpoint fallback
    (edge lists here stay small after contraction, so memory rounds
    normally suffice).  Convergence detection: the canonical edge
    multiset's (count, sum) pair is stable — two scalar aggs per round.
    """
    spark = edges.sparkSession

    def canon(e: DataFrame) -> DataFrame:
        """Undirected canonical form (lo, hi), self-loops dropped."""
        lo = F.least("src", "dst")
        hi = F.greatest("src", "dst")
        return (
            e.filter(F.col("src") != F.col("dst"))
            .select(lo.alias("src"), hi.alias("dst"))
            .distinct()
        )

    def star(e: DataFrame, large: bool) -> DataFrame:
        """One star operation over the symmetric closure of ``e``."""
        sym = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        m = sym.groupBy("src").agg(
            F.least(F.min("dst"), F.first("src")).alias("m")
        )
        j = sym.join(m, "src")
        cond = (
            F.col("dst") > F.col("src") if large else F.col("dst") <= F.col("src")
        )
        out = j.filter(cond).select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        # the small-star also re-attaches u itself to its minimum
        if not large:
            out = out.unionByName(
                m.select(F.col("src"), F.col("m").alias("dst"))
            )
        return canon(out)

    verts = (
        edges.select(F.col("src").alias("v"))
        .unionByName(edges.select(F.col("dst").alias("v")))
        .distinct()
        .localCheckpoint()
    )
    e = canon(edges).localCheckpoint()

    def sig(e: DataFrame):
        r = e.agg(
            F.count(F.lit(1)).alias("c"),
            F.sum(F.col("src") + F.col("dst")).alias("s"),
        ).first()
        return (r["c"], r["s"])

    prev = sig(e)
    for i in range(max_rounds):
        e = star(star(e, large=True), large=False).localCheckpoint()
        cur = sig(e)
        if cur == prev:
            break
        prev = cur

    # read labels off the star forest: min neighbor (or self for the
    # centers / isolated vertices)
    sym = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    nmin = sym.groupBy(F.col("src").alias("v")).agg(F.min("dst").alias("n"))
    return verts.join(nmin, "v", "left").select(
        "v", F.least(F.coalesce("n", "v"), F.col("v")).alias("lbl")
    )


def degree_oriented_triangles(edges: DataFrame) -> DataFrame:
    """Triangle count via degree orientation (Suri & Vassilvitskii,
    "Counting Triangles and the Curse of the Last Reducer", WWW'11).

    Input: undirected edge list with columns ``a < b``, no duplicates.
    Output: a 1-row frame ``(n_triangles bigint)``.

    Each edge is pointed from its lower-(degree, id) endpoint to the
    higher one; wedges are expanded only at each edge's LOW endpoint, so
    a vertex's fan-out is bounded by its out-degree — O(sqrt(m)) for any
    graph (arboricity bound) instead of max-degree.  A star vertex with
    degree d contributes d wedges under id orientation but only
    ~sqrt(m) under degree orientation: the "last reducer" hot key the
    id-oriented variant suffers at 100 TB never forms.  Every triangle
    is counted exactly once because its three vertices are totally
    ordered by (degree, id).

    Cost: one extra degree aggregation + two small joins to attach
    degrees, then the same wedge-join + closing-probe shape as the
    textbook edge iterator.  All shuffles are on vertex keys; the
    degree frame is one row per vertex.
    """
    deg = (
        edges.select(F.col("a").alias("v"))
        .unionAll(edges.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    da = deg.select(F.col("v").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("v").alias("b"), F.col("d").alias("db"))
    e = edges.join(da, "a").join(db, "b")
    # orient low-(degree, id) -> high-(degree, id); a < b already, so
    # equal degrees keep the id direction
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = e.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(a_first, F.col("db")).otherwise(F.col("da")).alias("dv"),
    )
    w1 = oriented.select("u", F.col("v").alias("v1"), F.col("dv").alias("d1"))
    w2 = oriented.select("u", F.col("v").alias("v2"), F.col("dv").alias("d2"))
    # wedge (v1, v2) at the common low vertex u, ordered by (degree, id)
    # so the closing oriented edge can only be v1 -> v2
    wedges = w1.join(w2, "u").where(
        (F.col("d1") < F.col("d2"))
        | ((F.col("d1") == F.col("d2")) & (F.col("v1") < F.col("v2")))
    )
    closing = oriented.select(
        F.col("u").alias("v1"), F.col("v").alias("v2")
    )
    return (
        wedges.join(closing, ["v1", "v2"])
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    )
