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
