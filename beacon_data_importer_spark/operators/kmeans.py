"""Deterministic k-means over an embedding column — the engine's
iterative-algorithm surface (driver-orchestrated loop, executor-side
math; the class of ops the DuckDB oracle can't express, covered by
rows-only checks + numpy-parity tests instead).

Design for scale:
  * centroids are the ONLY driver-materialized state (k × dim doubles —
    bounded by construction, like MLlib's implementation);
  * assignment is a broadcast of centroids + a narrow argmin pass;
  * the centroid update is elementwise: dim parallel ``avg(vec[d])``
    aggs in one hash-aggregate with map-side partials; the shuffle
    carries k × dim partial sums per partition, not vectors.
Initialization is deterministic (k lowest ids), no RNG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sq_dist(a, b) -> "F.Column":
    d = F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double")) ** 2)
    return F.aggregate(d, F.lit(0.0), lambda acc, x: acc + x)


def assign_clusters(df: DataFrame, centroids: list[tuple[int, list[float]]],
                    id_col: str, vec_col: str) -> DataFrame:
    """Nearest-centroid assignment.  The centroids ride in as a one-row
    broadcast DataFrame (array<struct<cid,v>>), NOT as plan literals: the
    physical plan is then byte-identical across Lloyd iterations, so
    whole-stage codegen compiles once and is cache-hit for every
    subsequent iteration (the literal-unrolled form recompiled a
    512-literal expression tree per iteration — measured ~1s/iter of
    pure driver time at k=8×dim=64).  Still a narrow pass: broadcast
    cross-join of a single row, argmin via a sequential ``aggregate``
    fold over the centroid array, no shuffle."""
    spark = df.sparkSession
    cent_df = spark.createDataFrame(
        [([{"cid": cid, "v": [float(x) for x in vec]} for cid, vec in centroids],)],
        "cents array<struct<cid:int,v:array<double>>>",
    )
    best = F.aggregate(
        F.col("cents"),
        F.struct(
            F.lit(float("inf")).alias("dist"), F.lit(-1).alias("cluster")
        ),
        lambda acc, c: F.least(
            acc,
            F.struct(
                _sq_dist(F.col(vec_col), c["v"]).alias("dist"),
                c["cid"].alias("cluster"),
            ),
        ),
    )
    return df.crossJoin(F.broadcast(cent_df)).select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        best["cluster"].alias("cluster"),
        best["dist"].alias("dist"),
    )


def kmeans_fit(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    max_iter: int = 10,
) -> tuple[list[tuple[int, list[float]]], DataFrame]:
    """Lloyd iterations with deterministic init (vectors of the k lowest
    ids).  Returns (centroids, final assignment frame).

    The base projection is persisted for the duration of the fit (each
    iteration re-reads it; at warehouse scale this is the standard
    "cache the training frame" move).  The centroid update collects the
    k × dim per-dimension means directly — one hash-aggregate with
    map-side partials, ~512 rows to the driver — instead of a second
    grouped collect_list pass.
    """
    base = df.select(
        F.col(id_col).alias(id_col), F.col(vec_col).alias(vec_col)
    ).persist()
    try:
        init = (
            base.orderBy(F.col(id_col)).limit(k).select(id_col, vec_col).collect()
        )
        centroids = [(i, list(map(float, r[1]))) for i, r in enumerate(init)]

        dim = len(centroids[0][1])
        for _ in range(max_iter):
            assigned = assign_clusters(base, centroids, id_col, vec_col)
            # elementwise mean per cluster as dim parallel avg aggs over
            # vec[d] extracts — one hash-agg with map-side partials, k
            # rows × dim cols to the driver.  (Earlier form: posexplode
            # to (cluster, dim) then groupBy — that shuffled rows×dim
            # exploded records where this shuffles k×dim partials.)
            rows = (
                assigned.groupBy("cluster")
                .agg(*[F.avg(F.col("vec")[d]).alias(f"m{d}") for d in range(dim)])
                .collect()
            )
            acc: dict[int, dict[int, float]] = {}
            for r in rows:
                acc[r.cluster] = {d: r[f"m{d}"] for d in range(dim)}
            next_centroids = [
                (
                    cid,
                    [acc[cid][d] for d in range(len(vec))] if cid in acc else vec,
                )
                for cid, vec in centroids
            ]
            converged = all(
                max(abs(a - b) for a, b in zip(v1, v2)) < 1e-9
                for (_, v1), (_, v2) in zip(centroids, next_centroids)
            )
            centroids = next_centroids
            if converged:
                break

        return centroids, assign_clusters(df, centroids, id_col, vec_col)
    finally:
        base.unpersist()
