"""Deterministic k-means over an embedding column — the engine's
iterative-algorithm surface (driver-orchestrated loop, executor-side
math; the class of ops the DuckDB oracle can't express, covered by
rows-only checks + numpy-parity tests instead).

Design for scale:
  * centroids are the ONLY driver-materialized state (k × dim doubles —
    bounded by construction, like MLlib's implementation);
  * assignment is a broadcast of centroids + a narrow argmin pass;
  * the centroid update is elementwise: posexplode → (cluster, dim)
    hash-aggregate with map-side partials → rebuild arrays; the shuffle
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
    """Nearest-centroid assignment against literal centroids (broadcast
    by construction — they're plan constants)."""
    best = None
    for cid, vec in centroids:
        lit_vec = F.array(*[F.lit(float(x)) for x in vec])
        cand = F.struct(
            _sq_dist(F.col(vec_col), lit_vec).alias("dist"),
            F.lit(cid).alias("cluster"),
        )
        best = cand if best is None else F.least(best, cand)
    return df.select(
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
    ids).  Returns (centroids, final assignment frame)."""
    init = (
        df.orderBy(F.col(id_col)).limit(k).select(id_col, vec_col).collect()
    )
    centroids = [(i, list(map(float, r[1]))) for i, r in enumerate(init)]

    for _ in range(max_iter):
        assigned = assign_clusters(df, centroids, id_col, vec_col)
        # elementwise mean per cluster: explode dims, two-phase avg
        dims = assigned.select(
            "cluster", F.posexplode("vec").alias("dim", "val")
        )
        means = (
            dims.groupBy("cluster", "dim")
            .agg(F.avg("val").alias("m"))
            .groupBy("cluster")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "m"))),
                    lambda s: s["m"],
                ).alias("centroid")
            )
        )
        new = {r.cluster: list(r.centroid) for r in means.collect()}
        next_centroids = [
            (cid, new.get(cid, vec)) for cid, vec in centroids
        ]
        if all(
            max(abs(a - b) for a, b in zip(v1, v2)) < 1e-9
            for (_, v1), (_, v2) in zip(centroids, next_centroids)
        ):
            centroids = next_centroids
            break
        centroids = next_centroids

    return centroids, assign_clusters(df, centroids, id_col, vec_col)
