"""Scalar-quantization (SQ8) ANN tier — the fourth point on the repo's
memory/recall tradeoff curve (brute-force → IVF → PQ → SQ8).

SQ8 stores each vector as one small integer code per dimension
(``floor((v - min_d) / step_d)`` with per-dimension [min, max) ranges
split into ``n_levels`` buckets — the classic FAISS ``SQ8`` /
Lucene-HNSW scalar quantization).  At D=64 float64 that is an 8×
payload reduction with far better per-dimension resolution than PQ's
subspace codes; query-time scoring reconstructs each dimension at its
bucket midpoint and takes the inner product (asymmetric: the query
stays full-precision).

Spark-first shape:
  * ``sq_stats`` — per-dimension min/max via posexplode + groupBy(dim).
    The shuffle is NOT O(rows × dims): partial aggregation folds each
    map partition to ≤ D rows before the exchange, so the wire carries
    partitions × D tiny rows regardless of corpus size.  The stats pack
    into ONE broadcast row (the ``assign_cells`` pattern).
  * ``sq_encode`` — map-only ``zip_with`` against the packed stats.
  * ``sq_search`` — map-only reconstruct-and-dot per corpus row; the
    only shuffle is the final TakeOrdered.  ``sq_search_rerank`` adds
    the exact second pass over just the shortlist (the PQ re-rank
    pattern, operators/pq.py:186).

Every step is deterministic double arithmetic replayable in SQL: min/
max are exact selections, the step division and floor happen on
bitwise-identical doubles in both engines, and the reconstruction dot
uses the same sequential fold as ``similarity.dot``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .similarity import dot


def sq_stats(
    corpus: DataFrame, vec_col: str = "embedding", n_levels: int = 256
) -> DataFrame:
    """ONE-row frame ``__sq`` = array of (dim, mn, step) structs sorted
    by dimension; ``step = (max - min) / n_levels`` (0.0 for constant
    dimensions)."""
    dims = corpus.select(
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("dim", "v")
    )
    stats = dims.groupBy("dim").agg(
        F.min("v").alias("mn"), F.max("v").alias("mx")
    )
    entry = F.struct(
        F.col("dim").cast("int").alias("dim"),
        F.col("mn").alias("mn"),
        ((F.col("mx") - F.col("mn")) / F.lit(float(n_levels))).alias("step"),
    )
    return stats.agg(F.array_sort(F.collect_list(entry)).alias("__sq"))


def sq_encode(
    corpus: DataFrame,
    vec_col: str = "embedding",
    n_levels: int = 256,
    stats: DataFrame | None = None,
) -> DataFrame:
    """Corpus + ``codes`` (array<int>, one bucket id per dimension,
    clamped to [0, n_levels-1]; constant dimensions encode as 0).
    Map-only after the one-row stats broadcast."""
    st = stats if stats is not None else sq_stats(corpus, vec_col, n_levels)
    with_st = corpus.crossJoin(F.broadcast(st))
    codes = F.zip_with(
        F.col(vec_col).cast("array<double>"),
        F.col("__sq"),
        lambda v, s: F.when(s["step"] > 0.0, F.least(
            F.lit(n_levels - 1),
            F.greatest(
                F.lit(0), F.floor((v - s["mn"]) / s["step"]).cast("int")
            ),
        )).otherwise(F.lit(0)).cast("int"),
    )
    return with_st.withColumn("codes", codes).drop("__sq")


def _reconstruct(codes: Column, sq: Column) -> Column:
    """Bucket-midpoint decode: ``mn + (code + 0.5) * step``."""
    return F.zip_with(
        codes,
        sq,
        lambda c, s: s["mn"] + (c.cast("double") + 0.5) * s["step"],
    )


def sq_search(
    corpus: DataFrame,
    query: DataFrame,
    k: int = 10,
    n_levels: int = 256,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id: int | None = None,
) -> DataFrame:
    """Asymmetric SQ top-k for ONE query vector: reconstruct each
    encoded corpus vector at bucket midpoints, score by inner product
    against the full-precision query, return the k largest (ties to
    the lowest id).  Map-only scan + TakeOrdered — no other shuffle.

    Output: (neighbor_id, approx_dot_e6).
    """
    st = sq_stats(corpus, vec_col, n_levels)
    encoded = sq_encode(corpus, vec_col, n_levels, stats=st)
    if exclude_id is not None:
        encoded = encoded.filter(F.col(id_col) != exclude_id)
    qrow = F.broadcast(
        query.select(F.col(vec_col).cast("array<double>").alias("__qvec"))
        .crossJoin(st)
    )
    scored = encoded.crossJoin(qrow).select(
        F.col(id_col).alias("neighbor_id"),
        dot(_reconstruct(F.col("codes"), F.col("__sq")), F.col("__qvec")).alias(
            "__d"
        ),
    )
    return (
        scored.orderBy(F.col("__d").desc(), F.col("neighbor_id").asc())
        .limit(k)
        .select(
            "neighbor_id", F.floor(F.col("__d") * 1e6).alias("approx_dot_e6")
        )
    )


def sq_search_rerank(
    corpus: DataFrame,
    query: DataFrame,
    k: int = 10,
    shortlist: int = 100,
    n_levels: int = 256,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id: int | None = None,
) -> DataFrame:
    """Two-stage SQ search: approximate shortlist over codes, exact
    inner-product re-rank over just the shortlist rows (broadcast semi
    join back to the corpus — the codes scan touches 1/8 the payload,
    the full-vector scan touches shortlist/corpus of the rows).

    Output: (neighbor_id, dot_e6) — exact inner product, micro-units.
    """
    short = sq_search(
        corpus,
        query,
        k=shortlist,
        n_levels=n_levels,
        id_col=id_col,
        vec_col=vec_col,
        exclude_id=exclude_id,
    ).select(F.col("neighbor_id").alias(id_col))
    qrow = F.broadcast(
        query.select(F.col(vec_col).cast("array<double>").alias("__qvec"))
    )
    cand = corpus.join(F.broadcast(short), id_col, "left_semi")
    exact = cand.crossJoin(qrow).select(
        F.col(id_col).alias("neighbor_id"),
        dot(F.col(vec_col).cast("array<double>"), F.col("__qvec")).alias("__d"),
    )
    return (
        exact.orderBy(F.col("__d").desc(), F.col("neighbor_id").asc())
        .limit(k)
        .select("neighbor_id", F.floor(F.col("__d") * 1e6).alias("dot_e6"))
    )
