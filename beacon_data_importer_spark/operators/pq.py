"""Product-quantization ANN tier (SURVEY §7.5 extension; third tier next
to brute-force ``cosine_topk`` and IVF cell pruning).

PQ (Jégou et al., "Product Quantization for Nearest Neighbor Search",
TPAMI 2011) splits each D-dim vector into M subvectors and quantizes
every subvector to one of K codewords, so a vector is stored as M small
codes and query-time scoring is M table lookups (asymmetric distance
computation, ADC) instead of a D-dim float loop.

Spark-first shape — everything is native array expressions, zero
Python, and the only shuffle in a full search is the final TakeOrdered:
  * the codebook (M × K codewords, here 8 × 16 × 8 doubles) is packed
    into ONE broadcast row (same pattern as ``similarity.assign_cells``);
  * encoding is a map-only argmin fold per subspace;
  * the query's ADC distance table is computed once (1 × M × K row) and
    broadcast; scoring each corpus vector is M array lookups + a
    sequential 8-term sum.
At 100 TB the codes frame (M bytes per vector instead of D floats) is
what you'd persist and scan — a 32× payload reduction at D=64/M=8
float64 — with exact re-ranking of the PQ top-R as a second pass.

Codewords default to deterministic samples (the subvectors of the K
lowest-id corpus rows) so the exact computation is replayable as a SQL
oracle; the per-subspace k-means TRAINED codebook a production build
uses is implemented too — catalog_r3b's ``pq_kmeans_search_rerank``
fits one Lloyd loop per subspace (operators/kmeans.py) and passes the
learned codewords through ``packed_codebook``, oracle-replayed
end-to-end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _sq_dist(a: Column, b: Column) -> Column:
    """Squared L2 distance as the same sequential left-fold DuckDB's
    list_dot_product(diff, diff) performs, so micro-unit floors agree.

    One ``zip_with`` (diff array built once) + one fold that squares in
    the accumulator — drops the second intermediate array of the
    original two-``zip_with`` form.  NOT the fully-fused index fold:
    that form references ``a``/``b`` per element, and when the argument
    is itself an expression (``F.slice`` of a subvector, the PQ encode
    path) Catalyst re-evaluates it per reference — measured 4× slower
    there despite winning on plain column inputs.  Add order and term
    values are unchanged, so results stay bitwise equal to the oracle
    fold."""
    diff = F.zip_with(a, b, lambda x, y: x.cast("double") - y.cast("double"))
    return F.aggregate(diff, F.lit(0.0), lambda acc, x: acc + x * x)


def _packed_codebook(
    corpus: DataFrame,
    n_subspaces: int,
    n_codes: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """ONE-row frame: ``__cb`` = array of (s, c, w) structs sorted by
    (s, c) — subspace s's codewords occupy slots s*n_codes+1 .. +n_codes.
    Codeword (s, c) is the s-th subvector of the corpus row with the
    c-th-lowest id (deterministic sampled codebook)."""
    src = corpus.filter(F.col(id_col) < n_codes)
    entries = src.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_subspaces - 1)),
                lambda s: F.struct(
                    s.cast("int").alias("s"),
                    F.col(id_col).cast("int").alias("c"),
                    F.slice(
                        F.col(vec_col).cast("array<double>"),
                        s * (F.size(vec_col) / n_subspaces).cast("int") + 1,
                        (F.size(vec_col) / n_subspaces).cast("int"),
                    ).alias("w"),
                ),
            )
        ).alias("e")
    )
    return entries.agg(F.array_sort(F.collect_list("e")).alias("__cb"))


def pq_encode(
    corpus: DataFrame,
    n_subspaces: int = 8,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebook_source: DataFrame | None = None,
    packed_codebook: DataFrame | None = None,
) -> DataFrame:
    """Corpus → (id, codes) where ``codes[s]`` is the id of the nearest
    codeword (squared L2, ties to the lowest code) for subvector s.

    Map-only: the packed codebook broadcasts; each row folds each
    subspace's K codewords to an argmin.  Output keeps the original
    columns plus ``codes`` (array<int>, length M).

    ``codebook_source`` lets a caller encode a SUBSET of the corpus
    (e.g. the probed IVF cells) against the codebook trained on the
    full corpus — required whenever ``corpus`` might not contain the
    sample rows the codebook derives from.  Defaults to ``corpus``.
    ``packed_codebook`` overrides sampling entirely with a prebuilt
    1-row ``__cb`` frame (e.g. k-means-learned codewords).
    """
    cb = F.broadcast(
        packed_codebook
        if packed_codebook is not None
        else _packed_codebook(
            codebook_source if codebook_source is not None else corpus,
            n_subspaces,
            n_codes,
            id_col,
            vec_col,
        )
    )
    with_cb = corpus.crossJoin(cb)
    d_sub = (F.size(vec_col) / n_subspaces).cast("int")

    def best_code(s: Column) -> Column:
        sub = F.slice(F.col(vec_col).cast("array<double>"), s * d_sub + 1, d_sub)
        cands = F.slice(F.col("__cb"), s * n_codes + 1, n_codes)
        scored = F.transform(
            cands,
            lambda e: F.struct(
                _sq_dist(sub, e["w"]).alias("d"), e["c"].alias("c")
            ),
        )
        init = F.struct(
            F.lit(float("inf")).alias("d"), F.lit(-1).cast("int").alias("c")
        )
        # strict < keeps the earliest (lowest-c) codeword on ties
        best = F.aggregate(
            scored,
            init,
            lambda acc, e: F.when(e["d"] < acc["d"], e).otherwise(acc),
        )
        return best["c"]

    codes = F.transform(
        F.sequence(F.lit(0), F.lit(n_subspaces - 1)),
        lambda s: best_code(s.cast("int")),
    )
    return with_cb.withColumn("codes", codes).drop("__cb")


def pq_search(
    corpus: DataFrame,
    query: DataFrame,
    k: int = 10,
    n_subspaces: int = 8,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id: int | None = None,
    codebook_source: DataFrame | None = None,
    packed_codebook: DataFrame | None = None,
) -> DataFrame:
    """ADC top-k: score every encoded corpus vector against ONE query
    vector via its per-subspace distance table, return the k nearest by
    approximate distance (ascending, ties to the lowest id).
    ``exclude_id`` drops the query's own row from the candidates while
    keeping it available as a codebook sample.

    ``query`` must be a 1-row frame with ``vec_col``.  The distance
    table (M × K doubles) is a one-row broadcast; scoring is M lookups
    + an ascending-s sequential sum per corpus row; the only shuffle is
    the TakeOrdered for the final k.

    Output: (neighbor_id, approx_dist_e6).
    """
    cb_src = codebook_source if codebook_source is not None else corpus
    encoded = pq_encode(
        corpus,
        n_subspaces,
        n_codes,
        id_col,
        vec_col,
        codebook_source=cb_src,
        packed_codebook=packed_codebook,
    )
    if exclude_id is not None:
        encoded = encoded.filter(F.col(id_col) != exclude_id)

    cb = (
        packed_codebook
        if packed_codebook is not None
        else _packed_codebook(cb_src, n_subspaces, n_codes, id_col, vec_col)
    )
    d_sub = (F.size("__qvec") / n_subspaces).cast("int")
    qrow = query.select(F.col(vec_col).cast("array<double>").alias("__qvec"))
    # __dt[s*K + c + 1] = ||q_sub(s) - w(s,c)||²  (same (s,c) order as __cb)
    dtable = F.broadcast(
        cb.crossJoin(qrow).select(
            F.transform(
                F.col("__cb"),
                lambda e: _sq_dist(
                    F.slice(F.col("__qvec"), e["s"] * d_sub + 1, d_sub),
                    e["w"],
                ),
            ).alias("__dt")
        )
    )

    scored = encoded.crossJoin(dtable)
    approx = F.aggregate(
        F.sequence(F.lit(0), F.lit(n_subspaces - 1)),
        F.lit(0.0),
        lambda acc, s: acc
        + F.element_at(
            F.col("__dt"),
            s.cast("int") * n_codes + F.element_at(F.col("codes"), s.cast("int") + 1) + 1,
        ),
    )
    return (
        scored.withColumn("__ad", approx)
        .select(
            F.col(id_col).alias("neighbor_id"),
            F.col("__ad"),
            F.floor(F.col("__ad") * 1e6).alias("approx_dist_e6"),
        )
        .orderBy(F.col("__ad").asc(), F.col("neighbor_id").asc())
        .limit(k)
        .drop("__ad")
    )


def pq_search_rerank(
    corpus: DataFrame,
    query: DataFrame,
    k: int = 10,
    shortlist: int = 200,
    n_subspaces: int = 8,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id: int | None = None,
    codebook_source: DataFrame | None = None,
    packed_codebook: DataFrame | None = None,
) -> DataFrame:
    """Two-stage PQ search: ADC shortlist → exact squared-L2 re-rank.

    Stage 1 scans only codes (the 32×-smaller payload) and keeps the
    ``shortlist`` nearest by approximate distance; stage 2 re-scores
    just those against the full vectors and returns the exact top-k.
    This is the production PQ pipeline (quantization error only affects
    which candidates enter the shortlist, not their final order) — on
    the synthetic near-orthogonal test embeddings it lifts recall@10
    from ~0.1 (raw ADC) to ~0.8-1.0 at shortlist=200.

    The shortlist is a bounded TakeOrdered (driver holds `shortlist`
    ids, not vectors); re-ranking is a broadcast semi join back to the
    corpus — at 100 TB both stages stay distributed and the full-vector
    scan touches only shortlist/corpus of the data.

    Output: (neighbor_id, dist_e6) — exact squared L2, micro-units.
    """
    short = pq_search(
        corpus,
        query,
        k=shortlist,
        n_subspaces=n_subspaces,
        n_codes=n_codes,
        id_col=id_col,
        vec_col=vec_col,
        exclude_id=exclude_id,
        codebook_source=codebook_source,
        packed_codebook=packed_codebook,
    ).select(F.col("neighbor_id").alias(id_col))

    qrow = F.broadcast(
        query.select(F.col(vec_col).cast("array<double>").alias("__qvec"))
    )
    cand = corpus.join(F.broadcast(short), id_col, "left_semi")
    exact = cand.crossJoin(qrow).select(
        F.col(id_col).alias("neighbor_id"),
        _sq_dist(F.col(vec_col).cast("array<double>"), F.col("__qvec")).alias(
            "__d"
        ),
    )
    return (
        exact.orderBy(F.col("__d").asc(), F.col("neighbor_id").asc())
        .limit(k)
        .select("neighbor_id", F.floor(F.col("__d") * 1e6).alias("dist_e6"))
    )
