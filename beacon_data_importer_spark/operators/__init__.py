from .dedup import (
    exact_dedup,
    first_wins,
    lsh_candidate_pairs,
    minhash_signatures,
    minhash_similarity,
    simhash_agg,
)
from .flatmap import explode_counted
from .joins import lookup_join
from .kmeans import assign_clusters, kmeans_fit
from .scd import scd2_merge
from .setops import union_by_name
from .similarity import assign_cells, cosine, cosine_topk, dot, norm
from .skew import salted_aggregate
from .surrogate import assign_surrogate_ids, assign_surrogate_ids_scalable
from .upsert import update_from

__all__ = [
    "exact_dedup",
    "first_wins",
    "lsh_candidate_pairs",
    "minhash_signatures",
    "minhash_similarity",
    "simhash_agg",
    "explode_counted",
    "lookup_join",
    "assign_clusters",
    "kmeans_fit",
    "scd2_merge",
    "union_by_name",
    "assign_cells",
    "cosine",
    "cosine_topk",
    "dot",
    "norm",
    "salted_aggregate",
    "assign_surrogate_ids",
    "assign_surrogate_ids_scalable",
    "update_from",
]
