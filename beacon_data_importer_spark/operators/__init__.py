from .dedup import exact_dedup, first_wins, minhash_signatures
from .flatmap import explode_counted
from .joins import lookup_join
from .setops import union_by_name
from .surrogate import assign_surrogate_ids
from .upsert import update_from

__all__ = [
    "exact_dedup",
    "first_wins",
    "minhash_signatures",
    "explode_counted",
    "lookup_join",
    "union_by_name",
    "assign_surrogate_ids",
    "update_from",
]
