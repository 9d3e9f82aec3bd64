"""Skew-mitigation operators.

AQE's skew-join splitting handles joins; for *aggregations* over heavily
skewed group keys (a handful of keys holding most rows — the classic
100 TB failure mode where one reducer gets 10 TB), the standard fix is
salted two-phase aggregation: partially aggregate on (key, salt), then
combine partials on the key.  Works for any algebraic aggregate
(sum/count/min/max) because partials compose.

Salt is DETERMINISTIC (hash of caller-chosen high-cardinality columns,
never rand()) so results are reproducible and resume-safe.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_COMBINE = {
    "sum": F.sum,
    "count": F.sum,  # counts combine by summing partial counts
    "min": F.min,
    "max": F.max,
}
_PARTIAL = {
    "sum": F.sum,
    "count": lambda c: F.count(c),
    "min": F.min,
    "max": F.max,
}


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[Column | str, str]],
    salt_cols: list[str],
    buckets: int = 32,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs`` maps output name -> (column, fn) with fn in
    {sum, count, min, max}.  ``salt_cols`` must be high-cardinality so the
    hot key's rows spread across ``buckets`` reducers in phase 1; phase 2
    shuffles only #keys×buckets partial rows.
    """
    for name, (_, fn) in aggs.items():
        if fn not in _PARTIAL:
            raise ValueError(f"{name}: non-algebraic aggregate {fn!r} cannot be salted")
    salt = (
        F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(buckets))
    ).alias("__salt")
    partial = df.groupBy(*keys, salt).agg(
        *[
            _PARTIAL[fn](c if isinstance(c, Column) else F.col(c)).alias(f"__p_{name}")
            for name, (c, fn) in aggs.items()
        ]
    )
    return partial.groupBy(*keys).agg(
        *[
            _COMBINE[fn](F.col(f"__p_{name}")).alias(name)
            for name, (_, fn) in aggs.items()
        ]
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt_col: str,
    salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi join: salt the BIG (left) side into ``salts``
    sub-keys by hashing ``salt_col`` (a high-cardinality column — the
    row id; deterministic, never rand()), replicate the SMALL-but-not-
    broadcastable (right) side once per salt, join on (key, salt) —
    the classic manual skew join for when AQE's runtime splitting is
    unavailable (pre-shuffle bucketed layouts, non-AQE engines) or the
    skew is known ahead of time.

    A hot key's rows now spread over ``salts`` reducers instead of one;
    the right side grows ``salts``× (it must be small enough for that,
    yet too large / too frequently-joined to broadcast).  The join
    RESULT is salt-invariant — every (key, salt) pair meets exactly the
    right rows replicated under that salt — which is what the oracle
    checks; the salt only reshapes the exchange.
    """
    if salts < 1:
        raise ValueError(f"salts must be >= 1, got {salts}")
    # Pick a temp column name that cannot collide with either input —
    # a silent collision would corrupt the join condition.
    salt = "__salt"
    taken = set(left.columns) | set(right.columns)
    while salt in taken:
        salt += "_"
    l = left.withColumn(
        salt, F.pmod(F.xxhash64(F.col(salt_col)), F.lit(salts))
    )
    r = right.withColumn(
        salt,
        F.explode(F.sequence(F.lit(0), F.lit(salts - 1))),
    )
    return l.join(r, [key, salt], how).drop(salt)
