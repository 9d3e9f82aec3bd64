"""UPDATE…FROM / upsert emulation (SURVEY §4.3.2, M4/J6/X22).

The reference's final stage runs ``UPDATE contacts SET col =
COALESCE(staged.col, contacts.col) FROM tmp_contact_profile_updates
WHERE nhs_number matches`` (``sql/import_contact_profile_updates.sql:1-7``).
On Spark's immutable substrate this is read → left join → per-column
coalesce → full overwrite (Delta ``MERGE INTO`` is the managed-table
upgrade path; plain frames here).

1:N hazard: several staging rows can share a key; Postgres UPDATE…FROM
picks an arbitrary match, petl's lookups pick first-wins — the engine
closes the ambiguity by first-wins-deduplicating the staging side under
an explicit order (deterministic, oracle-checkable).

100 TB posture: one shuffle each side on the key (or zero if both are
bucketed on it); per-column coalesce is narrow.  The overwrite is a
partition-parallel write, not a driver round-trip.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import first_wins


def update_from(
    target: DataFrame,
    staging: DataFrame,
    key: str,
    update_cols: list[str],
    staging_order: list[str | Column],
) -> DataFrame:
    """Return ``target`` with ``update_cols`` overwritten by the staged
    values where present (NULL staged value keeps the old one — the
    COALESCE semantics of X22)."""
    deduped = first_wins(staging, key, staging_order)
    staged = deduped.select(
        key, *[F.col(c).alias(f"__new_{c}") for c in update_cols]
    )
    joined = target.join(staged, key, "left")
    out_cols = [
        F.coalesce(F.col(f"__new_{c}"), F.col(c)).alias(c)
        if c in update_cols
        else F.col(c)
        for c in target.columns
    ]
    return joined.select(*out_cols)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    cols: list[str],
) -> DataFrame:
    """Change-data-capture between two table snapshots: one row per
    changed key with ``change_type`` ∈ insert / update / delete
    (the diff a MERGE would apply — the batch CDC primitive).

    FULL OUTER join on the key — the minimal co-location any diff
    needs — with update detection via null-safe column comparison.
    For wide tables, pre-hash the payload into one md5 column and pass
    ``cols=[that]`` so the exchange carries (key, hash) instead of the
    full row.  At 100 TB both snapshots shuffle once on the key;
    storing snapshots bucketed by the key removes even that.
    """
    from functools import reduce
    from operator import or_

    if not cols:
        raise ValueError(
            "cols must be non-empty; for a key-presence-only diff pass "
            "a constant column or pre-hash the payload"
        )
    o = old.select(
        F.col(key).alias("__k"),
        *[F.col(c).alias(f"__o_{c}") for c in cols],
    )
    n = new.select(
        F.col(key).alias("__nk"),
        *[F.col(c).alias(f"__n_{c}") for c in cols],
    )
    changed = reduce(
        or_,
        [
            ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
            for c in cols
        ],
    )
    j = o.join(n, o["__k"] == n["__nk"], "full_outer")
    return j.filter(
        F.col("__k").isNull() | F.col("__nk").isNull() | changed
    ).select(
        F.coalesce(F.col("__k"), F.col("__nk")).alias(key),
        F.when(F.col("__k").isNull(), F.lit("insert"))
        .when(F.col("__nk").isNull(), F.lit("delete"))
        .otherwise(F.lit("update"))
        .alias("change_type"),
    )
