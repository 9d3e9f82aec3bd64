"""Slowly-changing-dimension type-2 merge — the versioned-upsert upgrade
of the reference's UPDATE…FROM (M4): instead of overwriting contact
profile fields, history is preserved with validity intervals.

Functional implementation over immutable frames (the Delta ``MERGE``
analogue without a table format): one join on the key + narrow
case-logic; the output fully replaces the history table.

Scale: one key-shuffle each side; history tables are append-mostly, so
at warehouse scale this runs per partition-of-keys and rewrites only
affected partitions (or becomes a real Delta MERGE).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def scd2_merge(
    history: DataFrame,
    updates: DataFrame,
    key: str,
    tracked: list[str],
    effective_col: str = "effective_date",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Apply ``updates`` (key, tracked..., effective_date) to an SCD2
    ``history`` (key, tracked..., valid_from, valid_to NULL=current).

    Semantics: for each key with a current row whose tracked values
    differ from the update, the current row closes (valid_to =
    effective_date) and a new current row opens; identical values are
    no-ops; keys absent from history insert a new current row.  At most
    one update row per key (caller pre-deduplicates, e.g. first_wins).
    """
    changed_pred: Column | None = None
    for c in tracked:
        ne = ~F.col(f"h.{c}").eqNullSafe(F.col(f"u.{c}"))
        changed_pred = ne if changed_pred is None else (changed_pred | ne)

    h = history.alias("h")
    u = updates.alias("u")

    current = h.filter(F.col(f"h.{valid_to}").isNull())
    closed_hist = history.filter(F.col(valid_to).isNotNull())

    j = current.join(u, F.col(f"h.{key}") == F.col(f"u.{key}"), "full")

    # current rows: unchanged ones stay open; changed ones close
    kept_current = j.filter(F.col(f"h.{key}").isNotNull()).select(
        F.col(f"h.{key}").alias(key),
        *[F.col(f"h.{c}").alias(c) for c in tracked],
        F.col(f"h.{valid_from}").alias(valid_from),
        F.when(
            F.col(f"u.{key}").isNotNull() & changed_pred,
            F.col(f"u.{effective_col}"),
        ).alias(valid_to),
    )

    # new current rows: changed keys + brand-new keys
    opened = j.filter(
        F.col(f"u.{key}").isNotNull()
        & (F.col(f"h.{key}").isNull() | changed_pred)
    ).select(
        F.col(f"u.{key}").alias(key),
        *[F.col(f"u.{c}").alias(c) for c in tracked],
        F.col(f"u.{effective_col}").alias(valid_from),
        F.lit(None).cast(history.schema[valid_to].dataType).alias(valid_to),
    )

    return closed_hist.unionByName(kept_current).unionByName(opened)
