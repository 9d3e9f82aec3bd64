"""The relational import stage — Spark emulation of the reference's
Postgres scripts (SURVEY §2.9, §4.3.1-2; ``sql/*.sql``).

The reference loads the prepared CSVs into typed staging tables and runs
three scripts; the one hard construct is the data-modifying CTE with
RETURNING (insert triage needs, capture generated ids, attach notes to
those fresh ids — ``import_original_triage_needs_and_notes.sql:5-40``).
Spark emulation: assign ``id = max_existing + row_number()`` BEFORE the
append, keep the id-bearing frame, and run the notes join against it.
Note multiplication semantics are preserved: a contact with N inserted
needs × M staged notes yields N×M note rows, exactly like the SQL.

Typed staging boundary: ``create_tmp_tables.sql:1-41`` fixes the column
types — enforced here by explicit casts at `stage_*` construction.

100 TB posture: joins are key-shuffles (broadcast the contacts_map side
when bounded); id assignment is the only global window and operates on
the per-import staging batch, never the full fact table.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.surrogate import assign_surrogate_ids
from ..operators.upsert import update_from


def _max_id(df: DataFrame, id_col: str = "id") -> int:
    """Current max surrogate id (0 for an empty table).  A driver-side
    scalar — one value, not a materialization."""
    row = df.agg(F.max(id_col).alias("m")).collect()[0]
    return int(row.m) if row.m is not None else 0


@dataclass
class ImportResult:
    contacts: DataFrame
    needs: DataFrame
    notes: DataFrame


def contacts_map(contacts: DataFrame) -> DataFrame:
    """``WITH contacts_map AS (SELECT id AS contact_id, nhs_number …)``
    (M1, ``import_identified_needs.sql:1-5``)."""
    return contacts.select(F.col("id").alias("contact_id"), "nhs_number")


def import_original_triage_needs_and_notes(
    contacts: DataFrame,
    needs: DataFrame,
    notes: DataFrame,
    tmp_needs: DataFrame,
    tmp_notes: DataFrame,
) -> ImportResult:
    """``import_original_triage_needs_and_notes.sql`` — the RETURNING
    pipeline.  Order of generated ids: (nhs_number, __source ordering via
    row_number over nhs_number) — Postgres RETURNING order is arbitrary;
    the engine pins a deterministic one."""
    cmap = F.broadcast(contacts_map(contacts))

    resolved = tmp_needs.join(cmap, "nhs_number")  # inner: unmatched drop out
    inserted = assign_surrogate_ids(
        resolved,
        ["nhs_number", "category", "name"],
        id_col="id",
        start_after=_max_id(needs),
    )
    new_needs = inserted.select(
        "id",
        "contact_id",
        "category",
        "name",
        "created_at",
        "updated_at",
        "completed_on",
    )
    needs_out = needs.unionByName(new_needs, allowMissingColumns=True)

    # notes ⋈ contacts_map ⋈ inserted_needs ON contact_id — N×M fan-out
    # preserved (``…sql:29-39``)
    ins_keys = inserted.select(
        F.col("id").alias("need_id"), F.col("contact_id").alias("__cid")
    )
    attached = (
        tmp_notes.join(cmap, "nhs_number")
        .join(ins_keys, F.col("contact_id") == F.col("__cid"))
        .select(
            "need_id", "category", "body", "created_at", "updated_at", "import_data"
        )
    )
    new_notes = assign_surrogate_ids(
        attached,
        ["need_id", "category", "body"],
        id_col="id",
        start_after=_max_id(notes),
    )
    notes_out = notes.unionByName(new_notes, allowMissingColumns=True)
    return ImportResult(contacts=contacts, needs=needs_out, notes=notes_out)


def import_identified_needs(
    contacts: DataFrame, needs: DataFrame, tmp_identified_needs: DataFrame
) -> DataFrame:
    """``import_identified_needs.sql:6-27`` — INSERT…SELECT with the
    contact-id resolution join."""
    cmap = F.broadcast(contacts_map(contacts))
    resolved = tmp_identified_needs.join(cmap, "nhs_number")
    inserted = assign_surrogate_ids(
        resolved,
        ["nhs_number", "category", "name"],
        id_col="id",
        start_after=_max_id(needs),
    )
    new_needs = inserted.select(
        "id",
        "contact_id",
        "category",
        "name",
        "created_at",
        "updated_at",
        "completed_on",
        "supplemental_data",
        "user_id",
        "start_on",
    )
    return needs.unionByName(new_needs, allowMissingColumns=True)


PROFILE_COLS = [
    "additional_info",
    "delivery_details",
    "dietary_details",
    "has_covid_symptoms",
]


def import_contact_profile_updates(
    contacts: DataFrame, tmp_updates: DataFrame
) -> DataFrame:
    """``import_contact_profile_updates.sql:1-7`` — UPDATE…FROM with
    per-column COALESCE, as join-coalesce-overwrite.  The staging side is
    first-wins deduplicated (Postgres picks an arbitrary match on 1:N;
    the engine pins first-by-input-order when __source_row is present,
    else lexicographic)."""
    order: list[str | Column] = (
        ["__source_row"] if "__source_row" in tmp_updates.columns else PROFILE_COLS
    )
    staging = tmp_updates.select(
        "nhs_number",
        *PROFILE_COLS,
        *(["__source_row"] if "__source_row" in tmp_updates.columns else []),
    )
    return update_from(contacts, staging, "nhs_number", PROFILE_COLS, order)
