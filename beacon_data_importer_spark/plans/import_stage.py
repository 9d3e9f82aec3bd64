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

from pyspark.sql import SparkSession
from pyspark.sql.types import (
    BooleanType,
    DateType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..operators.surrogate import assign_surrogate_ids
from ..operators.upsert import update_from

# Typed staging boundary — the engine's equivalent of
# ``create_tmp_tables.sql:1-41`` (S7): the all-string prepared CSVs are
# cast to real types here.
def _st(*fields: tuple[str, object, bool]) -> StructType:
    return StructType([StructField(n, t, nullable) for n, t, nullable in fields])


STAGING_SCHEMAS: dict[str, StructType] = {
    "original_triage_needs": _st(
        ("nhs_number", StringType(), False),
        ("category", StringType(), False),
        ("name", StringType(), False),
        ("created_at", DateType(), False),
        ("updated_at", DateType(), False),
        ("completed_on", DateType(), True),
    ),
    "original_triage_notes": _st(
        ("nhs_number", StringType(), False),
        ("category", StringType(), False),
        ("body", StringType(), False),
        ("created_at", DateType(), False),
        ("updated_at", DateType(), False),
        ("import_data", StringType(), True),  # jsonb carried as JSON string
    ),
    "identified_needs": _st(
        ("nhs_number", StringType(), False),
        ("category", StringType(), False),
        ("name", StringType(), True),
        ("created_at", DateType(), False),
        ("updated_at", DateType(), False),
        ("completed_on", DateType(), True),
        ("supplemental_data", StringType(), True),
        ("user_id", LongType(), True),
        ("start_on", DateType(), True),
    ),
    "contact_profile_updates": _st(
        ("nhs_number", StringType(), False),
        ("additional_info", StringType(), True),
        ("delivery_details", StringType(), True),
        ("dietary_details", StringType(), True),
        ("has_covid_symptoms", BooleanType(), True),
    ),
}


def read_staging(spark: SparkSession, csv_path: str, kind: str) -> DataFrame:
    """Load a prepared CSV into its typed staging frame (the ``\\COPY``
    + typed-tmp-table step, S6/S7).  Empty cells → NULL, then cast per
    the declared schema; 'True'/'False' strings → boolean."""
    schema = STAGING_SCHEMAS[kind]
    # multiLine: note bodies / need names contain embedded newlines
    # (compose_body); escape='"' matches csv-writer quote doubling.
    raw = (
        spark.read.option("header", True)
        .option("inferSchema", False)
        .option("multiLine", True)
        .option("escape", '"')
        .csv(csv_path)
    )
    cols = []
    for f in schema.fields:
        if f.name not in raw.columns:
            # the three needs CSVs carry different column subsets; the
            # staging table pads the rest (\COPY with a column list)
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
            continue
        c = F.when(F.col(f.name) != "", F.col(f.name))  # '' -> NULL
        if isinstance(f.dataType, BooleanType):
            c = F.when(F.lower(c) == "true", F.lit(True)).when(
                F.lower(c) == "false", F.lit(False)
            )
        else:
            c = c.cast(f.dataType)
        cols.append(c.alias(f.name))
    return raw.select(*cols)


def _max_id(df: DataFrame, id_col: str = "id") -> int:
    """Current max surrogate id (0 for an empty table).  A driver-side
    scalar — one value, not a materialization — and one such job per
    import BATCH, which is fine for the reference's dimension-sized
    imports (RETURNING emulation inherently reads back a scalar).  Do
    NOT reach for this on a per-row or per-partition cadence: the
    fact-table path is ``operators/surrogate.assign_surrogate_ids_
    scalable`` (zipWithIndex-free prefix-sum ids), which never runs a
    driver-side read at all."""
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

# persistent application tables (FIXTURES.md §A4)
NEEDS_SCHEMA = _st(
    ("id", LongType(), False),
    ("contact_id", LongType(), False),
    ("category", StringType(), False),
    ("name", StringType(), True),
    ("created_at", DateType(), False),
    ("updated_at", DateType(), False),
    ("completed_on", DateType(), True),
    ("supplemental_data", StringType(), True),
    ("user_id", LongType(), True),
    ("start_on", DateType(), True),
)
NOTES_SCHEMA = _st(
    ("id", LongType(), False),
    ("need_id", LongType(), False),
    ("category", StringType(), False),
    ("body", StringType(), False),
    ("created_at", DateType(), False),
    ("updated_at", DateType(), False),
    ("import_data", StringType(), True),
)


def init_contacts_from_csv(spark: SparkSession, contacts_csv: str) -> DataFrame:
    """Create the persistent ``contacts`` table from a prepared
    contacts.csv (the step the Beacon app itself performs): surrogate ids
    assigned deterministically by nhs_number order; profile columns start
    NULL."""
    raw = spark.read.option("header", True).csv(contacts_csv)
    base = raw.select(
        F.when(F.col("nhs_number") != "", F.col("nhs_number")).alias("nhs_number"),
        "first_name",
        "surname",
    )
    with_ids = assign_surrogate_ids(base, ["nhs_number", "surname"], "id", 0)
    return with_ids.select(
        F.col("id").cast("long"),
        "nhs_number",
        "first_name",
        "surname",
        F.lit(None).cast(StringType()).alias("additional_info"),
        F.lit(None).cast(StringType()).alias("delivery_details"),
        F.lit(None).cast(StringType()).alias("dietary_details"),
        F.lit(None).cast(BooleanType()).alias("has_covid_symptoms"),
    )


def run_import(spark: SparkSession, db_dir: str, staging_dir: str) -> dict[str, int]:
    """Execute the full import workflow (``README.md:64-101``) against a
    parquet database directory:

      1. load staging CSVs into typed frames (tmp tables);
         the three needs files (food/callback/remaining) union into
         tmp_identified_needs exactly like the three ``\\COPY`` calls;
      2. triage needs + notes via the RETURNING pipeline;
      3. identified needs INSERT…SELECT;
      4. contact profile UPDATE…FROM;
      5. atomically swap the new table versions in.

    Returns row counts per table.  Writes go to ``*.new`` then rename —
    Spark cannot overwrite an input path it is lazily reading.
    """
    import os
    import shutil
    from os.path import join

    contacts = spark.read.parquet(join(db_dir, "contacts.parquet"))

    def load_or_empty(name: str, schema: StructType) -> DataFrame:
        p = join(db_dir, f"{name}.parquet")
        if os.path.exists(p):
            return spark.read.parquet(p)
        return spark.createDataFrame([], schema)

    needs = load_or_empty("needs", NEEDS_SCHEMA)
    notes = load_or_empty("notes", NOTES_SCHEMA)

    tmp_triage = read_staging(
        spark, join(staging_dir, "original_triage_needs.csv"), "original_triage_needs"
    )
    tmp_notes = read_staging(
        spark, join(staging_dir, "original_triage_notes.csv"), "original_triage_notes"
    )
    ident_parts = []
    for f in ("food_needs.csv", "callback_needs.csv", "remaining_needs.csv"):
        df = read_staging(spark, join(staging_dir, f), "identified_needs")
        ident_parts.append(df)
    tmp_ident = ident_parts[0]
    for df in ident_parts[1:]:
        tmp_ident = tmp_ident.unionByName(df)
    tmp_updates = read_staging(
        spark,
        join(staging_dir, "contact_profile_updates.csv"),
        "contact_profile_updates",
    )

    res = import_original_triage_needs_and_notes(
        contacts, needs, notes, tmp_triage, tmp_notes
    )
    needs2 = import_identified_needs(contacts, res.needs, tmp_ident)
    contacts2 = import_contact_profile_updates(contacts, tmp_updates)

    outputs = {"contacts": contacts2, "needs": needs2, "notes": res.notes}
    counts: dict[str, int] = {}
    for name, df in outputs.items():
        new = join(db_dir, f"{name}.parquet.new")
        df.write.mode("overwrite").parquet(new)
        counts[name] = spark.read.parquet(new).count()
    for name in outputs:
        final = join(db_dir, f"{name}.parquet")
        if os.path.exists(final):
            shutil.rmtree(final)
        os.rename(join(db_dir, f"{name}.parquet.new"), final)
    return counts


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
