"""The contacts pipeline — Spark plan with the semantics of the
reference's ``prepare-contacts`` command (``prepare_contacts.py:8-52``).

scan → provenance JSON → timestamp extends → address concat → rename →
date convert (error-as-null) → project.  One narrow stage, no shuffle;
Catalyst prunes any extra source columns out of everything except the
provenance JSON (which intentionally captures the full row).

Recorded reference bug: as committed the reference crashes (``partial``
used but never imported, ``prepare_contacts.py:19``); this implements the
unambiguous intent.

Determinism note (X23): the reference stamps ``datetime.now()``; the
timestamp is a parameter here so runs are reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import expressions as E
from ..sources.csv import read_csv_stringly

RENAME = {
    "NHSNumber": "nhs_number",
    "FirstName": "first_name",
    "MiddleName": "middle_names",
    "LastName": "surname",
    "Postcode": "postcode",
    "DOB": "date_of_birth",
    "Phone": "telephone",
    "Mobile": "mobile",
}

OUTPUT_COLUMNS = [
    "nhs_number",
    "first_name",
    "middle_names",
    "surname",
    "address",
    "postcode",
    "telephone",
    "mobile",
    "date_of_birth",
    "created_at",
    "updated_at",
    "gds_import_data",
]

ADDRESS_PARTS = ["Address1", "Address2", "Address3", "Address4", "Address5", "Postcode"]


def prepare_contacts(spark: SparkSession, gds_file_path: str, now: str) -> DataFrame:
    """Build the contacts frame from a GDS CSV.

    ``now`` is the ISO timestamp stamped into created_at/updated_at
    (parameterized for determinism — reference ``prepare_contacts.py:14``).
    """
    gds = read_csv_stringly(spark, gds_file_path)
    source_columns = gds.columns  # header introspection (S3, fieldnames())

    return (
        gds.withColumn("gds_import_data", E.json_provenance(source_columns))
        .withColumn("created_at", F.lit(now))
        .withColumn("updated_at", F.lit(now))
        .withColumn("address", E.concat_address([F.col(c) for c in ADDRESS_PARTS]))
        .withColumnsRenamed(RENAME)
        .withColumn("date_of_birth", E.parse_date_dmy("date_of_birth"))
        .select(*OUTPUT_COLUMNS)
    )
