"""Tests for the relational import stage (SQL-script emulation):
RETURNING surrogate ids, note fan-out semantics, COALESCE updates,
inner-join drop of unmatched nhs_numbers (FIXTURES.md §A4)."""

from __future__ import annotations

import datetime

from pyspark.sql import Row

from beacon_data_importer_spark.plans import import_stage as imp

D = datetime.date


def _contacts(spark):
    return spark.createDataFrame(
        [
            Row(id=10, nhs_number="N1", additional_info=None,
                delivery_details="keep-me", dietary_details=None,
                has_covid_symptoms=None),
            Row(id=20, nhs_number="N2", additional_info="old-info",
                delivery_details=None, dietary_details="vegan",
                has_covid_symptoms=False),
        ]
    )


def _empty_needs(spark):
    return spark.createDataFrame(
        [],
        "id long, contact_id long, category string, name string, "
        "created_at date, updated_at date, completed_on date, "
        "supplemental_data string, user_id long, start_on date",
    )


def _empty_notes(spark):
    return spark.createDataFrame(
        [],
        "id long, need_id long, category string, body string, "
        "created_at date, updated_at date, import_data string",
    )


def test_returning_pipeline_ids_and_note_fanout(spark):
    contacts = _contacts(spark)
    tmp_needs = spark.createDataFrame(
        [
            Row(nhs_number="N1", category="phone triage", name="a",
                created_at=D(2020, 4, 1), updated_at=D(2020, 4, 1),
                completed_on=None),
            Row(nhs_number="N1", category="phone triage", name="b",
                created_at=D(2020, 4, 1), updated_at=D(2020, 4, 1),
                completed_on=D(2020, 4, 2)),
            Row(nhs_number="NX", category="phone triage", name="c",
                created_at=D(2020, 4, 1), updated_at=D(2020, 4, 1),
                completed_on=None),  # unmatched -> dropped
        ]
    )
    tmp_notes = spark.createDataFrame(
        [
            Row(nhs_number="N1", category="phone_import", body="note1",
                created_at=D(2020, 4, 1), updated_at=D(2020, 4, 1),
                import_data="{}"),
            Row(nhs_number="N1", category="phone_success", body="note2",
                created_at=D(2020, 4, 1), updated_at=D(2020, 4, 1),
                import_data=None),
            Row(nhs_number="N2", category="phone_import", body="note3",
                created_at=D(2020, 4, 1), updated_at=D(2020, 4, 1),
                import_data=None),  # no inserted need for N2 -> dropped
        ]
    )
    res = imp.import_original_triage_needs_and_notes(
        contacts, _empty_needs(spark), _empty_notes(spark), tmp_needs, tmp_notes
    )
    needs = res.needs.collect()
    assert sorted(r.id for r in needs) == [1, 2]  # dense from max(0)
    assert all(r.contact_id == 10 for r in needs)  # NX dropped

    notes = res.notes.collect()
    # 2 inserted needs for N1 × 2 staged notes = 4 rows (SQL fan-out)
    assert len(notes) == 4
    assert sorted(r.id for r in notes) == [1, 2, 3, 4]
    assert {r.need_id for r in notes} == {1, 2}


def test_identified_needs_resolution_and_id_offset(spark):
    contacts = _contacts(spark)
    needs = spark.createDataFrame(
        [(7, 10, "x", None, D(2020, 1, 1), D(2020, 1, 1), None, None, None, None)],
        "id long, contact_id long, category string, name string, "
        "created_at date, updated_at date, completed_on date, "
        "supplemental_data string, user_id long, start_on date",
    )
    tmp = spark.createDataFrame(
        [
            ("N2", "groceries and cooked meals", "food", D(2020, 4, 1),
             D(2020, 4, 1), None,
             '{"food_service_type": "Grocery delivery"}', 101, None),
        ],
        "nhs_number string, category string, name string, created_at date, "
        "updated_at date, completed_on date, supplemental_data string, "
        "user_id long, start_on date",
    )
    out = imp.import_identified_needs(contacts, needs, tmp).collect()
    assert len(out) == 2
    new = [r for r in out if r.id == 8][0]  # max(7)+1
    assert new.contact_id == 20 and new.user_id == 101


def test_profile_updates_coalesce(spark):
    contacts = _contacts(spark)
    tmp = spark.createDataFrame(
        [
            ("N1", "new-info", None, "halal", True),
            ("NX", "ignored", None, None, None),
        ],
        "nhs_number string, additional_info string, delivery_details string, "
        "dietary_details string, has_covid_symptoms boolean",
    )
    out = {r.nhs_number: r for r in
           imp.import_contact_profile_updates(contacts, tmp).collect()}
    n1 = out["N1"]
    assert n1.additional_info == "new-info"
    assert n1.delivery_details == "keep-me"  # NULL staged -> keep old
    assert n1.dietary_details == "halal"
    assert n1.has_covid_symptoms is True
    n2 = out["N2"]  # untouched
    assert n2.additional_info == "old-info" and n2.has_covid_symptoms is False


def test_run_import_end_to_end(spark, tmp_path):
    """Full workflow: prepare-calls outputs → typed staging (incl.
    multiline quoted bodies) → RETURNING pipeline → identified needs →
    profile updates, against a parquet database dir."""
    import fixtures
    from beacon_data_importer_spark.plans.calls import CallsUsers, prepare_calls
    from beacon_data_importer_spark.plans.contacts import prepare_contacts
    from beacon_data_importer_spark.plans.import_stage import (
        init_contacts_from_csv,
        run_import,
    )
    from beacon_data_importer_spark.sources.csv import write_csv_file

    staging = tmp_path / "staging"
    db = tmp_path / "db"
    staging.mkdir()
    db.mkdir()
    calls_csv = str(tmp_path / "calls.csv")
    gds_csv = str(tmp_path / "gds.csv")
    fixtures.write_calls_csv(calls_csv)
    fixtures.write_gds_csv(gds_csv)

    users = CallsUsers(101, 102, 103, 104)
    for name, df in prepare_calls(spark, calls_csv, users).items():
        write_csv_file(df, str(staging / f"{name}.csv"))
    contacts_csv = str(tmp_path / "contacts.csv")
    write_csv_file(
        prepare_contacts(spark, gds_csv, "2020-05-01T12:00:00"), contacts_csv
    )

    init_contacts_from_csv(spark, contacts_csv).write.parquet(
        str(db / "contacts.parquet")
    )
    counts = run_import(spark, str(db), str(staging))
    assert counts == {"contacts": 4, "needs": 10, "notes": 16}

    needs = spark.read.parquet(str(db / "needs.parquet"))
    ident = needs.filter(needs.category == "groceries and cooked meals").collect()
    assert len(ident) == 1
    assert ident[0].user_id == 101
    assert '"food_priority":"1"' in ident[0].supplemental_data
    # multiline name survived the staging round-trip
    assert "\n" in ident[0].name and ident[0].name.startswith("[Import]:")

    notes = spark.read.parquet(str(db / "notes.parquet"))
    # contact with 2 triage needs x staged notes fan-out preserved
    assert notes.count() == 16
    imp = notes.filter(notes.category == "phone_import").collect()
    assert all(n.import_data for n in imp)


def test_max_id_scalar_semantics(spark):
    """VERDICT r4 item 7: _max_id is a bounded driver-side scalar (one
    row per import batch) — 0 on empty, max otherwise, NULL-safe.  The
    per-row/fact-scale path is assign_surrogate_ids_scalable, which
    never reads back to the driver."""
    assert imp._max_id(_empty_needs(spark)) == 0
    df = spark.createDataFrame([(3,), (41,), (7,)], "id long")
    assert imp._max_id(df) == 41
    with_null = spark.createDataFrame(
        [Row(id=None)], "id long"
    )
    assert imp._max_id(with_null) == 0
