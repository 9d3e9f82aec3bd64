"""Pure-Python oracle reimplementing the reference pipeline semantics
row-by-row (cited to /root/reference/beacon/prepare_calls.py and
prepare_contacts.py) for golden-output comparison against the Spark
plans.  Independent implementation in plain dicts — used only by tests.
"""

from __future__ import annotations

import csv
import json
import re
import sys
from datetime import date, datetime, timedelta
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from beacon_data_importer_spark.config.calls_schema import (
    LABELED_FIELDS,
    LOGICAL_NAMES,
)

MSGS = {
    "triage": "[Import]: Imported from call log spreadsheet",
    "call_log": "[Import]: Imported call log",
    "generic": "[Import]: Need created automatically from imported call log",
    "callback": (
        "[Import]: Callback need created automatically because the imported "
        "call log had a food need or callback date specified"
    ),
    "closed_food": (
        "[Import]: Marked completed because priority 1 and 2 food needs were "
        "all met by the time the call log was imported"
    ),
    "other": (
        '[Import]: Need created automatically because the imported call log '
        'had an "Other referral" or filled in "Additional support"'
    ),
}


def parse_date(v):  # helpers.py:8-11 via petl convert error->None
    try:
        return datetime.strptime(v, "%d/%m/%Y").date().isoformat()
    except ValueError:
        return None


def compose(row, labeled=LABELED_FIELDS, prefix=()):  # prepare_calls.py:193-201
    lines = list(prefix)
    for label, key in labeled:
        v = row.get(key)
        if v and str(v).strip():
            lines.append(f"{label}: {str(v).strip()}")
    return "\n".join(lines)


def load_spreadsheet(calls_csv: str) -> list[dict]:
    with open(calls_csv, encoding="windows-1252", newline="") as fh:
        reader = csv.reader(fh)
        next(reader)  # header
        raw = [dict(zip(LOGICAL_NAMES, r)) for r in reader]
    rows = []
    for r in raw:
        if not r["latest_attempt_date"]:  # prepare_calls.py:36
            continue
        r = dict(r)
        r["import_data"] = json.dumps(
            {k: r[k] for k in LOGICAL_NAMES}
        )  # serialize BEFORE date convert (prepare_calls.py:37-38)
        r["latest_attempt_date"] = parse_date(r["latest_attempt_date"])
        r["created_at"] = r["latest_attempt_date"]
        r["updated_at"] = r["latest_attempt_date"]
        rows.append(r)
    return rows


def needs_food(r):  # prepare_calls.py:308-311 (raw values)
    return (
        r["outcome"] in ["Food referral ", "Food and Other referral"]
        or r["food_priority"]
    )


def has_complex(r):
    return (
        r["addl_adult_social_care"]
        or r["addl_children_services"]
        or r["addl_safeguarding"]
    )


def has_simple(r):
    return (
        r["addl_housing_waste"]
        or r["addl_medical_appt_transport"]
        or r["addl_referrals"]
    )


def has_misc(r):
    return r["addl_misc_other1"] or r["addl_misc_other2"]


def parse_callback(v):  # prepare_calls.py:292-306; no-match raises -> None
    m = re.search(r"(\d+[/\.]\d+[/\.]\d+)", v)
    if not m:
        return None
    s = m.group(1)
    for fmt in ("%d/%m/%Y", "%d.%m.%y"):
        try:
            return datetime.strptime(s, fmt).date().isoformat()
        except ValueError:
            pass
    return None


def build(calls_csv: str, fnu: int, cnu: int, snu: int, clru: int) -> dict:
    sheet = load_spreadsheet(calls_csv)
    out: dict[str, list[dict]] = {}

    triage = []
    for r in sheet:
        completed = (
            r["latest_attempt_date"]
            if r["was_contact_made"].lower() in ["yes", "no 3 attempts made"]
            else None
        )
        triage.append(
            dict(nhs_number=r["nhs_number"], category="phone triage",
                 name=MSGS["triage"], created_at=r["created_at"],
                 updated_at=r["updated_at"], completed_on=completed)
        )
    out["original_triage_needs"] = triage

    call_notes = []
    for r in sheet:  # prepare_calls.py:248-274; unmatched -> silently dropped
        w = r["was_contact_made"].lower()
        fail = "phone_message" if r["outcome"] == "Left voicemail" else "phone_failure"
        if w == "yes":
            cat, n = "phone_success", 1
        elif w in ("no -1 attempt made", "invalid phone numbers"):
            cat, n = fail, 1
        elif w == "no 2 attempts made":
            cat, n = fail, 2
        elif w == "no 3 attempts made":
            cat, n = fail, 3
        else:
            continue
        for _ in range(n):
            call_notes.append(
                dict(nhs_number=r["nhs_number"], category=cat,
                     body=MSGS["call_log"], created_at=r["created_at"],
                     updated_at=r["updated_at"])
            )
    out["original_triage_call_notes"] = call_notes

    import_notes = [
        dict(nhs_number=r["nhs_number"], category="phone_import",
             body=compose(r), created_at=r["created_at"],
             updated_at=r["updated_at"], import_data=r["import_data"])
        for r in sheet
    ]
    out["original_triage_notes"] = import_notes + [
        {**n, "import_data": None} for n in call_notes
    ]

    food = []
    for r in sheet:
        if not needs_food(r):
            continue
        r2 = dict(r)
        m = re.search(r"priority (\d)", r2["food_priority"], re.IGNORECASE)
        r2["food_priority"] = m.group(1) if m else None
        supp = {"food_service_type": "Grocery delivery"}
        if r2["food_priority"]:
            supp["food_priority"] = r2["food_priority"]
        completed = (
            r2["latest_attempt_date"] if r2["food_priority"] in ["1", "2"] else None
        )
        prefix = [MSGS["generic"]] + ([MSGS["closed_food"]] if completed else [])
        food.append(
            dict(nhs_number=r2["nhs_number"], category="groceries and cooked meals",
                 name=compose(r2, prefix=prefix), created_at=r2["created_at"],
                 updated_at=r2["updated_at"], completed_on=completed,
                 supplemental_data=json.dumps(supp), user_id=fnu)
        )
    out["food_needs"] = food

    callback = []
    for r in sheet:
        r2 = dict(r)
        r2["callback_date"] = parse_callback(r2["callback_date"])
        if not (
            r2["callback_date"] or needs_food(r2) or r2["outcome"] == "Call back "
        ):
            continue
        start = r2["callback_date"] or (
            date.fromisoformat(r2["latest_attempt_date"]) + timedelta(days=6)
        ).isoformat()
        callback.append(
            dict(nhs_number=r2["nhs_number"], category="phone triage",
                 name=compose(r2, prefix=[MSGS["callback"]]),
                 created_at=r2["created_at"], updated_at=r2["updated_at"],
                 start_on=start)
        )
    out["callback_needs"] = callback

    def simple_pipe(flag, cat, user):
        return [
            dict(nhs_number=r["nhs_number"], category=cat,
                 name=compose(r, prefix=[MSGS["other"]]),
                 created_at=r["created_at"], updated_at=r["updated_at"],
                 user_id=user)
            for r in sheet
            if r[flag]
        ]

    prescription = simple_pipe("addl_medication_prescriptions", "prescription pickups", snu)
    mental = simple_pipe("addl_mental_wellbeing", "physical and mental wellbeing", cnu)
    financial = simple_pipe("addl_financial", "financial support", cnu)
    other = []
    for r in sheet:
        if not (
            r["outcome"] in ["Other referral", "Food and Other referral"]
            or has_complex(r) or has_simple(r) or has_misc(r)
        ):
            continue
        user = cnu if has_complex(r) else (snu if has_simple(r) else clru)
        other.append(
            dict(nhs_number=r["nhs_number"], category="other",
                 name=compose(r, prefix=[MSGS["other"]]),
                 created_at=r["created_at"], updated_at=r["updated_at"],
                 user_id=user)
        )
    out["remaining_needs"] = prescription + mental + financial + other

    updates = []
    for r in sheet:
        covid = r["has_covid_symptoms"].strip().lower()
        updates.append(
            dict(
                nhs_number=r["nhs_number"],
                # reference typo: support_already_geting key matches nothing
                additional_info=compose(
                    r,
                    labeled=[
                        ("How many people in household", "household_count"),
                        ("Notes", "notes"),
                    ],
                ),
                delivery_details=compose(
                    r,
                    labeled=[
                        ("Delivery contact details", "delivery_contact"),
                        ("Any special delivery information", "delivery_special_info"),
                    ],
                ),
                dietary_details=(
                    None
                    if r["dietary_requirements"].lower().strip() == "no"
                    else r["dietary_requirements"]
                ),
                has_covid_symptoms=(
                    True if covid == "yes" else False if covid == "no" else None
                ),
            )
        )
    out["contact_profile_updates"] = updates

    # QA (prepare_calls.py:145-173): first-wins/multi lookups
    def first(rows):
        d = {}
        for r in rows:
            d.setdefault(r["nhs_number"], r)
        return d

    def multi(rows):
        d: dict[str, list] = {}
        for r in rows:
            d.setdefault(r["nhs_number"], []).append(r)
        return d

    otn1, cn_m, food1, cb1 = (
        first(triage), multi(call_notes), first(food), first(callback)
    )
    rem_m = multi(out["remaining_needs"])
    qa = []
    for r in sheet:
        notes_m = cn_m.get(r["nhs_number"])
        fm = food1.get(r["nhs_number"])
        cb = cb1.get(r["nhs_number"])
        rem = rem_m.get(r["nhs_number"])
        food_block = None
        if fm:
            pr = json.loads(fm["supplemental_data"]).get("food_priority", "")
            st = "Completed" if fm["completed_on"] else "To do"
            food_block = (
                f"Food need created\nPriority: {pr}\nStatus: {st}"
                f"\nAssigned to: {fm['user_id']}"
            )
        qa.append(
            dict(
                nhs_number=r["nhs_number"],
                latest_attempt_date=r["latest_attempt_date"],
                original_triage_status=(
                    "Completed" if otn1[r["nhs_number"]]["completed_on"] else "To do"
                ),
                original_triage_call_notes=(
                    ", ".join(n["category"] for n in notes_m) if notes_m else None
                ),
                food_need=food_block,
                callback_need=(
                    f"Callback need created\nStart on: {cb['start_on']}" if cb else None
                ),
                remaining_needs=(
                    "\n".join(
                        f"{n['category'].title()} (Assigned to {n['user_id']})"
                        for n in rem
                    )
                    if rem
                    else None
                ),
                call_log=compose(r),
            )
        )
    out["quality_assurance"] = qa
    return out


def build_contacts(gds_csv: str, now: str) -> list[dict]:
    """prepare_contacts.py:8-52 (with the missing-import bug fixed as
    intended)."""
    with open(gds_csv, newline="") as fh:
        reader = csv.reader(fh)
        header = next(reader)
        rows = [dict(zip(header, r)) for r in reader]
    out = []
    for r in rows:
        parts = [r["Address1"], r["Address2"], r["Address3"], r["Address4"],
                 r["Address5"], r["Postcode"]]
        out.append(
            dict(
                nhs_number=r["NHSNumber"], first_name=r["FirstName"],
                middle_names=r["MiddleName"], surname=r["LastName"],
                address=", ".join(p for p in parts if p),
                postcode=r["Postcode"], telephone=r["Phone"], mobile=r["Mobile"],
                date_of_birth=parse_date(r["DOB"]),
                created_at=now, updated_at=now,
                gds_import_data=json.dumps({k: r[k] for k in header}),
            )
        )
    return out
