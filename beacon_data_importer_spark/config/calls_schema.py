"""Call-log source schema: the 29 messy spreadsheet headers, their
logical names, and presentation labels.

This is configuration data mirroring the reference's header mapping
(``calls_header_map.py:1-124``) — the original headers must match the
source spreadsheet byte-for-byte, INCLUDING trailing spaces (e.g.
``'Contact Sucessful '`` sic, ``'Food Requirements Priority '``).
``label=None`` fields are excluded from rendered note bodies
(``prepare_calls.py:193-201``).

Stored as a flat tuple table (logical_name, original_header, label);
derived dicts below.
"""

from __future__ import annotations

FIELDS: tuple[tuple[str, str, str | None], ...] = (
    ("nhs_number", "NHSNUMBER", None),
    ("is_consolidation_record", "15/04/20 consolidation record", None),
    (
        "latest_attempt_date",
        "Contact attempted (date)  Format:  06/04/2020",
        None,
    ),
    ("latest_attempt_time", "Time. Format:  12:40", None),
    ("was_contact_made", "Contact Sucessful ", "Contact successful"),
    ("outcome", "Outcome complete at the end of the call", "Outcome"),
    (
        "support_already_getting",
        "If no support needed, what support are they getting and who is "
        "supporting them eg Govt food parcels/Age Uk/Other VCS, family "
        "member, friends, neighbours). If support need is likely to change "
        "eg resident would like a call back to check in with them - selec",
        "If no support needed, what support are they getting",
    ),
    ("food_priority", "Food Requirements Priority ", "Food requirements priority"),
    (
        "book_weekly_food_delivery",
        "Book weekly food delivery  yes/no",
        "Book weekly food delivery",
    ),
    (
        "callback_date",
        "Date to call resident back.  Add date below - 6 days from today's "
        "date (avoid weekend dates) format: 12/04/20",
        "Date to call resident back",
    ),
    (
        "household_count",
        "how many people in household? Basic number and if relevant eg baby, "
        "children",
        "How many people in household",
    ),
    (
        "dietary_requirements",
        "Do you have any special dietary requirements and notes? Eg special "
        "requirements - allergies, standard, vegetarian, vegan, baby, "
        "religious - halal  ",
        "Special dietary requirements",
    ),
    (
        "food_notes_or_needs",
        "Additional food notes  or essential items needed",
        "Additional food notes or essential items needed",
    ),
    (
        "delivery_contact",
        "Delivery contact details if different? Eg if someone needs to let "
        "deliverer in. Contact name and number",
        "Delivery contact details",
    ),
    (
        "delivery_special_info",
        "Any special delivery information - any times you cannot do/access?  "
        "Eg how to get to block/house/intercome/doorbell doesn't work - "
        "times to avoid eg when taking medication",
        "Any special delivery information",
    ),
    (
        "has_covid_symptoms",
        "Are you or anyone in your home showing any symptoms of COVID-19?",
        "Are you or anyone in your home showing any symptoms of COVID-19?",
    ),
    (
        "addl_adult_social_care",
        "Additional Support: Adult Social Care.  Complete if you or resident "
        "have concerns and want follow up action.",
        "Additional support: Adult Social Care",
    ),
    (
        "addl_children_services",
        "Additional Support: Children Services Complete if you or resident "
        "have concerns and want follow up action.",
        "Additional support: Children Services",
    ),
    (
        "addl_safeguarding",
        "Additional Support: Safeguarding Complete if you or resident have "
        "concerns and want follow up action.",
        "Additional support: Safeguarding",
    ),
    (
        "addl_mental_wellbeing",
        "Additional Support: Mental Wellbeing Referral Complete if you or "
        "resident have concerns and want follow up action.",
        "Additional support: Mental wellbeing",
    ),
    (
        "addl_housing_waste",
        "Additional Support: Housing/ Waste Disposal. Complete if you or "
        "resident have concerns and want follow up action.",
        "Additional support: Housing/waste disposal",
    ),
    (
        "addl_medication_prescriptions",
        "Additional Support: Medication/ prescriptions. ",
        "Additional support: Medication/prescriptions",
    ),
    (
        "addl_medical_appt_transport",
        "Additional Support: Medical appointment Transport. ",
        "Additional support: Medical appointment transport",
    ),
    (
        "addl_financial",
        "Additional Support: Financial guidance/ information. Complete if "
        "you or resident have concerns and want follow up action.",
        "Additional support: Financial guidance/information",
    ),
    (
        "addl_shopping",
        "Additional Support: Additional Shopping needs",
        "Additional support: Additional shopping needs",
    ),
    (
        "addl_referrals",
        "Additional Support: Other referrals (eg concerns for neighbour/friend)",
        "Additional support: Other referrals (eg concerns for neighbour/friend)",
    ),
    (
        "addl_misc_other1",
        "Additional Support: Miscellaneous Other",
        "Additional support: Miscellaneous other",
    ),
    (
        "addl_misc_other2",
        "Additional Support: Miscellaneous Other2",
        "Additional support: Miscellaneous other 2",
    ),
    (
        "notes",
        "Notes: Please add any helpful information from resident here",
        "Notes",
    ),
    (
        "was_told_about_support_line",
        "Have you told resident about the 24/7 Camden Council Covid 19 "
        "support line and website?                         Call:  020 7974 "
        "4444 extension 9  and www.camden.gov.uk/covid-19",
        "Told resident about support line and website",
    ),
)

LOGICAL_NAMES: tuple[str, ...] = tuple(f[0] for f in FIELDS)

#: original header -> logical name (the bulk-rename map, P1)
RENAME_MAP: dict[str, str] = {orig: logical for logical, orig, _ in FIELDS}

#: logical name -> label, for fields that render into note bodies (X4)
LABELS: dict[str, str] = {
    logical: label for logical, _, label in FIELDS if label is not None
}

#: (label, logical) pairs in source order — compose_body iterates these
LABELED_FIELDS: tuple[tuple[str, str], ...] = tuple(
    (label, logical) for logical, _, label in FIELDS if label is not None
)
