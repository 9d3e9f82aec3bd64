"""CI gate for the EXTRA catalog queries (registered=False).

The driver's correctness gate verifies the first 50 registered queries;
extras — queries whose operator coverage is subsumed by a registered
query — are verified HERE with exactly the driver-mimicking comparison
from tools/check_oracle.py (row count, sorted columns, type-sensitive
order-insensitive value hash vs the DuckDB oracle).  This keeps every
catalog entry under an automated cross-engine check even when it does
not occupy one of the driver's 50 slots.
"""

from __future__ import annotations

import importlib.util
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.conftest import SF_DIR

_spec = importlib.util.spec_from_file_location(
    "check_oracle",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools",
        "check_oracle.py",
    ),
)
check_oracle = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(check_oracle)

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


@pytest.fixture(scope="module")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def _extra_names():
    from beacon_data_importer_spark import catalog

    import beacon_data_importer_spark.catalog_ext  # noqa: F401
    import beacon_data_importer_spark.catalog_more  # noqa: F401
    import beacon_data_importer_spark.catalog_r2  # noqa: F401
    import beacon_data_importer_spark.catalog_r3  # noqa: F401
    import beacon_data_importer_spark.catalog_r3b  # noqa: F401
    import beacon_data_importer_spark.catalog_r3c  # noqa: F401
    import beacon_data_importer_spark.catalog_r4  # noqa: F401
    import beacon_data_importer_spark.catalog_r5  # noqa: F401

    return sorted(catalog.EXTRA_QUERIES)


def test_registered_query_count_is_at_most_50():
    from beacon_data_importer_spark import catalog

    import beacon_data_importer_spark.catalog_ext  # noqa: F401
    import beacon_data_importer_spark.catalog_more  # noqa: F401
    import beacon_data_importer_spark.catalog_r2  # noqa: F401
    import beacon_data_importer_spark.catalog_r3  # noqa: F401
    import beacon_data_importer_spark.catalog_r3b  # noqa: F401
    import beacon_data_importer_spark.catalog_r3c  # noqa: F401
    import beacon_data_importer_spark.catalog_r4  # noqa: F401
    import beacon_data_importer_spark.catalog_r5  # noqa: F401

    assert len(catalog.QUERIES) <= 50, (
        "driver gate checks the first 50 queries; demote the overflow to "
        "EXTRA_QUERIES (registered=False)"
    )


@pytest.mark.parametrize("name", _extra_names())
def test_extra_query_matches_oracle(spark, duck, name):
    from beacon_data_importer_spark import catalog

    spdf = catalog.EXTRA_QUERIES[name](spark, SF_DIR).toPandas()
    if name in catalog.ROWS_ONLY:
        # documented no-SQL-twin query (catalog.ROWS_ONLY): the oracle
        # compare is replaced by a dedicated invariant test elsewhere;
        # here just require a non-trivial result.
        assert name not in catalog.EXTRA_ORACLES, f"{name}: ROWS_ONLY yet has oracle"
        assert len(spdf) > 0, f"{name}: ROWS_ONLY query returned no rows"
        return
    assert name in catalog.EXTRA_ORACLES, f"extra {name} has no oracle"
    dpdf = duck.execute(catalog.EXTRA_ORACLES[name]).df()

    assert len(spdf) == len(dpdf), f"{name}: rowcount {len(spdf)} != {len(dpdf)}"
    assert sorted(spdf.columns) == sorted(dpdf.columns), f"{name}: schema"
    sh, slines = check_oracle.frame_digest(spdf)
    dh, dlines = check_oracle.frame_digest(dpdf)
    if sh != dh:
        diff = [(a, b) for a, b in zip(slines, dlines) if a != b][:3]
        pytest.fail(f"{name}: value hash mismatch; first diffs {diff}")
