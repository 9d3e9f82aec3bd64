"""CI gate for the 50 REGISTERED catalog queries.

The authoritative check is the driver's sf0.01 gate, but that only runs
once per round — this module applies the identical driver-mimicking
comparison (row count, sorted columns, type-sensitive order-insensitive
value hash vs the DuckDB oracle) at sf0.001 on every pytest run, so a
regression in a registered query (e.g. an environment change in how
parquet timestamps are read) fails CI immediately instead of surfacing
in the next CORRECTNESS_r{N}.json.
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


def _registered_names():
    # all_catalogs auto-discovers every catalog module — the earlier
    # hardcoded import list froze this parametrization at the round-5
    # catalogs, and the round-7 rotation (which moved ALL registered
    # queries into later tiers) would have left the registered set with
    # ZERO per-query CI (round-7 find; same fix as test_extra_queries).
    from beacon_data_importer_spark import all_catalogs as catalog

    return sorted(catalog.QUERIES)


@pytest.fixture(scope="module")
def spark_results(spark):
    """name → pandas frame (or raised exception) for every registered
    query, built serially / executed on 8 threads — the same
    serial-analysis + parallel-execution split as
    test_extra_queries.spark_results (see its docstring for why the
    split is what makes the concurrency safe)."""
    import concurrent.futures

    from beacon_data_importer_spark import all_catalogs as catalog

    built = {}
    for n in _registered_names():
        try:
            built[n] = catalog.QUERIES[n](spark, SF_DIR)
        except Exception as ex:
            built[n] = ex

    def run(n):
        if isinstance(built[n], Exception):
            return built[n]
        try:
            return built[n].toPandas()
        except Exception as ex:
            return ex

    with concurrent.futures.ThreadPoolExecutor(8) as pool:
        futs = {n: pool.submit(run, n) for n in built}
        return {n: f.result() for n, f in futs.items()}


@pytest.mark.parametrize("name", _registered_names())
def test_registered_query_matches_oracle(spark, duck, spark_results, name):
    from beacon_data_importer_spark import catalog

    spdf = spark_results[name]
    if isinstance(spdf, Exception):
        raise spdf
    if name not in catalog.ORACLES:
        # Every registered query must carry an oracle: a driver slot
        # without one only gets the weak rows-only check, which is not
        # the bar this repo holds itself to.  (Genuinely
        # non-SQL-expressible ops belong in EXTRA_QUERIES with their own
        # dedicated tests, not in a driver slot.)
        pytest.fail(f"registered query {name!r} has no oracle_sql entry")
    dpdf = duck.execute(catalog.ORACLES[name]).df()

    assert len(spdf) == len(dpdf), f"{name}: rowcount {len(spdf)} != {len(dpdf)}"
    assert sorted(spdf.columns) == sorted(dpdf.columns), f"{name}: schema"
    sh, slines = check_oracle.frame_digest(spdf)
    dh, dlines = check_oracle.frame_digest(dpdf)
    if sh != dh:
        diff = [(a, b) for a, b in zip(slines, dlines) if a != b][:3]
        pytest.fail(f"{name}: value hash mismatch; first diffs {diff}")
