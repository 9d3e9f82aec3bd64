"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The queries themselves live in ``beacon_data_importer_spark.catalog``
(reference surface, SURVEY §2) and ``catalog_ext`` (training-data
extensions); this module just exposes the registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import beacon_data_importer_spark.catalog as _catalog
import beacon_data_importer_spark.catalog_ext as _catalog_ext  # noqa: F401 (registers queries)
import beacon_data_importer_spark.catalog_more as _catalog_more  # noqa: F401 (registers queries)
import beacon_data_importer_spark.catalog_r2 as _catalog_r2  # noqa: F401 (registers queries)
import beacon_data_importer_spark.catalog_r3 as _catalog_r3  # noqa: F401 (registers queries)
import beacon_data_importer_spark.catalog_r3b as _catalog_r3b  # noqa: F401 (registers queries)
import beacon_data_importer_spark.catalog_r3c as _catalog_r3c  # noqa: F401 (registers queries)
import beacon_data_importer_spark.catalog_r4 as _catalog_r4  # noqa: F401 (registers queries)
import beacon_data_importer_spark.catalog_r5 as _catalog_r5  # noqa: F401 (registers queries)
import beacon_data_importer_spark.catalog_r5b as _catalog_r5b  # noqa: F401 (registers queries)
import beacon_data_importer_spark.catalog_r5c as _catalog_r5c  # noqa: F401 (registers queries)
import beacon_data_importer_spark.catalog_r5d as _catalog_r5d  # noqa: F401 (registers queries)
import beacon_data_importer_spark.catalog_r5e as _catalog_r5e  # noqa: F401 (registers queries)
import beacon_data_importer_spark.catalog_r5f as _catalog_r5f  # noqa: F401 (registers queries)
import beacon_data_importer_spark.catalog_r5g as _catalog_r5g  # noqa: F401 (registers queries)
import beacon_data_importer_spark.catalog_r5h as _catalog_r5h  # noqa: F401 (registers queries)
import beacon_data_importer_spark.catalog_r5i as _catalog_r5i  # noqa: F401 (registers queries)
import beacon_data_importer_spark.catalog_r5j as _catalog_r5j  # noqa: F401 (registers queries)
import beacon_data_importer_spark.catalog_r5k as _catalog_r5k  # noqa: F401 (registers queries)
import beacon_data_importer_spark.catalog_r5l as _catalog_r5l  # noqa: F401 (registers queries)
import beacon_data_importer_spark.catalog_r5m as _catalog_r5m  # noqa: F401 (registers queries)
import beacon_data_importer_spark.catalog_r5n as _catalog_r5n  # noqa: F401 (registers queries)
import beacon_data_importer_spark.catalog_r5o as _catalog_r5o  # noqa: F401 (registers queries)
import beacon_data_importer_spark.catalog_r5p as _catalog_r5p  # noqa: F401 (registers queries)
import beacon_data_importer_spark.catalog_r5q as _catalog_r5q  # noqa: F401 (registers queries)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the Q3-shaped
    join+agg+top-k (customer ⋈ orders ⋈ lineitem with broadcast dim,
    exact integer revenue)."""
    flagship = {**_catalog.QUERIES, **_catalog.EXTRA_QUERIES}["top_revenue"]
    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions).

    Ordering is deliberate: the 50 REGISTERED queries (distinct operator
    shapes) come first, then the EXTRA queries (operator coverage
    subsumed by a registered query; verified by tests/test_extra_queries
    and tools/check_oracle.py) — the driver's gate checks the first 50
    registered rows, extras get checked when budget allows."""
    return {**_catalog.QUERIES, **_catalog.EXTRA_QUERIES}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query."""
    return {**_catalog.ORACLES, **_catalog.EXTRA_ORACLES}
