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


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the Q3-shaped
    join+agg+top-k (customer ⋈ orders ⋈ lineitem with broadcast dim,
    exact integer revenue)."""
    return _catalog.QUERIES["top_revenue"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions)."""
    return dict(_catalog.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query."""
    return dict(_catalog.ORACLES)
