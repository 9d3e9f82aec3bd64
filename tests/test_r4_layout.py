"""Physical-plan guards for the round-4 data-layout tier: the layout
queries must not only return correct rows (the oracle gate proves that)
but produce the plan SHAPE that justifies their existence — a bucketed
join with no shuffle on the join key, a partitioned scan that prunes at
planning time, a Z-order layout that actually prunes files for a
two-dimensional box where a linear sort cannot.
"""

from __future__ import annotations

import contextlib

import pytest
from pyspark.sql import functions as F

import beacon_data_importer_spark.catalog_r4  # noqa: F401 (registers queries)
from beacon_data_importer_spark.catalog import EXTRA_QUERIES, QUERIES

ALL_QUERIES = {**QUERIES, **EXTRA_QUERIES}


@contextlib.contextmanager
def _conf(spark, key: str, value: str):
    old = spark.conf.get(key, None)
    spark.conf.set(key, value)
    try:
        yield
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


def _executed_plan(df) -> str:
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange_on_the_join_key(spark, sf_dir):
    # Broadcast is the right plan at toy scale; disable it so the
    # layout claim under test — bucketing replaces the join shuffle —
    # becomes visible as a SortMergeJoin with no Exchange below it.
    with _conf(spark, "spark.sql.autoBroadcastJoinThreshold", "-1"):
        with _conf(spark, "spark.sql.adaptive.autoBroadcastJoinThreshold", "-1"):
            plan = _executed_plan(ALL_QUERIES["bucketed_join"](spark, sf_dir))
    assert "SortMergeJoin" in plan, plan
    assert "Bucketed: true" in plan, plan
    # the only allowed exchange is the post-join nationkey aggregation
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "c_nationkey" in line, f"join-key shuffle survived: {line}"


def test_partitioned_scan_prunes_at_planning_time(spark, sf_dir):
    df = ALL_QUERIES["partitioned_scan_prune"](spark, sf_dir)
    plan = _executed_plan(df)
    assert "PartitionFilters: [" in plan
    # the source predicate must be a partition filter, not a data filter
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "source" in pf, plan
    import re

    assert "IN (src1,src7,src12)" in re.sub(r"#\d+", "", pf), pf
    # column pruning rides along: the scan must not read the text column
    rs = plan.split("ReadSchema: ", 1)[1].splitlines()[0]
    assert "text" not in rs, rs


def test_zorder_prunes_where_linear_sort_cannot(spark, sf_dir):
    from beacon_data_importer_spark.catalog_r4 import (
        _Z_BOX,
        _Z_FILES,
        q_zorder_layout,
    )
    from beacon_data_importer_spark.sources.parquet import read_table
    from pyspark.sql import Window

    rows = ALL_QUERIES["zorder_layout"](spark, sf_dir).collect()
    assert len(rows) == _Z_FILES
    z_scanned = sum(1 for r in rows if r["scanned_for_box"])
    assert 0 < z_scanned < _Z_FILES, "Z-order layout prunes nothing"

    # baseline: same files, linearly sorted on x only — every file's y
    # envelope spans the whole domain, so the y-stripe cannot prune and
    # only the x-stripe does.
    x_lo, x_hi, y_lo, y_hi = _Z_BOX
    o = read_table(spark, sf_dir, "orders")
    day_no = F.datediff(
        F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")
    ).cast("bigint")
    mask = (1 << 16) - 1
    pts = o.select(
        F.col("o_custkey").bitwiseAND(mask).alias("x"),
        day_no.bitwiseAND(mask).alias("y"),
        "o_orderkey",
    )
    w = Window.orderBy("x", "o_orderkey")
    filed = pts.select("x", "y", F.ntile(_Z_FILES).over(w).alias("file_id"))
    base = (
        filed.groupBy("file_id")
        .agg(
            F.min("x").alias("min_x"),
            F.max("x").alias("max_x"),
            F.min("y").alias("min_y"),
            F.max("y").alias("max_y"),
        )
        .collect()
    )
    x_scanned = sum(
        1
        for r in base
        if r["min_x"] <= x_hi
        and r["max_x"] >= x_lo
        and r["min_y"] <= y_hi
        and r["max_y"] >= y_lo
    )
    assert z_scanned <= x_scanned, (z_scanned, x_scanned)


def test_global_ntile_matches_window_ntile(shuffle4, spark):
    """operators/order.py global_ntile must equal ntile() OVER for
    divisible and non-divisible totals, under any input order.  Runs
    at 4 shuffle partitions (shuffle4 fixture) so the cross-partition
    boundary math is the path under test."""
    from beacon_data_importer_spark.operators.order import global_ntile
    from pyspark.sql import Window

    for total, n in ((1000, 8), (1003, 8), (37, 5), (5, 7)):
        df = (
            spark.range(total)
            .select(
                (F.col("id") * 2654435761 % 1000003).alias("key"),
                F.col("id").alias("tie"),
            )
            .repartition(7)
        )
        got = {
            (r.key, r.tie): r["__ntile"]
            for r in global_ntile(df, n, ["key", "tie"]).collect()
        }
        want = {
            (r.key, r.tie): r.nt
            for r in df.select(
                "key",
                "tie",
                F.ntile(n).over(Window.orderBy("key", "tie")).alias("nt"),
            ).collect()
        }
        assert got == want, (total, n)


def test_concurrent_layout_staging_is_safe(spark, sf_dir):
    """Four threads invoking the bucketed-join query concurrently from
    a COLD staging cache must all succeed with identical results — the
    staging lock serializes the one-time table write instead of racing
    overwrites on the same warehouse location."""
    import threading

    from beacon_data_importer_spark import catalog_r4

    # force a cold staging path for this process
    for k in [k for k in catalog_r4._STAGED if k[0] == "bucketed"]:
        del catalog_r4._STAGED[k]

    results, errors = [], []

    def run():
        try:
            rows = sorted(
                map(tuple, ALL_QUERIES["bucketed_join"](spark, sf_dir).collect())
            )
            results.append(rows)
        except Exception as e:  # noqa: BLE001 — surfacing into the assert
            errors.append(repr(e))

    threads = [threading.Thread(target=run) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    assert len(results) == 4 and all(r == results[0] for r in results)
    assert len(results[0]) > 0
