"""Declarative data-quality checks (the Deequ/Great-Expectations shape,
re-expressed as DataFrame aggregations).

Three check families, each returning the same report schema
``(check_name STRING, violations BIGINT, total BIGINT, passed BOOLEAN)``
so reports union cleanly:

  * ``row_checks`` — per-row predicates (completeness, range, domain).
    ALL predicates evaluate in ONE scan as conditional aggregates —
    adding a check adds a column to the agg, never a pass over the
    data — then unpivot to the long report via a literal-array explode
    (rows = number of checks, driver never involved).
  * ``unique_check`` — key uniqueness: violations = surplus copies
    (Σ max(cnt-1, 0)); one hash aggregation on the key, map-side
    partial combine makes the exchange O(distinct keys).
  * ``referential_check`` — orphaned foreign keys via LEFT ANTI join
    against the parent's key projection (broadcast when the parent is
    dimension-sized — pass ``broadcast_parent=True``).

At 100 TB a full table-quality report is therefore: one wide scan
(row checks) + one key agg per uniqueness rule + one semi-join per FK
rule — the same cost profile a hand-written audit would have, with the
report assembly free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_REPORT_COLS = ("check_name", "violations", "total", "passed")


def _finish(df: DataFrame) -> DataFrame:
    return df.select(
        "check_name",
        F.col("violations").cast("bigint").alias("violations"),
        F.col("total").cast("bigint").alias("total"),
        (F.col("violations") == 0).alias("passed"),
    )


def row_checks(df: DataFrame, checks: dict[str, Column]) -> DataFrame:
    """One report row per named VIOLATION predicate (a row matching the
    predicate is a violation).  Single scan, conditional aggregation.
    """
    if not checks:
        raise ValueError("row_checks requires at least one predicate")
    aggs = [
        F.sum(F.when(cond, 1).otherwise(0)).alias(f"__v{i}")
        for i, (_, cond) in enumerate(checks.items())
    ]
    one = df.agg(*aggs, F.count(F.lit(1)).alias("__t"))
    pairs = F.array(
        *[
            F.struct(
                F.lit(name).alias("check_name"),
                F.col(f"__v{i}").alias("violations"),
            )
            for i, name in enumerate(checks)
        ]
    )
    return _finish(
        one.select(F.explode(pairs).alias("p"), F.col("__t").alias("total"))
        .select("p.check_name", "p.violations", "total")
    )


def unique_check(df: DataFrame, cols: list[str], name: str) -> DataFrame:
    """Key-uniqueness report row: violations counts the SURPLUS rows
    (every copy beyond the first) so a clean key reports 0."""
    counted = df.groupBy(*cols).agg(F.count(F.lit(1)).alias("__c"))
    return _finish(
        counted.agg(
            F.coalesce(
                F.sum(F.when(F.col("__c") > 1, F.col("__c") - 1)), F.lit(0)
            ).alias("violations"),
            F.sum("__c").alias("total"),
        ).select(F.lit(name).alias("check_name"), "violations", "total")
    )


def referential_check(
    child: DataFrame,
    child_key: str,
    parent: DataFrame,
    parent_key: str,
    name: str,
    broadcast_parent: bool = True,
) -> DataFrame:
    """Orphaned-FK report row: child rows whose key has no parent.
    NULL child keys are not orphans (completeness is ``row_checks``'
    job — the classic Deequ split)."""
    keys = parent.select(F.col(parent_key).alias(child_key)).distinct()
    if broadcast_parent:
        keys = F.broadcast(keys)
    orphans = child.filter(F.col(child_key).isNotNull()).join(
        keys, child_key, "left_anti"
    )
    return _finish(
        orphans.agg(F.count(F.lit(1)).alias("violations"))
        .crossJoin(child.agg(F.count(F.lit(1)).alias("total")))
        .select(F.lit(name).alias("check_name"), "violations", "total")
    )


def quality_report(parts: list[DataFrame]) -> DataFrame:
    """Union any number of check frames into one report."""
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(*_REPORT_COLS)
