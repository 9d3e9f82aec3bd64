"""Mega-order width probe for the paired-comparison tier (VERDICT r6
item 5).

``bradley_terry_rating`` and ``preference_cycle_audit`` share one
volume-bearing stage: the within-order duel expansion ``lines a JOIN
lines b ON a.ok = b.ok AND a < b`` (catalog_r6h._BT_MATCHES_SQL) —
C(L, 2) pairs per order, where TPC-H structurally caps L at 7 lines
(≤ 21 pairs/order).  That bound is a DATA property, not a plan
property: a marketplace-style mega-order with thousands of lines makes
one key explode quadratically — the same pathology the 20k-part
mega-basket probe exposed in item-item CF (PERF.md r5).

This probe measures the cliff directly: a fixed ~ROWS-row synthetic
duel table is regrouped into orders of L ∈ WIDTHS lines each (total
rows constant, so any wall growth is pure fan-out), and the matches +
pairs aggregation is timed per width.  Expected shape: total pairs =
rows · (L−1) / 2 — LINEAR in L at fixed row count — so the wall
follows L and the probe records where it leaves the interactive
budget.

The probe also times the O(L·N_nations) REWRITE at the widest setting:
wins_{i,j} within an order decompose as Σ_{a∈i} #{b∈j : p_b < p_a},
which a per-(order, opponent-nation) running count computes with
L·N rows instead of C(L,2) — the escape hatch a mega-order dataset
would need (N = 25 nations here, so the crossover is where
(L−1)/2 > N ≈ L > 51).

Output: one JSON line; findings + the guard doctrine go to PERF.md,
and tests/test_physical_plans.py::test_bt_pair_width_bound asserts the
testdata's actual L stays inside the measured-safe band.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from beacon_data_importer_spark.session import get_spark
from beacon_data_importer_spark.sources.parquet import read_table

WIDTHS = [7, 50, 200, 1000, 4000]
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def build_lines(spark, sf_dir: str):
    """The catalog's `lines` table (order, line, supplier nation,
    price) with a dense row id so widths can regroup it exactly."""
    li = read_table(spark, sf_dir, "lineitem")
    su = read_table(spark, sf_dir, "supplier")
    lines = li.join(su, li.l_suppkey == su.s_suppkey).select(
        F.col("s_nationkey").alias("nat"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("p"),
    )
    # Dense ids so every width regroups the SAME row budget exactly.
    # A global window is fine here: one-time probe setup, excluded
    # from every timing.
    return lines.withColumn(
        "rid", F.row_number().over(Window.orderBy("p", "nat"))
    )


def pairs_wall(lines, width: int) -> tuple[float, int]:
    """Regroup the row budget into orders of `width` lines and run the
    duel expansion + per-(i,j) win aggregation; returns (sec, pairs)."""
    grouped = lines.withColumn("ok", (F.col("rid") / width).cast("bigint"))
    grouped = grouped.localCheckpoint()  # isolate expansion cost
    a = grouped.select("ok", F.col("rid").alias("ra"),
                       F.col("nat").alias("ni"), F.col("p").alias("pa"))
    b = grouped.select("ok", F.col("rid").alias("rb"),
                       F.col("nat").alias("nj"), F.col("p").alias("pb"))
    t0 = time.time()
    pairs = (
        a.join(b, "ok")
        .filter((F.col("ra") < F.col("rb")) & (F.col("ni") != F.col("nj")))
    )
    n_pairs = pairs.count()
    wins = (
        pairs.groupBy("ni", "nj")
        .agg(
            F.sum(F.when(F.col("pa") > F.col("pb"), 1).otherwise(0))
            .alias("w_ij")
        )
    )
    wins.write.format("noop").mode("overwrite").save()
    return time.time() - t0, n_pairs


def linear_wall(lines, width: int) -> tuple[float, int]:
    """The O(L·N) rewrite at the same width: explode each line against
    the bounded nation dimension and count opponents below by a
    per-(order, opponent) running count over the price order."""
    grouped = lines.withColumn("ok", (F.col("rid") / width).cast("bigint"))
    grouped = grouped.localCheckpoint()
    nations = grouped.select(F.col("nat").alias("opp")).distinct()
    t0 = time.time()
    # Every line × every nation (bounded N=25 broadcast), with a 0/1
    # indicator for "this row belongs to the opponent nation"; a
    # per-(order, opponent) RANGE window on the integer price then
    # counts opponent lines STRICTLY below each real line's price —
    # wins_{i,j} per order without materializing any line×line pair.
    ind = grouped.crossJoin(F.broadcast(nations)).withColumn(
        "is_opp", F.when(F.col("nat") == F.col("opp"), 1).otherwise(0)
    )
    w = (
        Window.partitionBy("ok", "opp")
        .orderBy("p")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    wins = (
        ind.withColumn(
            "opp_below", F.coalesce(F.sum("is_opp").over(w), F.lit(0))
        )
        .filter(F.col("is_opp") == 0)  # real (a, opponent-j) rows only
        .groupBy(F.col("nat").alias("ni"), F.col("opp").alias("nj"))
        .agg(F.sum("opp_below").alias("w_ij"))
    )
    n_rows = ind.count()
    wins.write.format("noop").mode("overwrite").save()
    return time.time() - t0, n_rows


def main() -> None:
    spark = get_spark()
    lines = build_lines(spark, SF_DIR).localCheckpoint()
    n = lines.count()
    out = {"rows": n, "sf_dir": SF_DIR, "widths": {}}
    for width in WIDTHS:
        sec, pairs = pairs_wall(lines, width)
        out["widths"][width] = {
            "pairs": pairs,
            "pairs_sec": round(sec, 2),
        }
        print(f"width={width}: pairs={pairs} wall={sec:.2f}s",
              file=sys.stderr)
    sec_lin, rows_lin = linear_wall(lines, WIDTHS[-1])
    out["linear_rewrite_at_max_width"] = {
        "rows": rows_lin,
        "sec": round(sec_lin, 2),
    }
    print(f"linear rewrite at width={WIDTHS[-1]}: rows={rows_lin} "
          f"wall={sec_lin:.2f}s", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
