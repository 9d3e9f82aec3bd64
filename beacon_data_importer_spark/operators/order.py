"""Distributed global-order operators.

A plain ``Window.orderBy(...)`` with no partition key collapses the
whole input into ONE task — the classic silent scale-killer for global
ranks/ntiles.  ``global_ntile`` computes the IDENTICAL result of
``ntile(n) OVER (ORDER BY ...)`` with a range-partitioned sort plus a
per-partition offset table (the same device ``plans/calls.py`` uses
for CSV file order):

  1. ``repartitionByRange`` on the order key — each partition holds a
     disjoint key range (boundary placement does not affect the result,
     only balance);
  2. ``sortWithinPartitions`` — now the global order is (partition,
     local position);
  3. ``monotonically_increasing_id`` after the sort is a contiguous
     per-partition counter in sorted order, so global rank =
     per-partition offset + local counter;
  4. the offsets are a prefix sum over the per-partition counts — a
     partition-count-sized table, broadcast back;
  5. ntile's uneven-bucket rule (first ``total % n`` buckets get one
     extra row) is a closed-form expression over the 0-based rank.

Everything is JVM expressions; the only full exchange is the range
repartition a real global sort would pay anyway.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

def global_ntile(df: DataFrame, n: int, order_cols: list[str]) -> DataFrame:
    """Append an ``__ntile`` column equal to SQL
    ``ntile(n) OVER (ORDER BY order_cols)`` — distributed.

    ``order_cols`` must be a TOTAL order (add a tie-breaker id);
    otherwise ties may land in either neighboring tile depending on
    partitioning, and determinism is lost.
    """
    spark = df.sparkSession
    shuffle_n = int(
        spark.conf.get("spark.sql.shuffle.partitions", "200") or "200"
    )
    ranged = df.repartitionByRange(
        shuffle_n, *[F.col(c) for c in order_cols]
    ).sortWithinPartitions(*order_cols)
    with_ids = ranged.select(
        "*",
        F.spark_partition_id().alias("__pid"),
        F.monotonically_increasing_id().alias("__mid"),
    )
    # Pin the partitioning: the offset table and the final join both
    # consume this frame, and re-evaluating a range partitioning can
    # re-sample different boundaries — mismatched pids would corrupt
    # the ranks.  (A real OPTIMIZE ZORDER materializes here anyway.)
    with_ids = with_ids.localCheckpoint()
    counts = with_ids.groupBy("__pid").agg(
        F.count(F.lit(1)).alias("__n"), F.min("__mid").alias("__mid0")
    )
    w = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__pid",
        "__mid0",
        F.coalesce(F.sum("__n").over(w), F.lit(0)).alias("__off"),
        F.sum("__n").over(Window.partitionBy()).alias("__total"),
    )
    # per-partition min(mid) instead of assuming the counter stride —
    # robust to any monotonically_increasing_id layout
    local = F.col("__mid") - F.col("__mid0")
    rank0 = (F.col("__off") + local).cast("bigint")
    q = (F.col("__total") / n).cast("bigint")  # floor: total // n
    rem = F.col("__total") - q * n
    # first `rem` tiles have q+1 rows, the rest q rows
    big_span = rem * (q + 1)
    tile = F.when(
        rank0 < big_span, (rank0 / (q + 1)).cast("bigint")
    ).otherwise(rem + ((rank0 - big_span) / F.greatest(q, F.lit(1))).cast("bigint"))
    return (
        with_ids.join(F.broadcast(offsets), "__pid")
        .withColumn("__ntile", (tile + 1).cast("int"))
        .drop("__pid", "__mid", "__mid0", "__off", "__total")
    )


def global_rank(
    df: DataFrame, order_cols: list[str], out_col: str = "__rank"
) -> DataFrame:
    """Append ``row_number() OVER (ORDER BY order_cols)`` — the global
    1-based rank — WITHOUT a single-task global window.

    Same device as :func:`global_ntile` (steps 1–4 of its module
    docstring): range-repartition on the order columns, sort within
    partitions, per-partition counter via ``monotonically_increasing_id``
    after the sort, and a broadcast prefix-sum offset table; global
    rank = partition offset + local position + 1.  ``order_cols`` must
    be a TOTAL order (add a tie-breaker id) or ranks at boundary ties
    are partition-placement-dependent.

    This is the primitive behind sorted-neighborhood blocking,
    equi-depth statistics, and any "exact position in the global
    order" need at 100 TB: one range exchange (what any global sort
    pays), everything else map-side.
    """
    spark = df.sparkSession
    shuffle_n = int(
        spark.conf.get("spark.sql.shuffle.partitions", "200") or "200"
    )
    ranged = df.repartitionByRange(
        shuffle_n, *[F.col(c) for c in order_cols]
    ).sortWithinPartitions(*order_cols)
    with_ids = ranged.select(
        "*",
        F.spark_partition_id().alias("__pid"),
        F.monotonically_increasing_id().alias("__mid"),
    ).localCheckpoint()  # pin boundaries: offsets + final join both consume
    counts = with_ids.groupBy("__pid").agg(
        F.count(F.lit(1)).alias("__n"), F.min("__mid").alias("__mid0")
    )
    w = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__pid",
        "__mid0",
        F.coalesce(F.sum("__n").over(w), F.lit(0)).alias("__off"),
    )
    return (
        with_ids.join(F.broadcast(offsets), "__pid")
        .withColumn(
            out_col,
            (F.col("__off") + F.col("__mid") - F.col("__mid0") + 1).cast(
                "bigint"
            ),
        )
        .drop("__pid", "__mid", "__mid0", "__off")
    )


def global_running_max(
    df: DataFrame, order_cols: list[str], value_col: str,
    out_col: str = "__runmax",
) -> DataFrame:
    """Append ``max(value_col) OVER (ORDER BY order_cols ROWS UNBOUNDED
    PRECEDING)`` — the global prefix maximum — WITHOUT a single-task
    global window.

    Same two-pass device as :func:`global_ntile`: range-repartition on
    the order columns, run the prefix max per partition (parallel),
    then broadcast each partition's overall max and combine — the
    global prefix max at any row is ``greatest(local prefix max,
    max over all earlier partitions)``.  ``order_cols`` must be a
    total order for a deterministic result when ``value_col`` ties
    would otherwise straddle a boundary (the max itself is
    order-insensitive, so this is only about reproducible
    partitioning).

    The scan shape every watermark/lateness audit needs at 100 TB:
    two exchanges (range + broadcast), no per-key state growth.
    """
    spark = df.sparkSession
    shuffle_n = int(
        spark.conf.get("spark.sql.shuffle.partitions", "200") or "200"
    )
    ranged = df.repartitionByRange(
        shuffle_n, *[F.col(c) for c in order_cols]
    ).sortWithinPartitions(*order_cols)
    with_pid = ranged.select(
        "*", F.spark_partition_id().alias("__pid")
    ).localCheckpoint()  # pin boundaries: two consumers below
    local_w = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pmax = with_pid.groupBy("__pid").agg(F.max(value_col).alias("__pmax"))
    prior_w = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = pmax.select(
        "__pid", F.max("__pmax").over(prior_w).alias("__prior")
    )
    return (
        with_pid.join(F.broadcast(offsets), "__pid")
        .withColumn(
            out_col,
            F.greatest(
                F.max(value_col).over(local_w),
                F.coalesce(
                    F.col("__prior"), F.max(value_col).over(local_w)
                ),
            ),
        )
        .drop("__pid", "__prior")
    )


def global_running_sum(
    df: DataFrame, order_cols: list[str], value_col: str,
    out_col: str = "__runsum",
) -> DataFrame:
    """Append ``sum(value_col) OVER (ORDER BY order_cols ROWS UNBOUNDED
    PRECEDING)`` — the global prefix sum — WITHOUT a single-task
    global window.

    Same two-pass device as :func:`global_running_max`: range-partition
    on the order columns, local prefix sum per partition (parallel),
    broadcast each partition's total, and add the prefix-sum of all
    EARLIER partitions' totals.  ``order_cols`` must be a total order
    for a deterministic per-row result (the sum over any prefix that
    doesn't split ties is order-insensitive; the tie-breaker makes
    every prefix well-defined).

    This is the distributed scan behind exact rank statistics —
    Mann-Whitney/AUC, cumulative-distribution audits, Lorenz/Gini
    curves — at 100 TB: one range exchange plus one broadcast of a
    partition-count-sized table.
    """
    spark = df.sparkSession
    shuffle_n = int(
        spark.conf.get("spark.sql.shuffle.partitions", "200") or "200"
    )
    ranged = df.repartitionByRange(
        shuffle_n, *[F.col(c) for c in order_cols]
    ).sortWithinPartitions(*order_cols)
    with_pid = ranged.select(
        "*", F.spark_partition_id().alias("__pid")
    ).localCheckpoint()  # pin boundaries: totals + final join both consume
    local_w = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    totals = with_pid.groupBy("__pid").agg(F.sum(value_col).alias("__tot"))
    prior_w = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.select(
        "__pid",
        F.coalesce(F.sum("__tot").over(prior_w), F.lit(0)).alias("__prior"),
    )
    return (
        with_pid.join(F.broadcast(offsets), "__pid")
        .withColumn(
            out_col, F.sum(value_col).over(local_w) + F.col("__prior")
        )
        .drop("__pid", "__prior")
    )
