"""Surrogate-key generation — the RETURNING emulation (SURVEY §4.3.1).

The reference's one genuinely stateful trick is a Postgres
data-modifying CTE: INSERT new ``needs`` rows, capture the generated ids
with RETURNING, and join ``notes`` to those fresh ids in the same
statement (``sql/import_original_triage_needs_and_notes.sql:5-39``).
Spark cannot capture store-generated ids, so the engine assigns them
*before* the append: ``id = max_existing_id + row_number() OVER (ORDER BY
<deterministic key>)``, keeps the id-bearing frame, and reuses it for the
notes join — same visible result, one extra window.

Determinism: never ``monotonically_increasing_id`` (partition-layout
dependent) for oracle-checked output.

Scale note: a global ``row_number() OVER (ORDER BY …)`` is a single-
partition sort at the limit — acceptable for the reference's workload
(id assignment over a per-import staging batch, not the 100 TB fact
table).  For bulk id assignment at scale use per-partition offsets (sum
of counts of preceding partitions, decoded JVM-side from
``monotonically_increasing_id``), which this module exposes as
``assign_surrogate_ids_scalable``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def assign_surrogate_ids(
    df: DataFrame,
    order_by: list[str | Column],
    id_col: str = "id",
    start_after: int = 0,
) -> DataFrame:
    """Deterministic dense ids: ``start_after + row_number()`` under a
    total order.  Exact RETURNING-parity path for bounded staging batches.
    """
    w = Window.orderBy(*order_by)
    return df.withColumn(id_col, F.row_number().over(w) + F.lit(start_after))


def assign_surrogate_ids_scalable(
    df: DataFrame, id_col: str = "id", start_after: int = 0
) -> DataFrame:
    """Cluster-scale id assignment: per-partition offsets (no global
    sort, no single-partition window, no ``.rdd`` round-trip — rows stay
    in Tungsten/codegen end to end).

    ``monotonically_increasing_id()`` encodes ``(partition index << 33)
    | within-partition counter``; decoding both halves gives each row
    its partition and a dense local index for free.  One tiny count job
    (P rows, P = partition count — the same extra pass
    ``rdd.zipWithIndex`` hid internally) turns partition counts into
    cumulative offsets, broadcast back as a P-row join.

    Ids are unique and dense but their order is partition-layout
    dependent — use only where id *values* need not be reproducible
    across runs (the dense-reproducible path is
    ``assign_surrogate_ids``).  Both jobs must observe the same
    partition layout: the input is pinned with ``localCheckpoint`` so
    AQE cannot re-plan the source between the count pass and the id
    pass (the zipWithIndex form relied on the same two-pass stability)."""
    pinned = df.localCheckpoint()
    low_mask = (1 << 33) - 1
    tagged = pinned.withColumn("__mid", F.monotonically_increasing_id())
    pid = F.shiftright(F.col("__mid"), 33).cast("bigint")
    local = F.col("__mid").bitwiseAND(F.lit(low_mask))

    counts = (
        tagged.groupBy(pid.alias("__pid")).count().orderBy("__pid").collect()
    )
    offsets, acc = [], 0
    for r in counts:
        offsets.append((int(r["__pid"]), acc))
        acc += int(r["count"])
    omap = df.sparkSession.createDataFrame(
        offsets or [(0, 0)], "__pid bigint, __off bigint"
    )
    return (
        tagged.withColumn("__pid", pid)
        .join(F.broadcast(omap), "__pid")
        .withColumn(
            id_col,
            (F.col("__off") + local + 1 + F.lit(start_after)).cast("long"),
        )
        .drop("__pid", "__off", "__mid")
    )
