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
table).  For bulk id assignment at scale use
``zipWithIndex``-style per-partition offsets (sum of counts of preceding
partitions), which this module exposes as ``assign_surrogate_ids_scalable``.
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
    """Cluster-scale id assignment: per-partition offsets (no global sort,
    no single-partition window).  Ids are unique and dense but their
    order is partition-layout dependent — use only where id *values*
    need not be reproducible across runs."""
    rdd = df.rdd.zipWithIndex()
    schema = df.schema
    out = rdd.map(lambda pair: (*pair[0], pair[1] + 1 + start_after))
    return df.sparkSession.createDataFrame(
        out, schema.add(id_col, "long", nullable=False)
    )
