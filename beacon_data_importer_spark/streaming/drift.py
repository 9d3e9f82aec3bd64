"""Streaming Page-Hinkley drift state: one monitored point per
micro-batch (the batch's exact event COUNT), folded into a
constant-size PH walk snapshot — the drift twin of the Misra-Gries
frequency state (streaming/topk.py) and the HLL/theta distinct states
(streaming/sketches.py).

Why per-BATCH points: Page-Hinkley is a sequential recursion — a
per-ROW fold inside a distributed batch would impose an order the
engine doesn't have and a driver collect the size of the batch.  The
standard production shape monitors the per-window statistic instead:
each micro-batch contributes ONE exact integer (its event count), the
state is six scalars, and the update is O(1) — this survives any
stream volume because the state never grows with the data.

The monitored recursion (δ = 0, the self-normalizing form also used
by the batch replay ``page_hinkley_drift``):

    n += 1;  S += x
    mean_e6 = (S·1e6) div n          -- the only division, floored
    m_e6   += x·1e6 − mean_e6
    mn_e6   = min(mn_e6, m_e6)
    PH_e6   = m_e6 − mn_e6           -- alarm when PH > λ
    λ_e6    = 5% of the FIRST batch's count (fixed at batch 0)

EXACTNESS CONTRACT (the MG doctrine, stated honestly): the walk is
order-dependent in the micro-batch sequence, so the parity test
asserts the streamed state equals a scalar fold over the SAME slice
sequence bit-for-bit — integers everywhere, so "bit-for-bit" is
literal.  Stream == one-pass batch is not a theorem and not asserted.

Versioned-snapshot contract identical to topk.py/sketches.py: v{N}
read, v{N+1} written, _SUCCESS-gated, idempotent on checkpoint
replay.  Snapshot schema: one row
(n_batches, sum_x, m_e6, m_min_e6, ph_e6, lambda_e6, n_alarms,
last_x) — all BIGINT.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .cdc import _versions

_SCHEMA = (
    "n_batches bigint, sum_x bigint, m_e6 bigint, m_min_e6 bigint,"
    " ph_e6 bigint, lambda_e6 bigint, n_alarms bigint, last_x bigint"
)


def ph_step(state: tuple | None, x: int) -> tuple:
    """ONE Page-Hinkley update with batch statistic ``x`` (exact
    integer).  ``state`` is the 8-tuple matching _SCHEMA (None for the
    first batch).  Pure-Python integer arithmetic — this IS the
    reference fold the streaming sink must match bit-for-bit."""
    if state is None:
        lam = (x * 1_000_000) // 20  # 5% of the first batch's volume
        n, s, m, mn = 1, x, 0, 0
        # first point: mean == x exactly, so the deviation is 0
        return (1, x, 0, 0, 0, lam, 0, x)
    n, s, m, mn, _ph, lam, alarms, _last = state
    n += 1
    s += x
    mean_e6 = (s * 1_000_000) // n
    m += x * 1_000_000 - mean_e6
    mn = min(mn, m)
    ph = m - mn
    alarms += 1 if ph > lam else 0
    return (n, s, m, mn, ph, lam, alarms, x)


def merge_batch_ph(
    spark: SparkSession, batch_df: DataFrame, batch_id: int, target_dir: str
) -> None:
    """Fold ONE micro-batch into the versioned PH snapshot: the batch
    reduces to a single exact count (one distributed aggregate), the
    prior one-row snapshot loads, ph_step runs driver-side on scalars,
    v{batch_id+1} commits."""
    x = batch_df.count()
    prev_name = f"v{batch_id:08d}"
    state = None
    if batch_id > 0:
        if prev_name not in _versions(target_dir):
            raise RuntimeError(
                f"ph merge: batch {batch_id} expects committed "
                f"snapshot {prev_name} under {target_dir}"
            )
        r = spark.read.parquet(
            os.path.join(target_dir, prev_name)
        ).collect()[0]
        state = (
            r.n_batches, r.sum_x, r.m_e6, r.m_min_e6,
            r.ph_e6, r.lambda_e6, r.n_alarms, r.last_x,
        )
    out = ph_step(state, x)
    spark.createDataFrame([out], _SCHEMA).write.mode("overwrite").parquet(
        os.path.join(target_dir, f"v{batch_id + 1:08d}")
    )


def streaming_drift_monitor(events: DataFrame, target_dir: str) -> None:
    """Run the stream to completion (Trigger.AvailableNow), maintaining
    the per-batch-volume Page-Hinkley state."""
    spark = events.sparkSession

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        merge_batch_ph(spark, batch_df, batch_id, target_dir)

    q = (
        events.writeStream.foreachBatch(sink)
        .option("checkpointLocation", target_dir + "_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def current_drift_state(spark: SparkSession, target_dir: str) -> DataFrame:
    """The highest committed PH snapshot (one row)."""
    vs = _versions(target_dir)
    if not vs:
        raise FileNotFoundError(f"no committed snapshot under {target_dir}")
    return spark.read.parquet(os.path.join(target_dir, vs[-1]))
