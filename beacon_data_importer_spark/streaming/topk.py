"""Streaming Misra-Gries heavy-hitter state: per-micro-batch exact
counts merged into a k-bounded counter snapshot — the frequency twin
of the HLL/theta DISTINCT states in streaming/sketches.py.

Why this shape: a 100 TB stream cannot keep exact per-item counts (the
item domain grows with the data); the Misra-Gries summary stores at
most K counters plus one error scalar, and merging is
(sum counters) → (subtract the (K+1)-th largest) → (drop ≤ 0), which
keeps the invariant  stored ≤ true ≤ stored + err  for every item
(Agarwal et al., "Mergeable Summaries", PODS'12).

EXACTNESS CONTRACT (weaker than HLL/theta, stated honestly): MG
merging is NOT order-independent — the streamed summary depends on the
micro-batch sequence, so the parity test asserts (a) the streamed
state equals a batch-side fold over the SAME slice sequence
bit-for-bit, and (b) the MG bound holds against exact counts.  It does
NOT assert stream == one-pass batch (no such theorem exists).

Versioned-snapshot contract identical to sketches.py: v{N} read,
v{N+1} written, _SUCCESS-gated, idempotent on checkpoint replay.
Snapshot schema: (user_id BIGINT, cnt BIGINT, err BIGINT) with err
constant across rows (the summary's error scalar, replicated for a
flat parquet schema).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .cdc import _versions

K = 32


def batch_counts(batch_df: DataFrame) -> DataFrame:
    """Exact per-user event counts for one slice: (user_id, cnt)."""
    return batch_df.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )


def mg_compress(
    counters: DataFrame, prev_err: int
) -> tuple[list, int]:
    """Compress a counter frame to ≤ K survivors.

    Returns (survivor Rows, new err).  The (K+1)-th largest count by
    (cnt DESC, user_id) is the decrement; survivors keep cnt − offset
    where that stays positive.  Top-(K+1) is TakeOrderedAndProject —
    scale-safe however wide the input counter frame is — and the
    survivors are a BOUNDED (≤ K+1 row) collect."""
    top = counters.orderBy(F.desc("cnt"), "user_id").limit(K + 1).collect()
    if len(top) <= K:
        return top, prev_err
    offset = top[-1].cnt
    survivors = [r for r in top[:K] if r.cnt - offset > 0]
    return (
        [type(r)(user_id=r.user_id, cnt=r.cnt - offset) for r in survivors],
        prev_err + offset,
    )


def merge_batch_mg(
    spark: SparkSession, batch_df: DataFrame, batch_id: int, target_dir: str
) -> None:
    """Merge ONE micro-batch into the versioned MG snapshot: sum the
    ≤ K previous counters (a broadcast-small frame) with the slice's
    exact counts, re-compress, write v{batch_id+1}."""
    counts = batch_counts(batch_df)
    prev_name = f"v{batch_id:08d}"
    prev_err = 0
    if batch_id > 0:
        if prev_name not in _versions(target_dir):
            raise RuntimeError(
                f"mg merge: batch {batch_id} expects committed "
                f"snapshot {prev_name} under {target_dir}"
            )
        prev = spark.read.parquet(os.path.join(target_dir, prev_name))
        prev_err = prev.select(F.max("err")).collect()[0][0] or 0
        merged = (
            prev.select("user_id", "cnt")
            .unionByName(counts)
            .groupBy("user_id")
            .agg(F.sum("cnt").cast("bigint").alias("cnt"))
        )
    else:
        merged = counts
    rows, err = mg_compress(merged, prev_err)
    out = spark.createDataFrame(
        [(r.user_id, r.cnt, err) for r in rows],
        "user_id bigint, cnt bigint, err bigint",
    )
    out.write.mode("overwrite").parquet(
        os.path.join(target_dir, f"v{batch_id + 1:08d}")
    )


def streaming_heavy_hitters(events: DataFrame, target_dir: str) -> None:
    """Run the event stream to completion (Trigger.AvailableNow),
    maintaining the K-bounded per-user heavy-hitter summary."""
    spark = events.sparkSession

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        merge_batch_mg(spark, batch_df, batch_id, target_dir)

    q = (
        events.writeStream.foreachBatch(sink)
        .option("checkpointLocation", target_dir + "_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def current_heavy_hitters(spark: SparkSession, target_dir: str) -> DataFrame:
    """(user_id, cnt_lo, cnt_hi) from the highest committed snapshot:
    the MG bound is cnt_lo ≤ true ≤ cnt_hi."""
    vs = _versions(target_dir)
    if not vs:
        raise FileNotFoundError(f"no committed snapshot under {target_dir}")
    snap = spark.read.parquet(os.path.join(target_dir, vs[-1]))
    return snap.select(
        "user_id",
        F.col("cnt").alias("cnt_lo"),
        (F.col("cnt") + F.col("err")).alias("cnt_hi"),
    )
