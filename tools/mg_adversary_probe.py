"""Adversary probe for the Misra-Gries heavy-hitter state
(streaming/topk.py): how fast does the error scalar grow when the item
domain vastly exceeds K and keys ROTATE so nothing is a true heavy
hitter — the worst case for any counter-based summary — versus a
Zipf-like stream where real heavy hitters exist?

Legs (SLICES micro-batches of ROWS_PER_SLICE rows each, K = 32):
  1. zipf       — ~half the rows hit 8 hot keys, the rest spread over
                  a 100k-key tail: the intended workload.  err should
                  stay well under the hot keys' true counts (they
                  remain identifiable).
  2. rotating   — every slice spreads its rows EVENLY over K+1
                  DISJOINT fresh keys: the canonical MG worst case
                  (the (K+1)-th largest equals the slice mass over
                  K+1, so every merge decrements maximally and no key
                  ever survives to the next slice).  err must reach
                  the theoretical n/(K+1) ceiling and the survivors
                  carry ~no information — the HONEST negative result
                  that tells an operator when NOT to trust the
                  summary.

Reported per leg: final err, n/(K+1) ceiling, err/ceiling, and for
zipf the hot keys' (cnt_lo, true) so the bound's usefulness is
visible.  Prints one JSON line; findings go to PERF.md.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F

from beacon_data_importer_spark.session import get_spark
from beacon_data_importer_spark.streaming.topk import (
    K,
    batch_counts,
    mg_compress,
)

SLICES = 8
ROWS_PER_SLICE = 100_000


def slice_df(spark, leg: str, i: int):
    base = spark.range(ROWS_PER_SLICE).select(
        (F.col("id") + i * ROWS_PER_SLICE).alias("row_id")
    )
    if leg == "zipf":
        expr = (
            "CASE WHEN pmod(hash(row_id), 100) < 50"
            " THEN pmod(hash(row_id * 31), 8)"
            " ELSE 1000 + pmod(hash(row_id * 17), 100000) END"
        )
    else:  # rotating: K+1 disjoint equal-mass keys per slice
        expr = f"{i} * 1000 + pmod(row_id, {K + 1})"
    return base.select(F.expr(expr).cast("bigint").alias("user_id"))


def fold(spark, leg: str):
    rows: list = []
    err = 0
    for i in range(SLICES):
        counts = batch_counts(
            slice_df(spark, leg, i).withColumnRenamed("user_id", "user_id")
        )
        if rows:
            prev = spark.createDataFrame(
                [(r.user_id, r.cnt) for r in rows],
                "user_id bigint, cnt bigint",
            )
            counts = (
                prev.unionByName(counts)
                .groupBy("user_id")
                .agg(F.sum("cnt").cast("bigint").alias("cnt"))
            )
        rows, err = mg_compress(counts, err)
    return rows, err


def main() -> None:
    spark = get_spark(app_name="mg_adversary_probe", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    n = SLICES * ROWS_PER_SLICE
    ceiling = n // (K + 1)
    out = {"n": n, "k": K, "err_ceiling_n_over_k1": ceiling}
    for leg in ("zipf", "rotating"):
        rows, err = fold(spark, leg)
        leg_out = {
            "err": err,
            "err_over_ceiling_ppm": int(err * 1_000_000 / ceiling),
            "survivors": len(rows),
        }
        if leg == "zipf":
            # exact hot-key truth: rebuild the full stream once
            full = None
            for i in range(SLICES):
                s = slice_df(spark, leg, i)
                full = s if full is None else full.unionByName(s)
            truth = {
                r.user_id: r.cnt
                for r in batch_counts(full)
                .filter(F.col("user_id") < 8)
                .collect()
            }
            leg_out["hot_keys"] = sorted(
                (
                    int(r.user_id),
                    int(r.cnt),
                    int(truth.get(r.user_id, -1)),
                )
                for r in rows
                if r.user_id < 8
            )
        out[leg] = leg_out
    print(json.dumps(out))


if __name__ == "__main__":
    main()
