"""Mega-bucket adversary probe for propensity_caliper_match (round 7;
the bt_width_probe class applied to the third pair-producing query).

The caliper match explodes each treated order to 3 adjacent price
buckets and equi-joins controls ON bucket — candidate volume per
treated unit is the number of CONTROLS within ±1 bucket.  On smooth
price distributions that is small, but the bound is a DATA property:
a price-point adversary (every control at $99.99, every treated
nearby) concentrates the whole control mass into one bucket and the
join degenerates to |treated| × |controls| — the same quadratic class
the mega-order probe measured for the duel expansion.

Legs (fixed ~N_ROWS rows, half treated):
  1. smooth    — scores uniform over a wide range (the real data's
                 shape); candidates ≈ N·density.
  2. megabucket— ALL controls at one score, all treated within the
                 caliper; candidates = T·C exactly.
  3. megabucket + per-bucket cap — the mitigation: rank controls
                 within each bucket by (score, key) and keep the
                 first CAP per bucket BEFORE the join.  Matching
                 quality is unchanged on smooth data (the nearest
                 control survives any cap ≥ 1 within ±1 bucket of a
                 treated unit only if ranking is score-local — the
                 cap keeps the CAP lowest-score controls per bucket,
                 so a treated unit near a bucket's top edge can lose
                 its nearest; exactness under the cap holds only when
                 per-bucket control counts ≤ CAP, which the probe
                 also reports).

Prints one JSON line; findings + the cap doctrine go to PERF.md.
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

N_ROWS = 40_000
CALIPER = 10_000
CAP = 64


def run_leg(spark, sc_df, cap: int | None) -> tuple[float, int]:
    bucket = (F.col("s") / CALIPER).cast("bigint")
    t = sc_df.filter("treated").select(
        F.col("k").alias("tk"), F.col("s").alias("ts"),
        F.explode(F.array(bucket - 1, bucket, bucket + 1)).alias("b"),
    )
    c = sc_df.filter(~F.col("treated")).select(
        F.col("k").alias("ck"), F.col("s").alias("cs"), bucket.alias("b")
    )
    if cap is not None:
        w = Window.partitionBy("b").orderBy("cs", "ck")
        c = (
            c.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= cap)
            .drop("__rn")
        )
    t0 = time.time()
    cand = (
        t.join(c, "b")
        .withColumn("d", F.abs(F.col("ts") - F.col("cs")))
        .filter(F.col("d") <= CALIPER)
    )
    n = cand.count()
    w = Window.partitionBy("tk").orderBy("d", "ck")
    matched = (
        cand.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
    )
    matched.write.format("noop").mode("overwrite").save()
    return time.time() - t0, n


def main() -> None:
    spark = get_spark(app_name="caliper-skew-probe")
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.range(N_ROWS).select(
        F.col("id").alias("k"), (F.col("id") % 2 == 0).alias("treated")
    )
    smooth = base.withColumn(
        "s", (F.col("k") * 37) % 60_000_000
    ).localCheckpoint()
    mega = base.withColumn(
        "s",
        F.when(F.col("treated"), 50_000_000 + F.col("k") % CALIPER)
        .otherwise(F.lit(50_000_000)),
    ).localCheckpoint()

    out = {"rows": N_ROWS, "caliper": CALIPER, "cap": CAP, "legs": {}}
    for name, df, cap in (
        ("smooth", smooth, None),
        ("megabucket", mega, None),
        ("megabucket_capped", mega, CAP),
        ("smooth_capped", smooth, CAP),
    ):
        sec, n_cand = run_leg(spark, df, cap)
        out["legs"][name] = {"candidates": n_cand, "sec": round(sec, 2)}
        print(f"{name}: candidates={n_cand} wall={sec:.2f}s",
              file=sys.stderr)
    # exactness check for the cap on smooth data: per-bucket control
    # counts vs CAP (cap is lossless where counts <= CAP)
    bucket = (F.col("s") / CALIPER).cast("bigint")
    over = (
        smooth.filter(~F.col("treated"))
        .groupBy(bucket.alias("b"))
        .count()
        .filter(F.col("count") > CAP)
        .count()
    )
    out["smooth_buckets_over_cap"] = over
    print(json.dumps(out))


if __name__ == "__main__":
    main()
