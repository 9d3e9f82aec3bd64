"""Micro-probe: simhash via explode+groupBy (60 sum aggs, one shuffle)
vs a narrow one-pass per-row fold (aggregate with a 60-elem accumulator,
no shuffle at all).

Usage: python tools/simhash_onepass_probe.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from beacon_data_importer_spark.operators.dedup import simhash_agg
from beacon_data_importer_spark.session import get_spark

BITS = 60


def onepass_simhash(df, text_col, id_col, bits=BITS):
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    hashes = F.transform(
        toks, lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("bigint")
    )
    pows = F.array(*[F.lit(1 << i).cast("bigint") for i in range(bits)])
    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), bits),
        lambda acc, h: F.zip_with(
            acc,
            pows,
            lambda a, m: a + F.when(h.bitwiseAND(m) != 0, 1).otherwise(-1),
        ),
    )
    sim = F.aggregate(
        F.zip_with(votes, pows, lambda v, m: F.when(v > 0, m).otherwise(F.lit(0).cast("bigint"))),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    return df.select(F.col(id_col).alias("id"), sim.alias("simhash"))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark(app_name="simhash-probe")
    spark.sparkContext.setLogLevel("ERROR")
    d = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .repartition(32)
        .cache()
    )
    d.count()

    a = simhash_agg(d, "text", "doc_id").orderBy("id")
    b = onepass_simhash(d, "text", "doc_id").orderBy("id")
    diff = a.join(b.withColumnRenamed("simhash", "s2"), "id").filter(
        F.col("simhash") != F.col("s2")
    )
    print("mismatched rows:", diff.count())

    for label, fn in [("explode_groupby", simhash_agg), ("onepass", onepass_simhash)]:
        times = []
        for _ in range(reps):
            t0 = time.time()
            fn(d, "text", "doc_id").write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 3))
        print(label, times, "min", min(times))


if __name__ == "__main__":
    main()
