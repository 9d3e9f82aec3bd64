"""Micro-probe: current 16×zip_with minhash signature computation vs a
one-pass higher-order ``aggregate`` with an array<bigint> accumulator.

Usage: python tools/minhash_onepass_probe.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from beacon_data_importer_spark.operators.dedup import (
    MINHASH_P,
    _shingles,
    minhash_coeffs,
    minhash_signatures,
)
from beacon_data_importer_spark.session import get_spark


def onepass_signatures(df, text_col, id_col, num_hashes=16, shingle_n=3):
    hexes = df.select(
        F.col(id_col).alias("id"),
        F.transform(_shingles(F.col(text_col), shingle_n), lambda g: F.md5(g)).alias(
            "__h"
        ),
    )
    xy = F.transform(
        F.col("__h"),
        lambda h: F.struct(
            (F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint") % MINHASH_P).alias(
                "x"
            ),
            (F.conv(F.substring(h, 16, 15), 16, 10).cast("bigint") % MINHASH_P).alias(
                "y"
            ),
        ),
    )
    coeffs = F.array(
        *[
            F.struct(
                F.lit(a).cast("bigint").alias("a"),
                F.lit(b).cast("bigint").alias("b"),
                F.lit(s).cast("bigint").alias("s"),
            )
            for s, (a, b) in enumerate(minhash_coeffs(num_hashes))
        ]
    )
    init = F.array_repeat(F.lit(MINHASH_P).cast("bigint"), num_hashes)
    sig = F.aggregate(
        xy,
        init,
        lambda acc, e: F.zip_with(
            acc,
            coeffs,
            lambda m, c: F.least(m, (c["a"] * e["x"] + c["b"] * e["y"] + c["s"]) % MINHASH_P),
        ),
    )
    return hexes.select("id", sig.alias("sig"))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark(app_name="minhash-probe")
    spark.sparkContext.setLogLevel("ERROR")
    d = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .repartition(32)
        .cache()
    )
    d.count()

    # correctness: identical signatures?
    a = minhash_signatures(d, "text", "doc_id", 16).orderBy("id")
    b = onepass_signatures(d, "text", "doc_id", 16).orderBy("id")
    diff = a.join(b.withColumnRenamed("sig", "sig2"), "id").filter(
        F.col("sig") != F.col("sig2")
    )
    print("mismatched rows:", diff.count())

    for label, fn in [("current", minhash_signatures), ("onepass", onepass_signatures)]:
        times = []
        for _ in range(reps):
            t0 = time.time()
            fn(d, "text", "doc_id", 16).write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 3))
        print(label, times, "min", min(times))


if __name__ == "__main__":
    main()
