"""Micro-probe: IVF cell assignment via crossJoin fan-out + window argmin
(shuffles corpus × cells rows) vs a packed-centroid per-row fold (map-only,
no shuffle).

The corpus is inflated ×REP so the probe measures data-proportional work,
not fixed overhead.

Usage: python tools/ivf_assign_probe.py [sf_dir] [reps] [inflate]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from beacon_data_importer_spark.operators.similarity import assign_cells, norm
from beacon_data_importer_spark.session import get_spark


def packed_assign(corpus, centroids, id_col="vec_id", vec_col="embedding",
                  centroid_id="cell_id", centroid_vec="centroid"):
    packed = F.broadcast(
        centroids.agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col(centroid_id).alias("cid"),
                        F.col(centroid_vec).alias("cvec"),
                    )
                )
            ).alias("__cells")
        )
    )
    with_cells = corpus.crossJoin(packed).withColumn("__vn", norm(vec_col))

    def sim(c):
        prods = F.zip_with(
            F.col(vec_col), c["cvec"], lambda x, y: x.cast("double") * y.cast("double")
        )
        d = F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)
        cn = F.sqrt(
            F.aggregate(
                F.zip_with(c["cvec"], c["cvec"],
                           lambda x, y: x.cast("double") * y.cast("double")),
                F.lit(0.0), lambda acc, x: acc + x,
            )
        )
        return d / (F.col("__vn") * cn)

    scored = F.transform(
        F.col("__cells"),
        lambda c: F.struct(sim(c).alias("sim"), c["cid"].alias("cid")),
    )
    init = F.struct(
        F.lit(-2.0).alias("sim"),
        F.element_at(F.col("__cells"), 1)["cid"].alias("cid"),
    )
    best = F.aggregate(
        scored,
        init,
        lambda acc, s: F.when(s["sim"] > acc["sim"], s).otherwise(acc),
    )
    return (
        with_cells.withColumn("__best", best)
        .withColumn("cell_id", F.col("__best")["cid"])
        .withColumn("cell_sim_e6", F.floor(F.col("__best")["sim"] * 1e6))
        .drop("__cells", "__vn", "__best")
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    inflate = int(sys.argv[3]) if len(sys.argv) > 3 else 50
    spark = get_spark(app_name="ivf-assign-probe")
    spark.sparkContext.setLogLevel("ERROR")
    e = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    big = (
        e.crossJoin(F.broadcast(spark.range(inflate).select(F.col("id").alias("__rep"))))
        .withColumn("vec_id", F.col("vec_id") * inflate + F.col("__rep"))
        .drop("__rep")
        .repartition(32)
        .cache()
    )
    print("corpus rows:", big.count())
    centroids = e.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("cell_id"), F.col("embedding").alias("centroid")
    )

    a = assign_cells(big, centroids).select("vec_id", "cell_id", "cell_sim_e6")
    b = packed_assign(big, centroids).select(
        "vec_id",
        F.col("cell_id").alias("cell_id2"),
        F.col("cell_sim_e6").alias("sim2"),
    )
    diff = a.join(b, "vec_id").filter(
        (F.col("cell_id") != F.col("cell_id2")) | (F.col("cell_sim_e6") != F.col("sim2"))
    )
    print("mismatched rows:", diff.count())

    for label, fn in [("window", assign_cells), ("packed_fold", packed_assign)]:
        times = []
        for _ in range(reps):
            t0 = time.time()
            fn(big, centroids).write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 3))
        print(label, times, "min", min(times))


if __name__ == "__main__":
    main()
