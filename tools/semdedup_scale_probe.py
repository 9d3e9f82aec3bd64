"""Scale probe for semantic_dedup's k-scaling claim (VERDICT r4):

    "k scales with the corpus so cluster population (n/k) stays
     constant — the within-cluster expansion is then linear in n."

The probe amplifies the embeddings corpus ×1/×2/×4 (ids shifted,
vectors deterministically jittered so copies are near- but not
exact-duplicates) and runs the SemDeDup pair stage two ways at each
scale:

  * scaled-k arm: k = K0 × amplification — the claim's regime.  The
    within-cluster pair count should grow ~linearly in n and
    pairs-per-row should stay ~flat.
  * fixed-k arm: k = K0 regardless of n — the counterfactual.  Pair
    count grows ~quadratically (pairs-per-row ~linear in n).

Prints one JSON line with, per (scale, arm): n, k, max/mean cluster
population, within-cluster pair count, pair-stage wall seconds, and
the derived pairs-per-row ratio.  Evidence = scaled-k pairs/row flat
within noise while fixed-k pairs/row grows ~×amplification.

Usage: python tools/semdedup_scale_probe.py [sf_dir] [K0] [max_amp]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from beacon_data_importer_spark.operators import similarity as SIM
from beacon_data_importer_spark.operators.kmeans import assign_clusters, kmeans_fit
from beacon_data_importer_spark.session import get_spark
from beacon_data_importer_spark.sources.parquet import read_table

TAU = 0.35


def amplify(e, times: int):
    """Union `times` copies with shifted ids and a deterministic
    per-copy jitter (+i/1000 on every component pre-normalization) so
    copies land NEAR the originals in embedding space — cluster
    geometry stays realistic — without being bit-identical."""
    out = None
    for i in range(times):
        c = e.select(
            (F.col("vec_id") + F.lit(i * 10_000_000)).alias("vec_id"),
            F.transform(
                "embedding", lambda x: x.cast("double") + F.lit(i / 1000.0)
            ).alias("embedding"),
        )
        out = c if out is None else out.unionByName(c)
    return out


def pair_stage(corpus, k: int):
    """Fit k-means at the given k, assign, then run the SemDeDup
    within-cluster pair expansion; returns measured stats."""
    t0 = time.time()
    centroids, _ = kmeans_fit(corpus, "vec_id", "embedding", k=k, max_iter=5)
    fit_s = time.time() - t0

    assigned = assign_clusters(corpus, centroids, "vec_id", "embedding")
    asg = assigned.select(
        F.col("id").alias("vec_id"),
        "cluster",
        F.transform(
            "vec", lambda x: x.cast("double") / SIM.norm(F.col("vec"))
        ).alias("uv"),
    ).persist()
    try:
        pops = (
            asg.groupBy("cluster").count().agg(
                F.max("count").alias("mx"),
                F.avg("count").alias("mean"),
                F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("pairs"),
            )
        ).collect()[0]

        l = asg.select("cluster", F.col("vec_id").alias("a"), F.col("uv").alias("ua"))
        r = asg.select("cluster", F.col("vec_id").alias("b"), F.col("uv").alias("ub"))
        t1 = time.time()
        n_dup = (
            l.join(r, "cluster")
            .filter(F.col("a") < F.col("b"))
            .filter(SIM.dot("ua", "ub") >= TAU)
            .select("b")
            .distinct()
            .count()
        )
        pair_s = time.time() - t1
        n = asg.count()
        return {
            "n": n,
            "k": k,
            "fit_sec": round(fit_s, 2),
            "max_cluster_pop": int(pops["mx"]),
            "mean_cluster_pop": round(float(pops["mean"]), 1),
            "within_cluster_pairs": int(pops["pairs"]),
            "pairs_per_row": round(float(pops["pairs"]) / n, 1),
            "pair_stage_sec": round(pair_s, 2),
            "dups_found": n_dup,
        }
    finally:
        asg.unpersist()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k0 = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    max_amp = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    spark = get_spark(app_name="semdedup-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    e = read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    out: dict[str, dict] = {}
    amp = 1
    while amp <= max_amp:
        corpus = amplify(e, amp).persist()
        corpus.count()
        try:
            out[f"x{amp}_scaled_k"] = pair_stage(corpus, k0 * amp)
            if amp > 1:
                out[f"x{amp}_fixed_k"] = pair_stage(corpus, k0)
        finally:
            corpus.unpersist()
        amp *= 2

    base = out["x1_scaled_k"]["pairs_per_row"]
    verdictable = {
        "scaled_k_pairs_per_row_growth": round(
            out[f"x{max_amp}_scaled_k"]["pairs_per_row"] / base, 2
        ),
        "fixed_k_pairs_per_row_growth": round(
            out[f"x{max_amp}_fixed_k"]["pairs_per_row"] / base, 2
        ),
        "amplification": max_amp,
    }
    print(json.dumps({"metric": "semdedup_scale_probe", "sf_dir": sf_dir,
                      "arms": out, "summary": verdictable}))


if __name__ == "__main__":
    main()
