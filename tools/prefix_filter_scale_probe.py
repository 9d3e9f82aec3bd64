"""Scale probe for prefix_filter_jaccard_join's pruning claim:

    "only prefix-token postings join — rare tokens have short
     postings, which is exactly why the frequency order is the
     right one."

The probe amplifies the documents corpus ×1/×2/×4 (doc_ids shifted;
each copy appends a per-copy marker token so replicas are near- but
not exact-duplicates) and at each scale runs BOTH candidate
generators over the same word-3-gram sets:

  * exhaustive arm: every pair sharing ANY shingle (the oracle's
    formulation — complete by definition, quadratic in posting
    lengths);
  * prefix arm: pairs sharing a token within each side's
    |A| − ⌈τ·|A|⌉ + 1 rarest-first prefix.

It verifies COMPLETENESS at every scale (the two arms' verified
result sets must be identical) and reports the candidate-stream
sizes and walls.  Evidence = candidates(prefix) ≪ candidates(all)
with the gap stable-or-growing under amplification, and zero missed
pairs everywhere.

Usage: python tools/prefix_filter_scale_probe.py [sf_dir] [max_amp]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from beacon_data_importer_spark.operators.dedup import _shingles
from beacon_data_importer_spark.session import get_spark
from beacon_data_importer_spark.sources.parquet import read_table

TAU_NUM, TAU_DEN = 6, 10


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    max_amp = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark()
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    n0 = docs.count()

    rows = []
    amp = 1
    while amp <= max_amp:
        # deterministic amplification: shifted ids, per-copy marker token
        copies = [
            docs.select(
                (F.col("doc_id") + F.lit(k * n0)).alias("id"),
                F.concat(F.col("text"), F.lit(f" copymark{k}")).alias(
                    "text"
                ),
            )
            for k in range(amp)
        ]
        d = copies[0]
        for c in copies[1:]:
            d = d.unionAll(c)
        shd = d.select(
            "id", F.array_distinct(_shingles(F.col("text"))).alias("s")
        ).repartition(32).localCheckpoint()
        post = shd.select(
            "id", F.explode("s").alias("g"), F.size("s").alias("n")
        )

        # exhaustive candidate stream: every shared-shingle pair
        t0 = time.time()
        exh = (
            post.select(F.col("id").alias("id_a"), "g")
            .join(
                post.select(
                    F.col("id").alias("id_b"), F.col("g").alias("g2")
                ),
                (F.col("g") == F.col("g2"))
                & (F.col("id_a") < F.col("id_b")),
            )
            .select("id_a", "id_b")
            .distinct()
            .localCheckpoint()
            .repartition(32)
        )
        n_exh = exh.count()
        t_exh = time.time() - t0

        # prefix candidate stream
        t0 = time.time()
        freq = post.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
        wp = Window.partitionBy("id").orderBy("df", "g")
        prefix = (
            post.repartition(32, "g")
            .join(freq, "g")
            .repartition(32, "id")
            .withColumn("rk", F.row_number().over(wp))
            .filter(
                F.col("rk")
                <= F.col("n")
                - F.expr(f"({TAU_NUM} * n + {TAU_DEN} - 1) div {TAU_DEN}")
                + 1
            )
            .select("id", "g")
            .localCheckpoint()
        )
        pre = (
            prefix.select(F.col("id").alias("id_a"), "g")
            .join(
                prefix.select(
                    F.col("id").alias("id_b"), F.col("g").alias("g2")
                ),
                (F.col("g") == F.col("g2"))
                & (F.col("id_a") < F.col("id_b")),
            )
            .select("id_a", "id_b")
            .distinct()
            .localCheckpoint()
            .repartition(32)
        )
        n_pre = pre.count()
        t_pre = time.time() - t0

        # verify both arms and compare result SETS (completeness proof)
        sa = shd.select(F.col("id").alias("id_a"), F.col("s").alias("s_a"))
        sb = shd.select(F.col("id").alias("id_b"), F.col("s").alias("s_b"))
        i = F.size(F.array_intersect("s_a", "s_b"))
        u = F.size("s_a") + F.size("s_b") - i

        def survivors(cands):
            return (
                cands.join(sa, "id_a")
                .join(sb, "id_b")
                .filter(i * TAU_DEN >= TAU_NUM * u)
                .select("id_a", "id_b")
            )

        missed = survivors(exh).subtract(survivors(pre)).count()
        n_out = survivors(pre).count()
        rows.append(
            {
                "amp": amp,
                "n_docs": n0 * amp,
                "cands_exhaustive": n_exh,
                "cands_prefix": n_pre,
                "prune_ratio": round(n_exh / max(n_pre, 1), 2),
                "wall_exhaustive_s": round(t_exh, 2),
                "wall_prefix_s": round(t_pre, 2),
                "result_pairs": n_out,
                "missed_pairs": missed,
            }
        )
        amp *= 2
    print(json.dumps({"tau": TAU_NUM / TAU_DEN, "sf_dir": sf_dir,
                      "probe": rows}))


if __name__ == "__main__":
    main()
