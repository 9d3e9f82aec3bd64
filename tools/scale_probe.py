"""Scale probe: amplify sf0.1 via self-union (8× lineitem ≈ 4.8M rows)
and measure the shuffle-heavy shapes — evidence that throughput holds as
data grows, beyond what the fixed testdata SFs show.

Prints one JSON line: rows/sec per shape at 1× and 8×.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from beacon_data_importer_spark.session import get_spark
from beacon_data_importer_spark.sources.parquet import read_table


def amplify(df, times: int, key_cols: list[str]):
    """Union `times` shifted copies (keys offset so cardinality scales
    too, not just row count)."""
    out = None
    for i in range(times):
        c = df
        for k in key_cols:
            c = c.withColumn(k, F.col(k) + F.lit(i * 100_000_000))
        out = c if out is None else out.unionByName(c)
    return out


def timed(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    from beacon_data_importer_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    results: dict[str, dict] = {}
    for factor in (1, 8):
        l = amplify(read_table(spark, sf_dir, "lineitem"), factor, ["l_orderkey"])
        o = amplify(read_table(spark, sf_dir, "orders"), factor, ["o_orderkey"])
        n_rows = l.count()
        # documents amplified with doc_id offsets: each copy keeps the
        # same texts, so LSH buckets GROW with the factor — the worst
        # (most adversarial) scaling direction for the pairing stage;
        # max_bucket then caps the blowup, which is exactly the guard
        # under test.
        d = amplify(
            read_table(spark, sf_dir, "documents").select("doc_id", "text"),
            factor,
            ["doc_id"],
        ).repartition(spark.sparkContext.defaultParallelism, "doc_id")
        n_docs = d.count()

        shapes = {
            "scan_agg": l.groupBy("l_returnflag", "l_linestatus").agg(
                F.sum(F.round(F.col("l_quantity") * 100, 0).cast("bigint")),
                F.count(F.lit(1)),
            ),
            "high_card_agg": l.groupBy("l_orderkey").agg(
                F.count(F.lit(1)), F.sum("l_quantity")
            ),
            "sort_merge_join": l.hint("merge").join(
                o, l.l_orderkey == o.o_orderkey
            ).select("l_orderkey", "o_totalprice"),
            "window_rank": l.withColumn(
                "rk",
                F.row_number().over(
                    __import__("pyspark.sql.window", fromlist=["Window"])
                    .Window.partitionBy("l_orderkey")
                    .orderBy("l_linenumber")
                ),
            ),
        }
        for name, df in shapes.items():
            dt = timed(df)
            results.setdefault(name, {})[f"x{factor}"] = {
                "rows": n_rows,
                "sec": round(dt, 2),
                "rows_per_sec": int(n_rows / dt),
            }

        sigs = minhash_signatures(d, "text", "doc_id").persist()
        dt = timed(lsh_candidate_pairs(sigs))
        results.setdefault("minhash_lsh_pairs", {})[f"x{factor}"] = {
            "rows": n_docs,
            "sec": round(dt, 2),
            "rows_per_sec": int(n_docs / dt),
        }
        sigs.unpersist()
        spark.catalog.clearCache()

        # Connected components: synthetic edge graph (12 edges/vertex,
        # same density as the fuzzy-pair graph at sf0.1) isolating the
        # iterative join+min-agg rounds — the part of entity_clusters
        # that must scale; candidate-pair generation is probed by the
        # quadratic-block analysis in PERF.md instead.
        from beacon_data_importer_spark.operators.graph import (
            min_label_propagation,
        )

        n_verts = 15_000 * factor
        e = spark.range(n_verts * 12).select(
            (F.col("id") % n_verts).alias("src"),
            ((F.col("id") * 7 + 1) % n_verts).alias("dst"),
        )
        dt = timed(min_label_propagation(e, iters=4))
        results.setdefault("cc_propagation_4r", {})[f"x{factor}"] = {
            "rows": n_verts * 12,
            "sec": round(dt, 2),
            "rows_per_sec": int(n_verts * 12 / dt),
        }
        spark.catalog.clearCache()

        # Convergent CC (pointer jumping): the round count should stay
        # ~log(diameter) as the graph amplifies — the claim under test
        # for the O(log n) path.  Same synthetic graph.  The operator
        # iterates EAGERLY (per-round parquet materialization), so time
        # the whole call, not just the returned frame's write.
        from beacon_data_importer_spark.operators.graph import (
            connected_components,
        )

        t0 = time.time()
        cc_out = connected_components(e)
        cc_out.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        results.setdefault("cc_converged_jump", {})[f"x{factor}"] = {
            "rows": n_verts * 12,
            "sec": round(dt, 2),
            "rows_per_sec": int(n_verts * 12 / dt),
        }
        spark.catalog.clearCache()

        # PQ: encode + ADC scan over an amplified embedding corpus
        # (copy 0 keeps vec_ids 0..15 = the codebook source and the
        # query vector; offsets keep ids unique).  Map-only — should
        # scale linearly with corpus size.
        from beacon_data_importer_spark.operators.pq import pq_search

        emb = amplify(
            read_table(spark, sf_dir, "embeddings"), factor, ["vec_id"]
        ).repartition(spark.sparkContext.defaultParallelism)
        n_vecs = emb.count()
        dt = timed(
            pq_search(emb, emb.filter("vec_id = 0"), k=10, exclude_id=0)
        )
        results.setdefault("pq_encode_adc", {})[f"x{factor}"] = {
            "rows": n_vecs,
            "sec": round(dt, 2),
            "rows_per_sec": int(n_vecs / dt),
        }
        spark.catalog.clearCache()

    print(json.dumps({"metric": "scale_probe", "shapes": results}))


if __name__ == "__main__":
    main()
