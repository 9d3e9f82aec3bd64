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


def _synth_names(spark, n: int):
    """n rows of entropy-bearing 10-letter names with planted near-dupes:
    ids 2i and 2i+1 share a base name, the odd one mutated at one
    md5-chosen position — so the TRUE pair count grows linearly (n/2)
    while names are letter-random (unlike the testdata's Customer#%09d
    digits).  Both pair members share the 25-value coarse key, so the
    coarse and segment strategies answer the identical query."""
    gid = F.floor(F.col("id") / 2).cast("bigint")
    h = F.md5(F.concat(F.lit("name|"), gid.cast("string")))
    name = F.concat(
        *[
            F.char(
                F.conv(F.substring(h, 2 * j + 1, 2), 16, 10).cast("int") % 26
                + 97
            )
            for j in range(10)
        ]
    )
    p = (
        F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 4), 16, 10)
        .cast("int")
        % 10
    )
    mutated = F.concat(
        name.substr(F.lit(1), p), F.lit("z"), name.substr(p + 2, F.lit(2147483647))
    )
    ck = (
        F.conv(F.substring(F.md5(F.concat(F.lit("ck|"), gid.cast("string"))), 1, 4), 16, 10)
        .cast("int")
        % 25
    )
    return spark.range(n).select(
        F.col("id"),
        F.when(F.col("id") % 2 == 1, mutated).otherwise(name).alias("name"),
        ck.alias("ck"),
    )


def blocking_probe() -> None:
    """Growth curves for the ER candidate-pair strategies on
    entropy-bearing names (the demonstration the round-2 audit asked
    for): the coarse 25-value block's verify stream grows ~quadratically
    (×16 per ×4 rows), segment blocking's ~linearly (×4 per ×4), and
    the cost-based auto mode picks segments.  Prints one JSON line."""
    from beacon_data_importer_spark.operators.blocking import (
        blocking_cost_estimates,
        candidate_pairs,
    )

    spark = get_spark(app_name="blocking-probe")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, dict] = {}
    for n in (10_000, 40_000, 160_000):
        names = _synth_names(spark, n).persist()
        names.count()
        coarse_est, seg_est = blocking_cost_estimates(
            names, "name", k=2, coarse_key="ck"
        )
        row: dict = {
            "coarse_candidates": coarse_est,
            "segment_candidates": seg_est,
            "auto_picks": "segment" if seg_est * 4 < coarse_est else "coarse",
        }
        t0 = time.time()
        row["segment_pairs"] = candidate_pairs(
            names, "id", "name", k=2, coarse_key="ck", strategy="segment"
        ).count()
        row["segment_sec"] = round(time.time() - t0, 2)
        if n <= 40_000:  # the quadratic side stops being runnable fast
            t0 = time.time()
            row["coarse_pairs"] = candidate_pairs(
                names, "id", "name", k=2, coarse_key="ck", strategy="coarse"
            ).count()
            row["coarse_sec"] = round(time.time() - t0, 2)
        names.unpersist()
        out[f"n{n}"] = row
    print(json.dumps({"metric": "blocking_probe", "rows": out}))


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

        # Passage dedup: amplified copies duplicate EVERY passage, so
        # each passage-hash window partition grows with the factor —
        # the adversarial direction for the first-copy rank shuffle.
        # Throughput should stay ~flat (rows/sec) if the hash key
        # distributes; a super-linear time jump would flag skew.
        from beacon_data_importer_spark.operators.dedup import passage_dedup

        dt = timed(passage_dedup(d, "text", "doc_id"))
        results.setdefault("passage_dedup", {})[f"x{factor}"] = {
            "rows": n_docs,
            "sec": round(dt, 2),
            "rows_per_sec": int(n_docs / dt),
        }

        sigs = minhash_signatures(d, "text", "doc_id").persist()
        dt = timed(lsh_candidate_pairs(sigs))
        results.setdefault("minhash_lsh_pairs", {})[f"x{factor}"] = {
            "rows": n_docs,
            "sec": round(dt, 2),
            "rows_per_sec": int(n_docs / dt),
        }

        # Incremental dedup's band-key semi-join (batch vs corpus —
        # catalog_r3b): split the amplified corpus in half by id parity,
        # band both sides, join on (band, bucket).  Work is two narrow
        # banding passes + one hash join keyed on band buckets — should
        # scale linearly; adversarial duplicate growth fattens buckets
        # but the join carries only (id, band, bucket), never payloads.
        from beacon_data_importer_spark.operators.dedup import lsh_bands

        even = sigs.filter(F.col("id") % 2 == 0)
        odd = sigs.filter(F.col("id") % 2 == 1)
        cband = lsh_bands(even).select("band", "bucket")
        nband = lsh_bands(odd)
        dt = timed(
            nband.join(cband, ["band", "bucket"]).select("id").distinct()
        )
        results.setdefault("incremental_band_join", {})[f"x{factor}"] = {
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

        # Triangle counting under skew: a star graph whose hub sits at
        # the MEDIAN id (adjacent to every other vertex) plus a ring of
        # local edges.  Under id orientation the hub is the middle
        # vertex of (in-deg × out-deg) ≈ (n/2)² wedges — the quadratic
        # "last reducer" hot key; degree orientation points every hub
        # edge AT the hub (max degree), so the hub expands ZERO wedges
        # and the whole count is linear in the ring.  The id-oriented
        # variant is timed alongside as the control; counts must agree
        # (asserted by tests/test_r3c_search_dedup.py).
        from beacon_data_importer_spark.operators.graph import (
            degree_oriented_triangles,
        )

        n_tv = 3_000 * factor
        h = n_tv // 2
        hub = spark.range(n_tv).filter(F.col("id") != h).select(
            F.least(F.col("id"), F.lit(h)).alias("a"),
            F.greatest(F.col("id"), F.lit(h)).alias("b"),
        )
        ring = (
            spark.range(n_tv - 1)
            .filter((F.col("id") != h) & (F.col("id") + 1 != h))
            .select(F.col("id").alias("a"), (F.col("id") + 1).alias("b"))
        )
        tedges = hub.unionAll(ring).persist()
        n_te = tedges.count()

        dt = timed(degree_oriented_triangles(tedges))
        results.setdefault("triangles_degree_oriented", {})[f"x{factor}"] = {
            "rows": n_te,
            "sec": round(dt, 2),
            "rows_per_sec": int(n_te / dt),
        }
        e1 = tedges.select(F.col("a").alias("a1"), F.col("b").alias("b1"))
        e2 = tedges.select(F.col("a").alias("a2"), F.col("b").alias("b2"))
        e3 = tedges.select(F.col("a").alias("a3"), F.col("b").alias("b3"))
        tri_id = (
            e1.join(e2, F.col("a2") == F.col("b1"))
            .join(
                e3,
                (F.col("a3") == F.col("a1")) & (F.col("b3") == F.col("b2")),
            )
            .agg(F.count(F.lit(1)).alias("n_triangles"))
        )
        dt = timed(tri_id)
        results.setdefault("triangles_id_oriented", {})[f"x{factor}"] = {
            "rows": n_te,
            "sec": round(dt, 2),
            "rows_per_sec": int(n_te / dt),
        }
        tedges.unpersist()
        spark.catalog.clearCache()

        # Sliding distinct count (interval union): the linear
        # formulation must scale ~linearly where the collect_list
        # RANGE-frame form is O(rows x frame).  Amplified orders grow
        # both rows AND per-day frame population - the adversarial
        # direction for the naive form, neutral for this one.
        from beacon_data_importer_spark.operators.distinct_window import (
            sliding_distinct_count,
        )

        ob = o.select(
            F.col("o_orderpriority").alias("g"),
            F.col("o_custkey").alias("k"),
            F.datediff(
                F.col("o_orderdate").cast("date"),
                F.lit("1992-01-01").cast("date"),
            ).cast("bigint").alias("d"),
        )
        n_ob = ob.count()
        dt = timed(sliding_distinct_count(ob, "g", "k", "d", 90))
        results.setdefault("sliding_distinct_interval_union", {})[
            f"x{factor}"
        ] = {
            "rows": n_ob,
            "sec": round(dt, 2),
            "rows_per_sec": int(n_ob / dt),
        }
        spark.catalog.clearCache()

    print(json.dumps({"metric": "scale_probe", "shapes": results}))


def cf_probe() -> None:
    """Item-item CF scaling claim (catalog_r5g.q_item_item_cf_topk):
    work is baskets × width², i.e. LINEAR in rows for bounded basket
    width.  Probe directions:

    * ``xN`` — amplify lineitem by orderkey offsets only (8× baskets,
      SAME part catalog): pair-groupBy key cardinality stays constant,
      counts fatten — rows/sec should stay ~flat (map-side combine
      carries the growth).
    * ``hub`` — plant ONE mega-basket holding every part (the width²
      adversary the docstring warns about): measured so the documented
      hazard has a number attached, not a hand-wave.
    """
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="cf-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import Window

    def cf_topk(it):
        pop = it.groupBy("p").agg(F.count(F.lit(1)).alias("n"))
        x = it.select("o", F.col("p").alias("a"))
        y = it.select(F.col("o").alias("o_r"), F.col("p").alias("b"))
        co = (
            x.join(y, (F.col("o") == F.col("o_r")) & (F.col("a") < F.col("b")))
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("c"))
            .filter(F.col("c") >= 2)
        )
        sym = co.unionByName(
            co.select(F.col("b").alias("a"), F.col("a").alias("b"), "c")
        )
        pa = pop.select(F.col("p").alias("a"), F.col("n").alias("na"))
        pb = pop.select(F.col("p").alias("b"), F.col("n").alias("nb"))
        raw = F.col("c").cast("double") / F.sqrt(
            (F.col("na") * F.col("nb")).cast("double")
        )
        w = Window.partitionBy("a").orderBy(F.col("raw").desc(), "b")
        return (
            sym.join(pa, "a").join(pb, "b")
            .select("a", "b", "c", raw.alias("raw"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 5)
        )

    results: dict[str, dict] = {}
    base = read_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    )
    for factor in (1, 8):
        it = (
            amplify(base, factor, ["o"])
            .distinct()
            .repartition(spark.sparkContext.defaultParallelism, "o")
            .persist()
        )
        n = it.count()
        dt = timed(cf_topk(it))
        results[f"baskets_x{factor}"] = {
            "rows": n,
            "sec": round(dt, 2),
            "rows_per_sec": int(n / dt),
        }
        it.unpersist()
        spark.catalog.clearCache()

    # hub adversary: one basket containing EVERY part (width W ⇒ W²/2
    # pairs from a single input row group — the skew no partitioning
    # fixes, only a width cap does).
    parts = base.select("p").distinct()
    hub = parts.select(F.lit(-1).cast("bigint").alias("o"), "p")
    it = (
        base.unionByName(hub)
        .distinct()
        .repartition(spark.sparkContext.defaultParallelism, "o")
        .persist()
    )
    n = it.count()
    width = parts.count()
    dt = timed(cf_topk(it))
    results["hub_basket"] = {
        "rows": n,
        "hub_width": width,
        "sec": round(dt, 2),
        "rows_per_sec": int(n / dt),
    }
    it.unpersist()
    print(json.dumps({"metric": "cf_scale_probe", "shapes": results}))


def rank_probe() -> None:
    """global_rank + SNM banding scaling (operators/order.global_rank,
    catalog_r5j): the rank is one range exchange + map-side counters,
    and the banded neighborhood self-join is an equi-join on width-w
    buckets — both should hold rows/sec as the entity count amplifies
    (names get offset suffixes so key cardinality scales too)."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="rank-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    from beacon_data_importer_spark.operators.order import global_rank

    results: dict[str, dict] = {}
    base = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name"
    )
    for factor in (1, 8):
        c = None
        for i in range(factor):
            part = base.select(
                (F.col("c_custkey") + F.lit(i * 100_000_000)).alias(
                    "c_custkey"
                ),
                F.concat(F.col("c_name"), F.lit(f"#{i}")).alias("c_name"),
            )
            c = part if c is None else c.unionByName(part)
        n = c.count()

        t0 = time.time()
        ranked = global_rank(c, ["c_name", "c_custkey"], out_col="r")
        ranked.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        results[f"global_rank_x{factor}"] = {
            "rows": n,
            "sec": round(dt, 2),
            "rows_per_sec": int(n / dt),
        }

        w = 5
        left = ranked.select(
            F.col("c_custkey").alias("ka"),
            F.col("c_name").alias("na"),
            F.col("r").alias("ra"),
            F.expr(f"(r - 1) div {w}").alias("bucket"),
        )
        rb = F.expr(f"(r - 1) div {w}")
        right = ranked.select(
            F.col("c_custkey").alias("kb"),
            F.col("c_name").alias("nb"),
            F.col("r").alias("rbr"),
            F.explode(F.array(rb, rb - 1)).alias("bucket"),
        ).filter(F.col("bucket") >= 0)
        pairs = (
            left.join(right, "bucket")
            .filter(
                (F.col("rbr") - F.col("ra") >= 1)
                & (F.col("rbr") - F.col("ra") <= w)
            )
            .select("ka", "kb", F.levenshtein("na", "nb").alias("lev"))
        )
        t0 = time.time()
        pairs.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        results[f"snm_banded_pairs_x{factor}"] = {
            "rows": n,
            "sec": round(dt, 2),
            "rows_per_sec": int(n / dt),
        }
        spark.catalog.clearCache()
    print(json.dumps({"metric": "rank_scale_probe", "shapes": results}))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "blocking":
        blocking_probe()
    elif len(sys.argv) > 1 and sys.argv[1] == "cf":
        cf_probe()
    elif len(sys.argv) > 1 and sys.argv[1] == "rank":
        rank_probe()
    else:
        main()
