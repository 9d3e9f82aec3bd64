"""Zipf-head adversary probe for bigram_lm_perplexity's scoring join
(round 8; the caliper_skew_probe class applied to the corpus LM).

The per-doc scorer hash-joins the bigram OCCURRENCE stream against the
bigram-count table ON the bigram string.  Natural text is Zipfian, so
one head bigram ("of the"-class) can be a double-digit percentage of
ALL occurrences — at warehouse scale that is one shuffle key carrying
a double-digit percentage of the probe side: the classic skew-join
straggler.  The repo's session enables AQE skew-join splitting
(spark.sql.adaptive.skewJoin.enabled); this probe MEASURES whether
that is sufficient on an adversarial head, with the broadcast
threshold forced to 0 so the join takes the sort-merge shape it has at
real scale (locally the count table is small and would broadcast,
hiding the skew path entirely).

Legs (fixed corpus size, ~N_DOCS docs × TOK_PER_DOC tokens):
  1. balanced  — tokens drawn round-robin from a V-word vocabulary:
                 every bigram key carries ~equal weight.
  2. zipf-head — HEAD_FRAC of all token positions are the SAME word:
                 the head bigram alone carries ~HEAD_FRAC² of the
                 occurrence stream through one shuffle key.
  3. zipf-head + salted head — the mitigation pattern if AQE were
                 unavailable: occurrences of the top-1 bigram join a
                 SALTED copy of its count row (key ⊗ 16 salts), the
                 tail joins normally, union.  Kept as the documented
                 escape hatch; leg 2 vs leg 3 tells whether AQE
                 already closes the gap.

Prints one JSON line; findings go to PERF.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F

from beacon_data_importer_spark.session import get_spark

N_DOCS = 4_000
TOK_PER_DOC = 200
VOCAB = 1_000
HEAD_FRAC = 0.5  # half of all token positions are the head word
SALTS = 16


def corpus(spark, skewed: bool):
    """(doc_id, bg) bigram occurrence stream, synthesized JVM-side."""
    base = spark.range(N_DOCS).select(F.col("id").alias("doc_id"))
    tok = (
        "transform(sequence(1, {m}), i -> "
        "CASE WHEN {skew} AND pmod(hash(doc_id * 1000003 + i), 100) < {h} "
        "THEN 'zzhead' "
        "ELSE concat('w', pmod(hash(doc_id * 7 + i * 13), {v})) "
        "END)"
    ).format(
        m=TOK_PER_DOC,
        v=VOCAB,
        skew="true" if skewed else "false",
        h=int(HEAD_FRAC * 100),
    )
    return (
        base.withColumn("ws", F.expr(tok))
        .withColumn(
            "bgs",
            F.expr(
                "transform(filter(sequence(1, size(ws)), i -> i < size(ws)),"
                " i -> concat(element_at(ws, i), ' ',"
                " element_at(ws, i + 1)))"
            ),
        )
        .select("doc_id", F.explode("bgs").alias("bg"))
        .repartition(32, "doc_id")
    )


def score_plain(big):
    bc = big.groupBy("bg").agg(F.count(F.lit(1)).alias("cb"))
    return (
        big.join(bc, "bg")
        .groupBy("doc_id")
        .agg(F.sum("cb").alias("s"))
    )


def score_salted_head(big, spark):
    bc = big.groupBy("bg").agg(F.count(F.lit(1)).alias("cb"))
    head = bc.orderBy(F.desc("cb")).limit(1).collect()[0]
    head_bg, head_cb = head.bg, head.cb
    salted_dim = spark.range(SALTS).select(
        F.lit(head_bg).alias("bg"),
        F.col("id").cast("int").alias("salt"),
        F.lit(head_cb).alias("cb"),
    )
    head_side = (
        big.filter(F.col("bg") == head_bg)
        .withColumn(
            "salt", F.pmod(F.hash("doc_id"), F.lit(SALTS)).cast("int")
        )
        .join(F.broadcast(salted_dim), ["bg", "salt"])
        .drop("salt")
    )
    tail_side = big.filter(F.col("bg") != head_bg).join(
        bc.filter(F.col("bg") != head_bg), "bg"
    )
    return (
        head_side.unionByName(tail_side)
        .groupBy("doc_id")
        .agg(F.sum("cb").alias("s"))
    )


def main() -> None:
    spark = get_spark(app_name="bigram_skew_probe", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    # force the at-scale SMJ shape: no broadcast of the count table
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.adaptive.autoBroadcastJoinThreshold", "-1"
    )
    # emulate warehouse-scale PROPORTIONS: the head partition is ~50%
    # of the probe stream but only ~10 MB locally, far under AQE's
    # 256 MB default skew threshold — scale the thresholds down so the
    # detector sees the same head/median RATIO it would see at 100 TB
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "1m",
    )
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m"
    )

    out = {}
    for leg, (skewed, scorer) in {
        "balanced": (False, "plain"),
        "zipf_head": (True, "plain"),
        "zipf_head_salted": (True, "salted"),
    }.items():
        big = corpus(spark, skewed).persist()
        n = big.count()  # materialize off the clock
        top = (
            big.groupBy("bg")
            .count()
            .orderBy(F.desc("count"))
            .limit(1)
            .collect()[0]
        )
        t = time.time()
        if scorer == "plain":
            res = score_plain(big)
        else:
            res = score_salted_head(big, spark)
        # collect() on THIS jdf so the inspected plan is the FINAL
        # adaptive plan (count() would plan+execute a different query
        # and leave isFinalPlan=false here)
        rows = len(res.collect())
        wall = round(time.time() - t, 2)
        plan = res._jdf.queryExecution().executedPlan().toString()
        out[leg] = {
            "occurrences": n,
            "head_key_fraction_ppm": int(top["count"] * 1_000_000 / n),
            "docs_scored": rows,
            "wall_s": wall,
            "skew_split_in_plan": "skew" in plan.lower(),
            "aqe_coalesced": "AQEShuffleRead coalesced" in plan,
        }
        big.unpersist()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
