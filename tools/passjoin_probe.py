"""PassJoin-style segment blocking probe for the fuzzy-pair stream.

Hypothesis: the nation-blocked candidate stream (600²/2 pairs per
nation at sf0.1, every one paying a banded levenshtein) can be cut by
orders of magnitude with the partition-enumeration rule (Li et al.,
PassJoin, VLDB'12): for edit distance ≤ k, split one string into k+1
segments — at least one segment is edit-free (pigeonhole) and appears
EXACTLY in the other string at a position shifted by at most k.
Candidates = pairs sharing any (segment_idx, segment_text) key with
shift ≤ k; the banded levenshtein then runs only on candidates.

The probe verifies EXACT pair-set equality against the production
filter at the given SF before reporting timings — a faster candidate
rule that drops pairs is wrong, not fast.

Usage: python tools/passjoin_probe.py [sf_dir]

MEASURED VERDICT (2026-08-13, kept as a negative result): exact-set
equality holds at sf0.01 AND sf0.1, but pruning is ZERO on this data —
4 501 092 candidates = the full blocked pair count at sf0.1 (16.6 s vs
6.3 s baseline).  Cause: the synthetic names are 'Customer#%09d' with
custkey ≤ 150 000, so the first zero-padded segment is '000' for every
row and every pair shares it.  Segment blocking needs entropy spread
across the string; on id-like low-entropy prefixes the nation-block +
prefix-trimmed banded levenshtein (production path) wins.  Re-evaluate
if the name distribution changes.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from beacon_data_importer_spark.functions.expressions import bounded_levenshtein
from beacon_data_importer_spark.session import get_spark
from beacon_data_importer_spark.sources.parquet import read_table

K = 2          # edit-distance band
SEGS = K + 1   # pigeonhole segments
PFX = 9        # 'Customer#' — the shared constant prefix the names carry
SEG_LEN = 3    # 9-digit suffix -> 3 segments of 3


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="passjoin-probe")
    spark.sparkContext.setLogLevel("ERROR")

    c = read_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nk"),
        F.col("c_custkey").alias("ck"),
        F.col("c_name").alias("name"),
        F.substring("c_name", PFX + 1, 64).alias("sfx"),
    ).persist()
    c.count()

    # ---- baseline: full blocked candidate stream + banded levenshtein
    left = c.select("nk", F.col("ck").alias("a"), F.col("name").alias("name_a"))
    right = c.select("nk", F.col("ck").alias("b"), F.col("name").alias("name_b"))
    base = (
        left.join(right, "nk")
        .filter(F.col("a") < F.col("b"))
        .filter(bounded_levenshtein("name_a", "name_b", K) >= 0)
        .select("a", "b")
    )
    t0 = time.time()
    base_pairs = set(map(tuple, base.collect()))
    t_base = time.time() - t0

    # ---- PassJoin: fixed segment keys on the a-side, shifted on b-side
    a_keys = c.select(
        "nk", F.col("ck").alias("a"), F.col("name").alias("name_a"),
        F.explode(F.array(*[
            F.struct(
                F.lit(j).alias("j"),
                F.substring("sfx", j * SEG_LEN + 1, SEG_LEN).alias("seg"),
            )
            for j in range(SEGS)
        ])).alias("k"),
    ).select("nk", "a", "name_a", "k.j", "k.seg")
    b_keys = c.select(
        "nk", F.col("ck").alias("b"), F.col("name").alias("name_b"),
        F.explode(F.array(*[
            F.struct(
                F.lit(j).alias("j"),
                F.substring("sfx", j * SEG_LEN + 1 + d, SEG_LEN).alias("seg"),
            )
            for j in range(SEGS)
            for d in range(-K, K + 1)
            if j * SEG_LEN + 1 + d >= 1
        ])).alias("k"),
    ).select("nk", "b", "name_b", "k.j", "k.seg")

    cand = (
        a_keys.join(b_keys, ["nk", "j", "seg"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "name_a", "name_b")
        .distinct()
    )
    pj = cand.filter(bounded_levenshtein("name_a", "name_b", K) >= 0).select(
        "a", "b"
    )
    t0 = time.time()
    pj_pairs = set(map(tuple, pj.collect()))
    t_pj = time.time() - t0
    n_cand = cand.count()

    same = base_pairs == pj_pairs
    print(
        f"baseline: {len(base_pairs)} pairs in {t_base:.2f}s | "
        f"passjoin: {len(pj_pairs)} pairs in {t_pj:.2f}s "
        f"({n_cand} candidates) | sets_equal={same}"
    )
    if not same:
        print("MISSING from passjoin:", sorted(base_pairs - pj_pairs)[:10])
        print("EXTRA in passjoin:", sorted(pj_pairs - base_pairs)[:10])
        raise SystemExit(1)
    spark.stop()


if __name__ == "__main__":
    main()
