"""Hot-shingle adversary probe for shingle_containment_pairs (round 9;
the caliper/bigram/Misra-Gries probe pattern applied to the round's
new volume-bearing join).

The containment candidate join is `rare a JOIN rare b ON b.g = a.g`
where `rare` keeps shingles with document frequency 2..DF_MAX.  Pair
volume is Σ_g C(df_g, 2) over the KEPT shingles — bounded per shingle
by C(DF_MAX, 2), so total candidates ≤ C(DF_MAX,2)/DF_MAX ≈ DF_MAX/2
per rare POSTING: linear in corpus size by construction.  What the cap
costs is RECALL: a duplicated passage shared by MORE than DF_MAX
documents generates no candidates at all (its shingles are "too
common").  This probe measures both sides:

Legs (synthetic corpora, ~N_DOCS docs of 40 words each):
  1. organic   — every doc unique text (31-word vocabulary, seeded):
                 the real corpus shape; candidates ∝ rare postings.
  2. hotquote  — one 10-word passage pasted into HOT_DOCS documents
                 (HOT_DOCS >> DF_MAX): WITHOUT the cap this single
                 passage alone yields C(HOT_DOCS, 2) pairs; with the
                 cap it yields zero — the probe reports the pair
                 volume the cap averted AND the recall it gave up
                 (the hot group's pairs are exactly the ones dropped).
  3. ringshare — every doc shares one shingle with its DF_MAX−1
                 neighbors (df exactly at the cap): the worst KEPT
                 case; volume must track C(DF_MAX,2)·n/DF_MAX.

Mitigation shelved with a trigger (the caliper-cap doctrine): if the
dropped-hot-group recall matters for a corpus, route shingles with
df > DF_MAX into the exact-substring path (passage_dedup) instead of
raising the cap — the cap is what keeps this join linear.

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

N_DOCS = 20_000
DF_MAX = 10
HOT_DOCS = 400  # documents carrying the pasted hot passage


def main() -> None:
    from pyspark.sql import functions as F

    from beacon_data_importer_spark.session import get_spark

    spark = get_spark(app_name="containment_skew_probe")
    spark.sparkContext.setLogLevel("ERROR")

    vocab = [f"w{i:02d}" for i in range(31)]

    def text_for(i: int, leg: str) -> str:
        # deterministic 40-word doc from a multiplicative hash
        words = [
            vocab[(i * 2654435761 + j * 40503 + j * j) % len(vocab)]
            for j in range(40)
        ]
        if leg == "hotquote" and i < HOT_DOCS:
            words[10:20] = [f"hot{k}" for k in range(10)]
        if leg == "ringshare":
            # a 5-word passage shared with exactly DF_MAX docs (3
            # interior shingles — enough to clear the ≥3-shared emit
            # bar): group id
            g = i // DF_MAX
            words[0:5] = [f"ring{g}{k}" for k in range(5)]
        return " ".join(words)

    out: dict[str, dict] = {}
    for leg in ("organic", "hotquote", "ringshare"):
        docs = spark.createDataFrame(
            [(i, text_for(i, leg)) for i in range(N_DOCS)],
            "doc_id bigint, text string",
        ).repartition(32)
        docs.createOrReplaceTempView("documents")
        from beacon_data_importer_spark.catalog_r9f import (
            _containment_sql,
        )

        t0 = time.time()
        rows = spark.sql(_containment_sql("spark"))
        n_pairs = rows.count()
        wall = round(time.time() - t0, 2)
        # rare-posting volume (the linearity denominator) and the
        # postings the df cap DROPPED (the averted quadratic mass)
        tri = spark.sql(
            """
            SELECT doc_id, g FROM (
              SELECT doc_id,
                explode(transform(sequence(0, size(tk) - 3),
                  i -> concat(tk[i], ' ', tk[i+1], ' ', tk[i+2]))) AS g
              FROM (SELECT doc_id,
                      split(lower(trim(text)), '\\\\s+') AS tk
                    FROM documents WHERE trim(text) <> '')
              WHERE size(tk) >= 3) t
            GROUP BY doc_id, g
            """
        )
        df = tri.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
        kept = df.filter(
            (F.col("df") >= 2) & (F.col("df") <= DF_MAX)
        ).agg(
            F.coalesce(F.sum("df"), F.lit(0)).alias("postings"),
            F.coalesce(
                F.sum(F.col("df") * (F.col("df") - 1) / 2), F.lit(0)
            ).alias("pair_budget"),
        ).collect()[0]
        dropped = df.filter(F.col("df") > DF_MAX).agg(
            F.coalesce(
                F.sum(F.col("df") * (F.col("df") - 1) / 2), F.lit(0)
            ).alias("averted_pairs"),
            F.coalesce(F.count(F.lit(1)), F.lit(0)).alias("n_hot"),
        ).collect()[0]
        out[leg] = {
            "n_candidate_pairs": n_pairs,
            "rare_postings": int(kept.postings),
            "pair_budget_from_kept": int(kept.pair_budget),
            "hot_shingles_dropped": int(dropped.n_hot),
            "quadratic_pairs_averted": int(dropped.averted_pairs),
            "wall_s": wall,
        }

    print(
        json.dumps(
            {
                "probe": "containment_skew",
                "n_docs": N_DOCS,
                "df_max": DF_MAX,
                "hot_docs": HOT_DOCS,
                "legs": out,
            }
        )
    )


if __name__ == "__main__":
    main()
