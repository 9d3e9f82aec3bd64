"""ANN scale probe: does IVF's cell count have to SCALE with the
corpus, the way SemDeDup's k does (tools/semdedup_scale_probe.py)?

Amplifies the embeddings table 8× (id offsets + a deterministic
per-copy rotation of vector components so copies are not byte-dupes),
then measures, at 1× and 8×:

1. brute-force top-10 for 5 queries (the exact baseline's wall),
2. IVF search with FIXED nlist (1× cell count) — per-cell population
   grows 8×, so probe-side candidate scans grow 8×,
3. IVF search with SCALED nlist (√n rule: ×√8 ≈ 2.83 → ceil to 3×) —
   per-cell population grows ~2.8× instead.

Recall vs the exact baseline is reported for every IVF leg (nprobe=4)
— the scaled-nlist point must hold recall while cutting candidate
volume.  Prints one JSON line; findings go to PERF.md.
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

OFFSET = 10_000_000
K = 10
NPROBE = 4


def amplify(emb, times: int):
    """times copies with offset ids; copy i cyclically rotates the
    vector by i positions so copies are geometrically distinct."""
    out = None
    for i in range(times):
        c = emb.select(
            (F.col("vec_id") + i * OFFSET).alias("vec_id"),
            F.expr(
                f"concat(slice(embedding, {i + 1}, size(embedding) - {i}),"
                f" slice(embedding, 1, {i}))"
            ).alias("embedding"),
            "label",
        )
        out = c if out is None else out.unionByName(c)
    return out


def brute(corpus, queries):
    from beacon_data_importer_spark.operators.similarity import cosine_topk

    return cosine_topk(corpus, queries, k=K)


def ivf(corpus, queries, nlist: int):
    """Plain IVF: centroids = every (corpus_size/nlist)-th vector,
    nprobe nearest cells per query, exact re-rank within candidates."""
    from beacon_data_importer_spark.operators.similarity import (
        assign_cells,
        cosine,
    )
    from pyspark.sql import Window

    n = corpus.count()
    step = max(1, n // nlist)
    cent = (
        corpus.filter(F.col("vec_id") % step == 0)
        .limit(nlist)
        .select(
            F.col("vec_id").alias("cell_id"),
            F.col("embedding").alias("centroid"),
        )
    ).localCheckpoint()
    tagged = assign_cells(corpus, cent).localCheckpoint()

    # query-side: nprobe nearest cells each
    qcells = assign_cells(
        queries.select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qvec"),
        ),
        cent,
        id_col="query_id",
        vec_col="qvec",
    )
    # take top-NPROBE cells per query by scoring all cells (bounded)
    qx = (
        queries.select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qvec"),
        )
        .crossJoin(F.broadcast(cent))
        .select(
            "query_id",
            "qvec",
            "cell_id",
            cosine("qvec", "centroid").alias("csim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("csim").desc(), "cell_id"
    )
    probes = qx.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= NPROBE
    ).select("query_id", "qvec", "cell_id")
    cand = probes.join(tagged, "cell_id").filter(
        F.col("vec_id") != F.col("query_id")
    )
    scored = cand.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        cosine("embedding", "qvec").alias("sim"),
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), "neighbor_id"
    )
    return (
        scored.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= K)
        .select("query_id", "neighbor_id")
    ), cand


def timed_set(df):
    t0 = time.time()
    rows = {(r[0], r[1]) for r in df.select(df.columns[0], df.columns[1]).collect()}
    return time.time() - t0, rows


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark()
    base = read_table(spark, sf_dir, "embeddings")
    out: dict = {"sf_dir": sf_dir}
    for amp, corpus in (("1x", base), ("8x", amplify(base, 8))):
        corpus = corpus.localCheckpoint()
        n = corpus.count()
        queries = corpus.filter(F.col("vec_id") % 997 == 0).limit(5)
        out[f"{amp}_n"] = n
        tb, exact = timed_set(
            brute(corpus, queries).select("query_id", "neighbor_id")
        )
        legs = {"brute_s": round(tb, 2)}
        nlist_1x = 24
        configs = {"fixed_nlist": nlist_1x}
        if amp == "8x":
            configs["scaled_nlist"] = nlist_1x * 3  # ~sqrt(8) ceil
        for name, nlist in configs.items():
            df, cand = ivf(corpus, queries, nlist)
            t0 = time.time()
            got = {(r[0], r[1]) for r in df.collect()}
            t = time.time() - t0
            n_cand = cand.count()
            recall = len(got & exact) / max(1, len(exact))
            legs[name] = {
                "nlist": nlist,
                "search_s": round(t, 2),
                "candidates": n_cand,
                "recall_at_10": round(recall, 3),
            }
        out[amp] = legs
        print(f"  {amp}: {legs}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
