"""Weighted-SSSP scale probe (VERDICT r5 item 5).

The unweighted per-round doctrine (operators/graph.py: memory-backed
materialization compounds ~2.7×/round past ~16 rounds; detached parquet
re-reads stay flat) was measured on connected-components label tables.
``weighted_sssp`` (catalog_r5f.py) inherits that doctrine UNTESTED: its
per-round state is a (v, dist) frontier relaxed through a join + min-agg
— different state width, different growth curve (the frontier EXPANDS
for the first diameter-many rounds instead of shrinking like CC labels).

This probe answers, with weighted edges:

1. per-round marginal cost at 1× and 8× graph amplification — does a
   round cost O(edges) (scales ~8×) or does lineage compounding make
   later rounds superlinear?
2. the round-materialization switch point: cumulative wall for R rounds
   under (a) the catalog's fully-unrolled lazy plan vs (b)
   localCheckpoint-per-round materialization — the round count where
   (b) overtakes (a) is where a cluster job should start materializing.

Amplification keeps the graph CONNECTED (unlike key-offset table
amplification, which would give the source 1/8th of the reachable
mass): 8 vertex-offset copies of the sf0.1 weighted co-purchase edge
list plus 7 weight-1 bridge edges from the global source to each
copy's own min vertex, so the frontier sweeps the full 8× edge set.

Prints one JSON line; findings go to PERF.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from beacon_data_importer_spark.session import get_spark

OFFSET = 100_000_000


def connected_amplify(edges, times: int):
    """times vertex-offset copies + bridges source→copy_i_min (w=1)."""
    src = edges.agg(F.min("a")).collect()[0][0]
    out = None
    for i in range(times):
        c = edges.select(
            (F.col("a") + i * OFFSET).alias("a"),
            (F.col("b") + i * OFFSET).alias("b"),
            "w",
        )
        out = c if out is None else out.unionByName(c)
    bridges = edges.sparkSession.createDataFrame(
        [(src, src + i * OFFSET, 1) for i in range(1, times)],
        "a long, b long, w int",
    )
    return out.unionByName(bridges)


def run_sssp(edges, rounds: int, materialize: bool) -> tuple[float, list[float], int]:
    """Bellman-Ford from min vertex; returns (total_s, per_round_s, n_reached)."""
    und = edges.select("a", "b", "w").unionByName(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"), "w")
    ).localCheckpoint()
    src = und.agg(F.min("a").alias("s"))
    dist = src.select(F.col("s").alias("v"), F.lit(0).alias("d"))
    per_round: list[float] = []
    t0 = time.time()
    for _ in range(rounds):
        r0 = time.time()
        expanded = dist.unionByName(
            dist.join(und, dist["v"] == und["a"]).select(
                F.col("b").alias("v"), (F.col("d") + F.col("w")).alias("d")
            )
        )
        dist = expanded.groupBy("v").agg(F.min("d").alias("d"))
        if materialize:
            dist = dist.localCheckpoint()
            per_round.append(time.time() - r0)
        # unrolled mode: rounds are lazy, only the final action is timed
    n = dist.count()
    total = time.time() - t0
    return total, per_round, n


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark()
    from beacon_data_importer_spark.plans.co_purchase import (
        co_purchase_edges_weighted,
    )

    base = (
        co_purchase_edges_weighted(spark, sf_dir)
        .select(
            "a", "b",
            F.greatest(F.lit(1), F.lit(6) - F.col("shared")).alias("w"),
        )
        .localCheckpoint()
    )
    out: dict = {"sf_dir": sf_dir, "edges_1x": base.count()}

    for amp, edges in (("1x", base), ("8x", connected_amplify(base, 8))):
        edges = edges.localCheckpoint()
        out[f"edges_{amp}"] = edges.count()
        for rounds in (2, 4, 6, 8, 10, 16):
            # unrolled lineage past ~10 rounds is catastrophic (measured
            # 329 s at 12 rounds / 1× vs 2.3 s materialized) — cap the
            # unrolled leg so the probe itself terminates.
            if rounds <= 10:
                tu, _, nu = run_sssp(edges, rounds, materialize=False)
            else:
                tu, nu = float("nan"), None
            tm, per_round, nm = run_sssp(edges, rounds, materialize=True)
            if nu is None:
                nu = nm
            assert nu == nm, (rounds, nu, nm)
            out[f"{amp}_r{rounds}"] = {
                "unrolled_s": round(tu, 2) if tu == tu else None,
                "materialized_s": round(tm, 2),
                "reached": nu,
                "mat_per_round_s": [round(x, 2) for x in per_round],
            }
            print(
                f"  {amp} rounds={rounds}: unrolled {tu:.2f}s "
                f"materialized {tm:.2f}s reached={nu}",
                file=sys.stderr,
            )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
