"""nprobe recall/cost curve for hard_negative_mining_ivf (round 7).

The round-7 bench measured the IVF mining variant 3.3× faster than
brute at sf0.1 with pos-agreement 0.36 at nprobe=2 of nlist=20 cells —
and 0.60 at sf0.01 where the same nprobe covers 40% of the cells.
That drop is the fixed-capacity-parameter failure mode
(tools/ann_scale_probe.py) surfacing in the product query.  This probe
measures the actual knob: at a fixed corpus (sf0.1, 2000 vectors, 20
cells), sweep nprobe and record

  * pos/neg agreement of the mined (positive, hard-negative) pairs vs
    the brute-exact truth (the hard_negative_recall_audit comparison,
    computed inline), and
  * wall per variant,

so the recall-vs-scanned-fraction trade is a table, not a guess.  The
expectation to verify: agreement rises ~monotonically with
nprobe/nlist and reaches 1.0 only at nprobe = nlist (scan everything);
wall grows linearly in the scanned fraction.

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

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
NPROBES = [1, 2, 4, 8, 20]


def main() -> None:
    from beacon_data_importer_spark.catalog_r6c import (
        q_hard_negative_mining,
    )
    from beacon_data_importer_spark.catalog_r7 import _hnm_ivf_triples

    spark = get_spark(app_name="hnm-nprobe-probe")
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    brute = q_hard_negative_mining(spark, SF_DIR).localCheckpoint()
    brute_sec = time.time() - t0
    n_q = brute.count()

    out = {"sf_dir": SF_DIR, "n_queries": n_q,
           "brute_sec": round(brute_sec, 2), "nprobe": {}}
    for np_ in NPROBES:
        t0 = time.time()
        ivf = _hnm_ivf_triples(spark, SF_DIR, nprobe=np_).localCheckpoint()
        sec = time.time() - t0
        j = brute.alias("b").join(
            ivf.select(
                "query_id",
                F.col("pos_id").alias("ip"),
                F.col("neg_id").alias("ineg"),
            ),
            "query_id",
        )
        row = j.agg(
            F.sum(
                F.when(F.col("ip").eqNullSafe(F.col("pos_id")), 1).otherwise(0)
            ).alias("pos"),
            F.sum(
                F.when(F.col("ineg").eqNullSafe(F.col("neg_id")), 1)
                .otherwise(0)
            ).alias("neg"),
        ).collect()[0]
        out["nprobe"][np_] = {
            "pos_agree": round(row.pos / max(n_q, 1), 3),
            "neg_agree": round(row.neg / max(n_q, 1), 3),
            "sec": round(sec, 2),
        }
        print(f"nprobe={np_}: pos={row.pos}/{n_q} neg={row.neg}/{n_q} "
              f"wall={sec:.2f}s", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
