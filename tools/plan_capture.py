"""Capture .explain("formatted") for named queries into plans/r<N>/.

Usage: python tools/plan_capture.py <suffix> query [query ...]
       (suffix is "before" or "after"; writes plans/$SPARK_GRAFT_PLAN_DIR/<query>_<suffix>.txt,
       SPARK_GRAFT_PLAN_DIR default r12)
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entrymod
    from beacon_data_importer_spark.session import get_spark

    spark = get_spark(app_name="plan_capture")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    outdir = os.path.join(
        REPO, "plans", os.environ.get("SPARK_GRAFT_PLAN_DIR", "r12")
    )
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        if name not in qs:
            print(f"?? unknown query {name}")
            continue
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
