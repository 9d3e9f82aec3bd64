"""Automated physical-plan audit: runs .explain("formatted") for every
catalog query and extracts the scale-relevant plan features (pushdown,
exchanges, broadcast vs sort-merge joins, codegen, Python evals).

Usage: python tools/explain_audit.py [sf_dir] > PLAN_AUDIT.json

Caveat: ``whole_stage_codegen`` is only visible for plans WITHOUT
exchanges — an AdaptiveSparkPlan that hasn't executed yet prints no
codegen ids, so the flag reads False for every AQE-wrapped plan
regardless of what will actually codegen at runtime.  Treat it as
meaningful only when ``exchanges == 0``.
"""

from __future__ import annotations

import io
import json
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")


def features(txt: str) -> dict:
    return {
        "exchanges": len(re.findall(r"\(\d+\) Exchange\b", txt)),
        "broadcast_joins": txt.count("BroadcastHashJoin"),
        "sort_merge_joins": txt.count("SortMergeJoin"),
        "pushed_filter_scans": len(
            [m for m in re.findall(r"PushedFilters: \[([^\]]*)\]", txt) if m.strip()]
        ),
        "take_ordered": "TakeOrderedAndProject" in txt,
        "python_evals": txt.count("ArrowEvalPython")
        + txt.count("BatchEvalPython")
        + txt.count("FlatMapGroupsInPandas")
        + txt.count("MapInPandas")
        + txt.count("EvalPythonUDTF"),
        "cartesian_products": txt.count("CartesianProduct"),
        "whole_stage_codegen": "WholeStageCodegen" in txt or "codegen id" in txt,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as em
    from beacon_data_importer_spark.session import get_spark

    spark = get_spark(app_name="explain-audit")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, dict] = {}
    for name, fn in em.queries().items():
        try:
            buf = io.StringIO()
            with redirect_stdout(buf):
                fn(spark, sf_dir).explain("formatted")
            out[name] = features(buf.getvalue())
        except Exception as ex:  # keep auditing the rest
            out[name] = {"error": str(ex)[:200]}
    print(json.dumps({"metric": "plan_audit", "sf_dir": sf_dir, "plans": out}, indent=1))


if __name__ == "__main__":
    main()
