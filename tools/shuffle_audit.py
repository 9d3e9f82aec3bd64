"""Shuffle-bytes audit: run each headline query and report how many
bytes it actually shuffled (and spilled), via the Spark UI REST API.

Rationale: ``.explain`` shows WHERE exchanges are; this shows HOW BIG
they are — the number that decides whether a plan survives a 100× scale
step.  A query whose shuffle bytes are O(groups), not O(rows), is
scale-safe; one that shuffles its whole input deserves a second look.

Usage: python tools/shuffle_audit.py [sf_dir]   (default sf0.1)
Prints one JSON line per query: shuffle_write / shuffle_read /
spill bytes summed over the query's stages, plus input bytes.
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _api(base: str, path: str):
    with urllib.request.urlopen(f"{base}/api/v1/{path}") as r:
        return json.load(r)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    import __spark_entry__ as entrymod
    from bench import HEADLINE
    from beacon_data_importer_spark.session import get_spark

    spark = get_spark(app_name="shuffle-audit")
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.sparkContext.uiWebUrl
    if not base:
        print(json.dumps({"error": "Spark UI disabled; no REST metrics"}))
        return
    app_id = _api(base, "applications")[0]["id"]
    qs = entrymod.queries()

    def completed_stage_ids() -> set[int]:
        return {
            s["stageId"]
            for s in _api(base, f"applications/{app_id}/stages")
            if s["status"] in ("COMPLETE", "SKIPPED")
        }

    out = {}
    for name in HEADLINE:
        before = completed_stage_ids()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        new = completed_stage_ids() - before
        stats = {
            "shuffle_write_b": 0,
            "shuffle_read_b": 0,
            "spill_disk_b": 0,
            "input_b": 0,
        }
        for s in _api(base, f"applications/{app_id}/stages"):
            if s["stageId"] in new and s["status"] == "COMPLETE":
                stats["shuffle_write_b"] += s.get("shuffleWriteBytes", 0)
                stats["shuffle_read_b"] += s.get("shuffleReadBytes", 0)
                stats["spill_disk_b"] += s.get("diskBytesSpilled", 0)
                stats["input_b"] += s.get("inputBytes", 0)
        out[name] = stats
        print(json.dumps({"query": name, **stats}))

    total = {k: sum(v[k] for v in out.values()) for k in next(iter(out.values()))}
    print(json.dumps({"query": "_total", **total}))


if __name__ == "__main__":
    main()
