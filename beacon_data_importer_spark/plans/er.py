"""Entity-resolution staging plan: ONE fuzzy-pair stream, five consumers.

Round-2's ER queries (fuzzy_name_pairs, entity_clusters,
entity_components, entity_golden_records, entity_survivors) each
recomputed the same candidate-pair levenshtein stream — ~20 s of the
45 s warm bench total was one stream computed three times.  This plan
materializes it once per (session, sf_dir) via
``operators.blocking.staged_fuzzy_pairs`` — the staging-table pattern a
warehouse would use (and the one ``operators/graph.py`` already uses
for CC rounds) — so every downstream ER query pays sub-second marginal
cost.

The blocking strategy is ``auto`` (cost-based): exact pigeonhole
segment blocking when segment-value entropy shrinks the candidate
stream, exhaustive coarse-key verify otherwise.  Both are EXACT, so
the five queries' oracles are strategy-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.blocking import staged_fuzzy_pairs
from ..sources.parquet import read_table


def customer_fuzzy_pairs(
    spark: SparkSession, sf_dir: str, k: int = 2, strategy: str = "auto"
) -> DataFrame:
    """The customer-name fuzzy-duplicate pair stream ``(a, b,
    edit_dist)`` (``a < b``, levenshtein ≤ k, blocked within nation —
    the fuzzy generalization of the reference's exact ``nhs_number``
    match, ``sql/import_identified_needs.sql:24-26``), staged once per
    session and scale factor."""
    c = read_table(spark, sf_dir, "customer")
    return staged_fuzzy_pairs(
        spark,
        c,
        "c_custkey",
        "c_name",
        k=k,
        coarse_key="c_nationkey",
        strategy=strategy,
        stage_key=f"customer|{sf_dir}",
    )
