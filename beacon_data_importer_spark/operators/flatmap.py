"""flatMap / table-generator surface (SURVEY §2.6 G1/G2).

The reference's only UDTF-shaped operator is ``rowmapmany`` generating
0–3 note rows per call attempt (``prepare_calls.py:55-61,248-274``), with
``failonerror=False`` silently dropping rows whose generator raises (G2).

Spark-first translation: compute the repeat count with a ``when`` chain,
then ``posexplode(array_repeat(...))`` — a narrow, codegen'd operation.
No Python UDTF is needed for the reference surface; ``mapInPandas``
remains the generic escape hatch for arbitrary row generators (see
operators/multimodal.py for that pattern), and catalog_r3b's
``flatmap_attempts_udtf`` demonstrates the Spark 4 lateral-UDTF form of
this same generator for the genuinely-imperative case — same oracle,
Python-worker cost visible in the plan audit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def explode_counted(
    df: DataFrame,
    count: Column,
    keep: list[str],
    attempt_col: str = "attempt_number",
) -> DataFrame:
    """Emit ``count`` copies of each row (0 → row disappears, G2's
    silent-drop semantics), numbering copies 1..count.

    Narrow transformation — no shuffle; rows expand in place within their
    partition, so a 100 TB input explodes without any exchange.
    """
    exploded = df.select(
        *keep,
        F.posexplode(F.array_repeat(F.lit(1), count.cast("int"))).alias(
            "__pos", "__one"
        ),
    )
    return exploded.select(*keep, (F.col("__pos") + 1).alias(attempt_col))
