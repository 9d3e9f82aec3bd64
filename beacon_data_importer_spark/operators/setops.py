"""Set operations (SURVEY §2.8 U1).

The reference's only set op is ``etl.cat`` — union by field name with
missing columns padded to missing and duplicates kept (bag semantics),
used 3× (``prepare_calls.py:152-155,180,187-190``).  Spark's
``unionByName(allowMissingColumns=True)`` is the exact primitive: a
zero-shuffle concatenation of partitions.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame


def union_by_name(frames: list[DataFrame]) -> DataFrame:
    """N-way ``etl.cat``: union by column name, pad missing with NULL,
    keep duplicates.  No shuffle — partition lists concatenate."""
    if not frames:
        raise ValueError("union_by_name needs at least one frame")
    return reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=True), frames
    )
