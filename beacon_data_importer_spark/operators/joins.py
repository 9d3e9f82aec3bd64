"""Join operators (SURVEY §2.4 J1–J6).

The reference hand-rolls joins two ways: in-driver hash maps probed per
row (petl ``dictlookup*``, ``prepare_calls.py:147-156`` — the author's
own TODO flags the memory problem) and real SQL equi-joins in the
Postgres stage.  Here every lookup is a declarative join; Catalyst picks
broadcast-hash vs shuffled sort-merge, and AQE re-picks at runtime from
observed sizes.

100 TB posture: ``lookup_join`` broadcasts only when the build side is
declared bounded (dimension-table semantics — the petl lookups were
per-council need tables, inherently small).  Unbounded sides go through
sort-merge with AQE skew splitting.  Never collect-and-probe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def lookup_join(
    probe: DataFrame,
    build: DataFrame,
    on: str | list[str],
    how: str = "left",
    build_is_bounded: bool = True,
) -> DataFrame:
    """The petl ``dictlookup`` probe as a real join (J3).

    ``build_is_bounded=True`` adds a broadcast hint — the direct analogue
    of petl pinning the lookup in memory, but shipped to executors instead
    of living on the driver.  Set False for unbounded build sides (plain
    shuffle join; AQE may still promote to broadcast if it observes a
    small side).
    """
    b = F.broadcast(build) if build_is_bounded else build
    return probe.join(b, on, how)
