"""Custom stateful streaming operators via ``applyInPandasWithState`` —
the engine's arbitrary-state escape hatch (the streaming analogue of the
mapInPandas policy: Arrow batches, schema-declared state, no driver
involvement).

``streaming_first_seen`` is streaming first-wins dedup: the first event
per key (by event-time, then id) is emitted once; every later arrival is
suppressed by a per-key state flag.  State is partitioned by key across
executors; at 100 TB of keys the state store (RocksDB in production
configs) holds one tiny record per key.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

FIRST_SEEN_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("first_ts", TimestampType(), True),
        StructField("first_event_id", LongType(), True),
    ]
)

STATE_SCHEMA = StructType([StructField("seen", LongType(), True)])


def streaming_first_seen(events: DataFrame) -> DataFrame:
    """First event per user_id (ordered by ts, then event_id within each
    micro-batch); later micro-batches are suppressed via state."""

    def fn(
        key: tuple, pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        best = None
        for pdf in pdfs:
            if pdf.empty:
                continue
            pdf = pdf.sort_values(["ts", "event_id"]).head(1)
            row = (pdf["ts"].iloc[0], int(pdf["event_id"].iloc[0]))
            if best is None or row < best:
                best = row
        if state.exists or best is None:
            return
        state.update((1,))
        yield pd.DataFrame(
            [(key[0], best[0], best[1])],
            columns=["user_id", "first_ts", "first_event_id"],
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        FIRST_SEEN_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
