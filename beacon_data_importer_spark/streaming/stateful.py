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
    StringType,
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


def streaming_first_seen_tws(events: DataFrame) -> DataFrame:
    """``streaming_first_seen`` on the Spark 4 ``transformWithStateInPandas``
    API (SPARK-49564 "State V2"): schema-declared named state slots on a
    StatefulProcessor object instead of one opaque state tuple.  Same
    semantics as the applyInPandasWithState form (the test asserts both
    match batch first-wins); V2 is where timers/TTL and future state
    features land, so new stateful operators should start here.

    Environment gate: the V2 state-server protocol is protobuf-based
    (``transform_with_state_driver_worker`` imports
    ``google.protobuf.descriptor``), and V2 requires the RocksDB state
    store provider.  Callers must have protobuf installed and set
    ``spark.sql.streaming.stateStore.providerClass`` to
    ``RocksDBStateStoreProvider``; without protobuf this raises
    immediately instead of crashing the streaming query mid-run.
    """
    import importlib.util

    try:
        _pb = importlib.util.find_spec("google.protobuf")
    except ModuleNotFoundError:  # no parent 'google' package at all
        _pb = None
    if _pb is None:
        raise ModuleNotFoundError(
            "transformWithStateInPandas needs the protobuf package for "
            "its state-server protocol; this environment lacks it — use "
            "streaming_first_seen (applyInPandasWithState) instead"
        )
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class FirstSeenProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._seen = handle.getValueState("seen", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timer_values):
            import pandas as pd

            best = None
            for pdf in rows:
                if pdf.empty:
                    continue
                pdf = pdf.sort_values(["ts", "event_id"]).head(1)
                row = (pdf["ts"].iloc[0], int(pdf["event_id"].iloc[0]))
                if best is None or row < best:
                    best = row
            if self._seen.exists() or best is None:
                return
            self._seen.update((1,))
            yield pd.DataFrame(
                [(key[0], best[0], best[1])],
                columns=["user_id", "first_ts", "first_event_id"],
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        FirstSeenProcessor(),
        FIRST_SEEN_SCHEMA,
        "update",
        "none",
    )


def streaming_dedup_exact(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    delay: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup — the streaming twin of
    ``operators.dedup.exact_dedup`` for the ingest side of
    ``incremental_dedup`` (catalog_r3b): drop rows whose key
    (e.g. a content fingerprint) was already seen.

    Spark-native: ``dropDuplicatesWithinWatermark`` keeps each key in
    state only until the watermark passes it, so state is bounded by
    the delay window × arrival rate instead of growing with the corpus
    — the standard tradeoff for infinite streams (an exact forever-
    dedup needs the batch anti-join against the corpus key table,
    which is what incremental_dedup does per ingest batch; this
    operator handles the within-window duplicate storm a crawler
    produces).  First arrival wins within a microbatch."""
    return stream.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
        key_cols
    )


NEAR_DUP_SCHEMA = StructType(
    [
        StructField("band", LongType(), False),
        StructField("bucket", StringType(), False),
        StructField("doc_id", LongType(), False),
        StructField("first_id", LongType(), False),
    ]
)

BUCKET_STATE_SCHEMA = StructType([StructField("min_id", LongType(), True)])


def streaming_near_dup_flags(
    docs: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    rows_per_band: int = 4,
) -> DataFrame:
    """Streaming NEAR-dup detection: MinHash signatures and LSH band
    keys compute scan-side on the stream (both are narrow expressions,
    so they run unchanged under Structured Streaming), then per-
    (band, bucket) state remembers the first doc_id to claim the
    bucket — every later doc colliding with it is emitted as a
    near-dup flag ``(band, bucket, doc_id, first_id)``.

    This is the streaming half of ``incremental_dedup``: the batch
    side anti-joins a staged corpus band table; this operator catches
    the within-stream duplicate storm with state bounded by the number
    of DISTINCT buckets (one long per bucket), not by documents seen.
    A doc colliding in several bands yields several flag rows —
    consumers ``.select("doc_id").distinct()`` (exactly how the batch
    ``lsh_candidate_pairs`` consumers dedup across bands).
    """
    from ..operators.dedup import lsh_bands, minhash_signatures

    sigs = minhash_signatures(docs, "text", "doc_id", num_hashes)
    banded = lsh_bands(sigs, bands, rows_per_band)

    def fn(
        key: tuple, pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        ids: list[int] = []
        for pdf in pdfs:
            ids.extend(int(x) for x in pdf["id"])
        if not ids:
            return
        prev = state.get[0] if state.exists else None
        first = min(ids) if prev is None else min(prev, min(ids))
        state.update((first,))
        dups = sorted(i for i in ids if i != first)
        if dups:
            yield pd.DataFrame(
                [(key[0], key[1], d, first) for d in dups],
                columns=["band", "bucket", "doc_id", "first_id"],
            )

    return banded.groupBy("band", "bucket").applyInPandasWithState(
        fn,
        NEAR_DUP_SCHEMA,
        BUCKET_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Timer-based session features (EventTimeTimeout)
# ---------------------------------------------------------------------------

SESSION_GAP_SECONDS = 1800  # same 30-min gap as catalog events_sessionize

SESSION_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("session_start", TimestampType(), True),
        StructField("session_end", TimestampType(), True),
        StructField("n_events", LongType(), True),
        StructField("value_cents", LongType(), True),
        StructField("closed_by", StringType(), True),
    ]
)

SESSION_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType(), True),
        StructField("last_us", LongType(), True),
        StructField("n", LongType(), True),
        StructField("cents", LongType(), True),
    ]
)


def streaming_session_features(
    events: DataFrame,
    gap_seconds: int = SESSION_GAP_SECONDS,
    watermark_delay: str = "30 minutes",
) -> DataFrame:
    """SESSION FEATURIZER WITH EVENT-TIME TIMERS: per-user 30-min-gap
    sessions that close through TWO paths — a later event past the gap
    (``closed_by='gap'``), or the event-time TIMER firing when the
    watermark passes ``last_event + gap`` with no further activity
    (``closed_by='timer'``).  The timer path is what a pure
    window/sessionize pipeline cannot express: the session for a user
    who simply STOPS is emitted as soon as the stream's clock proves it
    over, not at job end.  Emits (user_id, session_start, session_end,
    n_events, value_cents, closed_by) per closed session.

    State per key is one open-session record (4 longs); at 100 TB of
    keys the RocksDB state store holds one such record per ACTIVE user,
    and the watermark both bounds state (expired keys are removed when
    their timer fires) and drops late events.  Intra-batch gap
    splitting walks each Arrow batch sorted by (ts, event_id), so the
    operator is exactly the batch lag/running-sum sessionizer
    (catalog_ext.q_events_sessionize) under bounded disorder — the
    equivalence the streaming test asserts.

    Timer mechanics: ``hasTimedOut`` batches close the held session and
    clear state; data batches first fold the held session into the
    walk, then re-arm ``setTimeoutTimestamp(last + gap)`` for whatever
    session stays open.  A held session already expired versus the
    CURRENT watermark (its user went quiet while other keys kept the
    stream moving) is closed inline, because arming a timer at-or-before
    the watermark is rejected by the engine.
    """
    gap_ms = gap_seconds * 1000

    def fn(
        key: tuple, pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        uid = key[0]
        cols = list(SESSION_OUT_SCHEMA.fieldNames())

        def _emit(rows: list) -> "pd.DataFrame":
            out = pd.DataFrame(rows, columns=cols)
            out["session_start"] = pd.to_datetime(out["session_start"], unit="us")
            out["session_end"] = pd.to_datetime(out["session_end"], unit="us")
            return out

        if state.hasTimedOut:
            start_us, last_us, n, cents_v = state.get
            state.remove()
            yield _emit([(uid, start_us, last_us, n, cents_v, "timer")])
            return

        frames = [pdf for pdf in pdfs if not pdf.empty]
        if not frames:
            return
        rows = pd.concat(frames).sort_values(["ts", "event_id"])
        ts_us = (rows["ts"].astype("int64") // 1_000).tolist()
        val_cents = [int(round(v * 100)) for v in rows["value"].tolist()]

        open_sess = list(state.get) if state.exists else None
        wm_ms = state.getCurrentWatermarkMs()
        closed: list = []
        if open_sess is not None and open_sess[1] // 1000 + gap_ms <= wm_ms:
            # expired while other keys advanced the watermark; the
            # engine forbids re-arming a timer at/behind the watermark
            closed.append(
                (uid, open_sess[0], open_sess[1], open_sess[2],
                 open_sess[3], "timer")
            )
            open_sess = None
        gap_us = gap_ms * 1000
        for t_us, v_c in zip(ts_us, val_cents):
            if open_sess is None:
                open_sess = [t_us, t_us, 1, v_c]
            elif t_us - open_sess[1] > gap_us:
                closed.append(
                    (uid, open_sess[0], open_sess[1], open_sess[2],
                     open_sess[3], "gap")
                )
                open_sess = [t_us, t_us, 1, v_c]
            else:
                open_sess[1] = t_us
                open_sess[2] += 1
                open_sess[3] += v_c
        state.update(tuple(open_sess))
        state.setTimeoutTimestamp(open_sess[1] // 1000 + gap_ms)
        if closed:
            yield _emit(closed)

    return (
        events.withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            SESSION_OUT_SCHEMA,
            SESSION_STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
