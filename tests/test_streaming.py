"""Streaming ↔ batch parity: the watermarked streaming aggregation over
the events file-source must equal the batch groupBy at AvailableNow
completion."""

from __future__ import annotations

from pyspark.sql import functions as F

from beacon_data_importer_spark.sources.parquet import read_table
from beacon_data_importer_spark.streaming import events as SE


def test_streaming_windowed_counts_match_batch(spark, sf_dir):
    stream = SE.stream_events(spark, sf_dir)
    SE.run_available_now(SE.windowed_counts(stream), "stream_counts")
    got = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value_cents)
        for r in spark.table("stream_counts").collect()
    }

    batch = read_table(spark, sf_dir, "events")
    want = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value_cents)
        for r in batch.groupBy(
            F.date_trunc("hour", "ts").alias("window_start"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias(
                "sum_value_cents"
            ),
        )
        .collect()
    }
    assert got == want
    assert len(got) > 0


def test_streaming_session_windows_complete(spark, sf_dir):
    stream = SE.stream_events(spark, sf_dir)
    SE.run_available_now(SE.session_windows(stream), "stream_sessions")
    rows = spark.table("stream_sessions").collect()
    assert len(rows) > 0
    # sessions are per-user, end >= start, n_events >= 1
    assert all(r.session_end >= r.session_start and r.n_events >= 1 for r in rows)
