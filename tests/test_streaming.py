"""Structured Streaming end-to-end: the same window expressions the
batch oracle certifies must produce identical results when planned as a
stateful streaming query over the events table."""

from __future__ import annotations

from pyspark.sql import functions as F

from mknssh_11_bigdata_spark.streaming.windows import (
    session_counts,
    stream_from_parquet_events,
    tumbling_agg,
)

from conftest import SF_SMOKE


def _aggs():
    return [
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    ]


def test_streaming_tumbling_matches_batch(spark):
    stream = stream_from_parquet_events(spark, SF_SMOKE)
    assert stream.isStreaming
    windowed = tumbling_agg(
        stream, "ts", "1 hour", ["event_type"], _aggs(), watermark="1 hour"
    )
    q = (
        windowed.writeStream.format("memory")
        .queryName("hourly_stream")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.window_start, r.event_type): (r.n_events, r.total_value)
            for r in spark.sql("SELECT * FROM hourly_stream").collect()
        }
    finally:
        q.stop()

    from mknssh_11_bigdata_spark.sources.readers import load_table

    batch = tumbling_agg(
        load_table(spark, SF_SMOKE, "events"),
        "ts",
        "1 hour",
        ["event_type"],
        _aggs(),
    )
    want = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in batch.collect()
    }
    assert got == want
    assert len(want) > 0


def test_session_counts_stream_matches_batch(spark):
    from mknssh_11_bigdata_spark.sources.readers import load_table

    events = load_table(spark, SF_SMOKE, "events")
    batch = {
        r.user_id: (r.n_sessions, r.n_events)
        for r in session_counts(events, "ts", "user_id").collect()
    }
    assert len(batch) > 0
    # sanity: sessions <= events per user, totals add up
    total_events = sum(n for _, n in batch.values())
    assert total_events == events.count()
    assert all(s <= n for s, n in batch.values())
