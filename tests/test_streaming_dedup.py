"""Streaming ingest dedup (dropDuplicatesWithinWatermark): the stream's
surviving key set must equal the batch twin's; the batch twin is
DuckDB-oracle-checked via the event_stream_dedup query."""

from __future__ import annotations

from mknssh_11_bigdata_spark.sources.readers import load_table
from mknssh_11_bigdata_spark.streaming.dedup import dedup_stream
from mknssh_11_bigdata_spark.streaming.windows import (
    stream_from_parquet_events,
)

from conftest import SF_SMOKE

KEYS = ["user_id", "event_type"]


def test_stream_dedup_key_set_matches_batch(spark):
    stream = stream_from_parquet_events(spark, SF_SMOKE)
    q = (
        dedup_stream(stream, KEYS, "ts")
        .writeStream.format("memory")
        .queryName("stream_dedup")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT * FROM stream_dedup").collect()
    finally:
        q.stop()
    batch = dedup_stream(load_table(spark, SF_SMOKE, "events"), KEYS, "ts")
    batch_keys = {(r.user_id, r.event_type) for r in batch.collect()}
    got_keys = {(r.user_id, r.event_type) for r in got}
    assert got_keys == batch_keys          # same survivors by key
    assert len(got) == len(got_keys)       # exactly one row per key
