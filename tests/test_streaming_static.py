"""Stream-static join + AvailableNow trigger.

The two streaming modes not covered elsewhere: (1) enriching a stream
with a STATIC dimension — Spark re-plans the static side per
micro-batch (no state, no watermark needed; the 100 TB/day pattern for
attaching slowly-changing dims to an event firehose); (2)
``Trigger.AvailableNow`` — run the streaming query as an incremental
batch that drains all available input and stops, checkpoint-compatible
with the continuous run (the production "streaming as a cron job"
mode)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mknssh_11_bigdata_spark.sources.readers import load_table
from mknssh_11_bigdata_spark.streaming.sinks import IdempotentParquetSink
from mknssh_11_bigdata_spark.streaming.windows import (
    stream_from_parquet_events,
)

from conftest import SF_SMOKE


def _user_tier(spark):
    """Static dim: user_id → tier (derived deterministically)."""
    return (
        load_table(spark, SF_SMOKE, "events")
        .select("user_id")
        .distinct()
        .select(
            "user_id",
            F.when(F.col("user_id") % 3 == 0, "gold")
            .when(F.col("user_id") % 3 == 1, "silver")
            .otherwise("bronze")
            .alias("tier"),
        )
    )


def test_stream_static_join_matches_batch(spark):
    dim = _user_tier(spark)
    stream = stream_from_parquet_events(spark, SF_SMOKE)
    enriched = stream.join(dim, "user_id").groupBy("tier").count()
    q = (
        enriched.writeStream.format("memory")
        .queryName("tiered")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.tier, r["count"])
            for r in spark.sql("SELECT * FROM tiered").collect()
        }
    finally:
        q.stop()
    batch = (
        load_table(spark, SF_SMOKE, "events")
        .join(dim, "user_id")
        .groupBy("tier")
        .count()
    )
    expected = {(r.tier, r["count"]) for r in batch.collect()}
    assert got == expected
    assert len(got) == 3  # all tiers present


def test_available_now_trigger_drains_and_stops(spark, tmp_path):
    sink = IdempotentParquetSink(str(tmp_path / "out"))
    stream = stream_from_parquet_events(spark, SF_SMOKE).select(
        "event_id", "user_id"
    )
    q = (
        stream.writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)  # AvailableNow self-terminates when drained
    assert not q.isActive
    expected = load_table(spark, SF_SMOKE, "events").count()
    assert sink.read(spark).count() == expected
    # restart with the same checkpoint: no new input -> no new batches
    before = sink.committed_batches()
    q2 = (
        stream.writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q2.awaitTermination(120)
    assert sink.read(spark).count() == expected
    assert sink.committed_batches() == before
