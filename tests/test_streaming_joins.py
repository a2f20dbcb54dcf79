"""Stream-stream interval join: the streaming result must equal the
batch range-join of the same expressions (state bounded by watermarks)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mknssh_11_bigdata_spark.sources.readers import load_table
from mknssh_11_bigdata_spark.streaming.joins import interval_join
from mknssh_11_bigdata_spark.streaming.windows import (
    stream_from_parquet_events,
)

from conftest import SF_SMOKE

LOOKBACK = "30 minutes"


def _sides(df):
    purchases = df.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("p_ts"),
        F.col("value").alias("p_value"),
    )
    clicks = df.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("c_ts"),
    )
    return purchases, clicks


def _key_set(rows):
    return {(r.user_id, r.p_ts, r.c_ts) for r in rows}


def test_interval_join_batch_semantics(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    purchases, clicks = _sides(ev)
    got = interval_join(
        purchases, clicks, ["user_id"], "p_ts", "c_ts", LOOKBACK
    )
    expected = spark.sql(
        """
        SELECT p.user_id, p.p_ts, p.p_value, c.c_ts
        FROM {p} p JOIN {c} c
          ON p.user_id = c.user_id
         AND c.c_ts BETWEEN p.p_ts - INTERVAL 30 MINUTES AND p.p_ts
        """,
        p=purchases,
        c=clicks,
    )
    assert _key_set(got.collect()) == _key_set(expected.collect())
    assert got.count() > 0


def test_interval_join_stream_matches_batch(spark):
    ev_stream = stream_from_parquet_events(spark, SF_SMOKE)
    p_s, c_s = _sides(ev_stream)
    q = (
        interval_join(
            p_s, c_s, ["user_id"], "p_ts", "c_ts", LOOKBACK,
            watermark="1 hour",
        )
        .writeStream.format("memory")
        .queryName("interval_join_stream")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        streamed = spark.sql(
            "SELECT * FROM interval_join_stream"
        ).collect()
    finally:
        q.stop()
    ev = load_table(spark, SF_SMOKE, "events")
    p_b, c_b = _sides(ev)
    batch = interval_join(
        p_b, c_b, ["user_id"], "p_ts", "c_ts", LOOKBACK
    ).collect()
    # single-file source => one micro-batch => nothing is dropped as
    # late; the streaming inner join must equal the batch range join.
    assert _key_set(streamed) == _key_set(batch)
