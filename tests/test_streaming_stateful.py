"""Custom stateful op (applyInPandasWithState): the streaming session
tracker must agree with (a) the batch fold of the same operator and
(b) Spark's built-in session_window on closed sessions."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from mknssh_11_bigdata_spark.streaming.stateful import sessionize_with_state
from mknssh_11_bigdata_spark.streaming.windows import (
    stream_from_parquet_events,
)

from conftest import SF_SMOKE

GAP_S = 300


def _batch_events(spark):
    from mknssh_11_bigdata_spark.sources.readers import load_table

    return load_table(spark, SF_SMOKE, "events")


def test_batch_sessionize_matches_builtin_session_window(spark):
    ev = _batch_events(spark)
    ours = sessionize_with_state(ev, gap_seconds=GAP_S).collect()
    builtin = (
        ev.groupBy(
            F.session_window(F.col("ts"), f"{GAP_S} seconds").alias("sess"),
            "user_id",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .collect()
    )
    ours_set = {
        (r.user_id, r.session_start, r.n_events, round(r.total_value, 6))
        for r in ours
    }
    builtin_set = {
        (r.user_id, r.sess.start, r.n_events, round(r.total_value, 6))
        for r in builtin
    }
    assert ours_set == builtin_set


def test_batch_session_boundaries_half_open(spark):
    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base, 1.0),
        (1, base + dt.timedelta(seconds=GAP_S - 1), 2.0),  # same session
        (1, base + dt.timedelta(seconds=2 * GAP_S - 2), 4.0),  # chained
        (1, base + dt.timedelta(seconds=3 * GAP_S), 8.0),  # exactly gap => new
        (2, base, 16.0),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    out = sessionize_with_state(ev, gap_seconds=GAP_S).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r.user_id, []).append(r)
    assert len(by_user[1]) == 2
    first, second = sorted(by_user[1], key=lambda r: r.session_start)
    assert first.n_events == 3 and first.total_value == 7.0
    assert second.n_events == 1 and second.total_value == 8.0
    assert len(by_user[2]) == 1


def test_streaming_stateful_sessions_subset_and_exact(spark):
    """Stream the smoke events; every emitted (closed) session must be
    byte-identical to a batch-computed session for that user."""
    stream = stream_from_parquet_events(spark, SF_SMOKE)
    q = (
        sessionize_with_state(stream, gap_seconds=GAP_S)
        .writeStream.format("memory")
        .queryName("stateful_sessions")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT * FROM stateful_sessions").collect()
    finally:
        q.stop()
    batch = sessionize_with_state(
        _batch_events(spark), gap_seconds=GAP_S
    ).collect()
    batch_set = {
        (r.user_id, r.session_start, r.session_end, r.n_events,
         round(r.total_value, 6))
        for r in batch
    }
    got_set = {
        (r.user_id, r.session_start, r.session_end, r.n_events,
         round(r.total_value, 6))
        for r in got
    }
    # The single-file source arrives as one micro-batch; only sessions the
    # watermark could close are emitted. Everything emitted must be exact.
    assert got_set <= batch_set
    # mid-stream session closures (gap exceeded within the data) do emit
    assert len(got_set) > 0
