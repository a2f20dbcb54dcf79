"""Exactly-once foreachBatch sink: a streamed write must land every
input row exactly once, and a REPLAYED micro-batch (the at-least-once
delivery case after recovery) must not duplicate rows — whether the
first attempt committed or crashed mid-write."""

from __future__ import annotations

from pyspark.sql import functions as F

from mknssh_11_bigdata_spark.sources.readers import load_table
from mknssh_11_bigdata_spark.streaming.sinks import IdempotentParquetSink
from mknssh_11_bigdata_spark.streaming.windows import (
    stream_from_parquet_events,
)

from conftest import SF_SMOKE


def test_streamed_write_lands_exactly_once(spark, tmp_path):
    sink = IdempotentParquetSink(str(tmp_path / "out"))
    stream = stream_from_parquet_events(spark, SF_SMOKE).select(
        "event_id", "user_id", "value"
    )
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sink.read(spark)
    expected = load_table(spark, SF_SMOKE, "events").count()
    assert got.count() == expected
    assert got.select("event_id").distinct().count() == expected


def test_replayed_batch_does_not_duplicate(spark, tmp_path):
    sink = IdempotentParquetSink(str(tmp_path / "out"))
    batch = spark.range(100).select(
        F.col("id").alias("event_id"), (F.col("id") % 7).alias("v")
    )
    sink(batch, 0)
    sink(batch, 0)  # redelivery of a committed batch -> dropped
    sink(batch, 1)
    assert sink.read(spark).count() == 200
    assert sink.committed_batches() == {0, 1}


def test_crashed_partial_write_is_overwritten(spark, tmp_path):
    """First attempt wrote data but died BEFORE the commit marker; the
    replay must overwrite the partial output, not append to it."""
    sink = IdempotentParquetSink(str(tmp_path / "out"))
    batch = spark.range(50).select(F.col("id").alias("event_id"))
    # simulate the crash: data write succeeds, marker never written
    batch.write.mode("overwrite").parquet(f"{sink.root}/batch_id=0")
    assert sink.committed_batches() == set()
    sink(batch, 0)  # replay commits properly
    assert sink.read(spark).count() == 50
    assert sink.committed_batches() == {0}


def test_latest_snapshot_sink_matches_batch_compaction(spark, tmp_path):
    """Streamed upsert over micro-batches must converge to the same
    snapshot the batch latest-record-per-key query computes."""
    from mknssh_11_bigdata_spark.queries import QUERIES
    from mknssh_11_bigdata_spark.streaming.sinks import LatestSnapshotSink

    sink = LatestSnapshotSink(
        str(tmp_path / "snap"),
        key_cols=["user_id"],
        order_cols=["ts", "event_id"],
    )
    stream = stream_from_parquet_events(spark, SF_SMOKE).select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r.user_id, r.event_id)
        for r in sink.read(spark).collect()
    }
    want = {
        (r.user_id, r.last_event_id)
        for r in QUERIES["events_latest_per_user"]
        .spark(spark, SF_SMOKE)
        .collect()
    }
    assert got == want


def test_latest_snapshot_sink_replay_and_versioning(spark, tmp_path):
    from pyspark.sql import functions as F

    from mknssh_11_bigdata_spark.streaming.sinks import LatestSnapshotSink

    sink = LatestSnapshotSink(
        str(tmp_path / "snap"), key_cols=["k"], order_cols=["seq"]
    )
    b0 = spark.createDataFrame([(1, 10, "a"), (2, 11, "b")], ["k", "seq", "v"])
    b1 = spark.createDataFrame([(1, 20, "c"), (3, 12, "d")], ["k", "seq", "v"])
    sink(b0, 0)
    sink(b1, 1)
    sink(b1, 1)  # replay of a committed batch — must be a no-op
    snap = {(r.k, r.seq, r.v) for r in sink.read(spark).collect()}
    assert snap == {(1, 20, "c"), (2, 11, "b"), (3, 12, "d")}
    # crashed half-write of batch 2: version dir exists, marker absent
    b2 = spark.createDataFrame([(2, 30, "e")], ["k", "seq", "v"])
    b2.write.mode("overwrite").parquet(f"{sink.root}/v=2")
    assert sink.committed_batches() == {0, 1}
    sink(b2, 2)  # replay merges against the last COMMITTED version
    snap = {(r.k, r.seq, r.v) for r in sink.read(spark).collect()}
    assert snap == {(1, 20, "c"), (2, 30, "e"), (3, 12, "d")}
    # old versions pruned beyond keep_versions=2
    assert sink.committed_batches() == {1, 2}


def test_seasonal_baseline_sink_matches_batch_query(spark, tmp_path):
    """VERDICT r3 #8: the streamed daily-spine rollup (watermarked
    tumbling-day agg, update mode) must converge to the batch
    ``events_seasonal_baseline`` answer exactly — same columns, same
    weekday key, same rounding — once every event is absorbed. The
    watermark here is generous enough that nothing drops; the
    completeness trade of a tight delay is ``watermark_drop_audit``'s
    subject, not this test's."""
    from mknssh_11_bigdata_spark.queries import QUERIES
    from mknssh_11_bigdata_spark.streaming.sinks import (
        SeasonalBaselineSink,
    )
    from mknssh_11_bigdata_spark.streaming.windows import tumbling_agg

    sink = SeasonalBaselineSink(str(tmp_path / "spine"))
    assert sink.baseline(spark) is None  # pre-commit: explicit None
    stream = stream_from_parquet_events(spark, SF_SMOKE)
    daily = tumbling_agg(
        stream,
        "ts",
        "1 day",
        keys=[],
        aggs=[F.count(F.lit(1)).cast("long").alias("n_events")],
        watermark="3650 days",
    ).select(F.to_date("window_start").alias("d"), "n_events")
    q = (
        daily.writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = sink.baseline(spark)
    want = QUERIES["events_seasonal_baseline"].spark(spark, SF_SMOKE)
    assert got.columns == want.columns
    assert {tuple(r) for r in got.collect()} == {
        tuple(r) for r in want.collect()
    }

    # replaying a committed batch id must not change the spine
    before = {tuple(r) for r in sink.spine(spark).collect()}
    import pyspark.sql.functions as SF

    fake = spark.createDataFrame(
        [("1990-01-01", 999)], ["d", "n_events"]
    ).select(SF.to_date("d").alias("d"), SF.col("n_events").cast("long"))
    sink(fake, max(sink.committed_batches()))
    assert {tuple(r) for r in sink.spine(spark).collect()} == before


def test_source_quality_drift_sink_matches_batch_query(spark, tmp_path):
    """The incrementally-maintained (source, shard) sufficient
    statistics must converge to the batch drift monitor bit-for-bit —
    the quality score is quarter-points, so streamed double sums are
    EXACT in any batch split — and replayed batch ids must not
    double-count."""
    from mknssh_11_bigdata_spark.queries import QUERIES
    from mknssh_11_bigdata_spark.streaming.sinks import (
        SourceQualityDriftSink,
    )

    sink = SourceQualityDriftSink(str(tmp_path / "drift"))
    assert sink.drift(spark) is None  # pre-commit: explicit None
    stream = stream_from_parquet_events(
        spark, SF_SMOKE, table="documents"
    ).select("doc_id", "source", "text")
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = sink.drift(spark)
    want = QUERIES["doc_source_quality_drift"].spark(spark, SF_SMOKE)
    assert got.columns == want.columns
    assert {tuple(r) for r in got.collect()} == {
        tuple(r) for r in want.collect()
    }

    # replay of a committed id: stats unchanged (no double counting)
    before = {tuple(r) for r in sink.stats(spark).collect()}
    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "source", "text"
    )
    sink(docs, max(sink.committed_batches()))
    assert {tuple(r) for r in sink.stats(spark).collect()} == before

    # additive MERGE path: a genuinely new batch of extra docs must
    # fold into the statistics exactly as a batch recompute over the
    # doubled corpus (ids shifted to land in every shard)
    extra = docs.select(
        (F.col("doc_id") + 1_000_001).alias("doc_id"), "source", "text"
    )
    sink(extra, max(sink.committed_batches()) + 1)
    got2 = {tuple(r) for r in sink.stats(spark).collect()}
    from mknssh_11_bigdata_spark.functions.text import quality_score

    want2 = {
        tuple(r)
        for r in docs.unionByName(extra)
        .select(
            "source",
            (F.col("doc_id") % 5).alias("shard"),
            quality_score(F.col("text")).alias("q"),
        )
        .groupBy("source", "shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("q").alias("sq"),
        )
        .collect()
    }
    assert got2 == want2


def test_drift_sink_pruned_batch_replay_still_drops(spark, tmp_path):
    """ADVICE r4: this sink's merge is ADDITIVE, so the exactly-once
    drop must survive version pruning — the old _prune unlinked the
    pruned versions' commit markers, letting a replayed pruned batch
    id re-merge and double-count (n, sq). Markers must outlive their
    v= directories."""
    from mknssh_11_bigdata_spark.streaming.sinks import (
        SourceQualityDriftSink,
    )

    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "source", "text"
    )
    batches = [
        docs.filter(f"doc_id % 4 = {i}") for i in range(4)
    ]
    sink = SourceQualityDriftSink(str(tmp_path / "drift"), keep_versions=1)
    for i, b in enumerate(batches):
        sink(b, i)
    # pruning actually happened (only the newest version dir remains)…
    import pathlib as _pl

    vdirs = sorted(
        p.name for p in _pl.Path(sink.root).iterdir() if p.name.startswith("v=")
    )
    assert vdirs == [f"v={len(batches) - 1}"]
    # …but every batch id is STILL marked committed
    assert sink.committed_batches() == set(range(len(batches)))

    # replaying a PRUNED batch id must be a no-op, not a re-merge
    before = {tuple(r) for r in sink.stats(spark).collect()}
    sink(batches[0], 0)
    assert {tuple(r) for r in sink.stats(spark).collect()} == before


def test_zipf_source_drift_sink_matches_batch_query(spark, tmp_path):
    """The incrementally-maintained (source, token) counts must derive
    the batch Zipf-drift monitor bit-for-bit — counts are exact
    integers, so the streamed additive merge equals the one-pass batch
    counts under any split, and the fit view is the SAME shared plan —
    with replayed ids dropped and pruned-id replays still dropped
    (additive merge, markers survive pruning)."""
    from mknssh_11_bigdata_spark.queries import QUERIES
    from mknssh_11_bigdata_spark.streaming.sinks import ZipfSourceDriftSink

    sink = ZipfSourceDriftSink(str(tmp_path / "zipf"), keep_versions=1)
    assert sink.drift(spark) is None  # pre-commit: explicit None
    stream = stream_from_parquet_events(
        spark, SF_SMOKE, table="documents"
    ).select("doc_id", "source", "text")
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = sink.drift(spark)
    want = QUERIES["corpus_zipf_source_drift"].spark(spark, SF_SMOKE)
    assert got.columns == want.columns
    assert {tuple(r) for r in got.collect()} == {
        tuple(r) for r in want.collect()
    }

    # replay of a committed (possibly pruned) id: counts unchanged
    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "source", "text"
    )
    before = {tuple(r) for r in sink.counts(spark).collect()}
    for replay_id in sink.committed_batches():
        sink(docs, replay_id)
    assert {tuple(r) for r in sink.counts(spark).collect()} == before


def test_hourly_anomaly_sink_matches_batch_query(spark, tmp_path):
    """The incrementally-maintained hourly spine must derive the batch
    trailing-baseline anomaly monitor bit-for-bit (integer counts →
    additive merge exact under any batch split; the scored view is the
    SAME shared plan), with replayed and pruned-replayed batch ids
    dropped."""
    from mknssh_11_bigdata_spark.queries import QUERIES
    from mknssh_11_bigdata_spark.streaming.sinks import HourlyAnomalySink

    sink = HourlyAnomalySink(str(tmp_path / "anom"), keep_versions=1)
    assert sink.anomalies(spark) is None  # pre-commit: explicit None
    stream = stream_from_parquet_events(spark, SF_SMOKE).select(
        "event_type", "ts"
    )
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = sink.anomalies(spark)
    want = QUERIES["event_hourly_anomaly"].spark(spark, SF_SMOKE)
    assert got.columns == want.columns
    assert {tuple(r) for r in got.collect()} == {
        tuple(r) for r in want.collect()
    }

    # replays (including of pruned versions) must not double-count
    events = load_table(spark, SF_SMOKE, "events").select("event_type", "ts")
    before = {tuple(r) for r in sink.counts(spark).collect()}
    for replay_id in sink.committed_batches():
        sink(events, replay_id)
    assert {tuple(r) for r in sink.counts(spark).collect()} == before


def test_zipf_drift_checkpoint_reused_across_calls(spark, tmp_path):
    """ADVICE r5: repeated ``drift()`` reads on a long-lived monitoring
    session must hold ONE cached snapshot per committed version —
    reused while the version is unchanged, the old one unpersisted on
    version change — never an accumulating block per call."""
    from mknssh_11_bigdata_spark.streaming.sinks import ZipfSourceDriftSink

    sink = ZipfSourceDriftSink(str(tmp_path / "zipf"))
    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "source", "text"
    )
    sink(docs, 0)
    d1 = sink.drift(spark)
    ckpt1 = sink._drift_ckpt
    d2 = sink.drift(spark)
    assert sink._drift_ckpt is ckpt1  # same version: one checkpoint
    assert {tuple(r) for r in d1.collect()} == {
        tuple(r) for r in d2.collect()
    }
    sink(docs.limit(50), 1)  # new committed version
    sink.drift(spark)
    assert sink._drift_ckpt is not ckpt1
    assert sink._drift_ckpt_version == 1
    # the superseded snapshot's cached blocks were released
    assert not ckpt1.storageLevel.useMemory


def test_heavy_hitters_monitor_sink_guarantee(spark, tmp_path):
    """Round 6: the Misra-Gries monitor must, after any number of
    micro-batches, (a) hold <= capacity rows, (b) retain EVERY token
    whose true stream count exceeds n/(capacity+1), (c) bound each
    estimate in [true - n/(capacity+1), true], and (d) drop replayed
    batch ids. capacity=8 over the 31-token vocabulary forces the
    truncation path every batch."""
    import pathlib

    from mknssh_11_bigdata_spark.functions import text as TX
    from mknssh_11_bigdata_spark.streaming.sinks import (
        HeavyHittersMonitorSink,
    )

    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "text"
    )
    cuts = [(0, 30), (30, 60), (60, 100)]
    feed = tmp_path / "feed"
    feed.mkdir()
    for i, (lo, hi) in enumerate(cuts):
        sl = docs.filter(f"doc_id >= {lo} AND doc_id < {hi}")
        sl.coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / f"stage{i}")
        )
        part = next(
            pathlib.Path(tmp_path / f"stage{i}").glob("part-*.parquet")
        )
        part.rename(feed / f"{i:04d}.parquet")

    capacity = 8
    sink = HeavyHittersMonitorSink(
        str(tmp_path / "hh"), capacity=capacity
    )
    assert sink.heavy_hitters(spark) is None
    q = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(feed))
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert sink.committed_batches() == {0, 1, 2}

    # exact replay over the full stream
    streamed = docs.filter("doc_id < 100")
    exact = {
        r["item"]: r["c"]
        for r in streamed.select(
            F.explode(TX.tokens(F.col("text"))).alias("item")
        )
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    n = sum(exact.values())
    got = {
        r["item"]: r["est"] for r in sink.summary(spark).collect()
    }
    n_total = sink.summary(spark).limit(1).collect()[0]["n_total"]
    assert n_total == n
    assert len(got) <= capacity
    assert len(exact) > capacity  # truncation actually fired
    budget = n / (capacity + 1)
    for item, true_c in exact.items():
        if true_c > budget:
            assert item in got, (item, true_c, budget)
    for item, est in got.items():
        assert est <= exact[item]
        assert exact[item] - est <= n // (capacity + 1) + 1

    # bound columns in the view
    hh = {r["item"]: r for r in sink.heavy_hitters(spark).collect()}
    for item, r in hh.items():
        assert r["max_undercount"] == n // (capacity + 1)
        assert r["guaranteed_heavy"] == (r["est"] > n // (capacity + 1))

    # replay drop: committed ids are no-ops
    before = dict(got)
    for replay_id in sink.committed_batches():
        sink(streamed, replay_id)
    after = {
        r["item"]: r["est"] for r in sink.summary(spark).collect()
    }
    assert after == before


def test_heavy_hitters_n_total_survives_empty_summary(spark, tmp_path):
    """ADVICE r6 (medium): a truncation that empties the summary (top
    capacity+1 counters all tied) must NOT reset the running n_total —
    it is persisted as a one-row sidecar independent of the summary
    rows. Before the fix, the next batch read prev_n = 0 from the
    zero-row snapshot and every later max_undercount/guaranteed_heavy
    was computed against an understated n."""
    from mknssh_11_bigdata_spark.streaming.sinks import (
        HeavyHittersMonitorSink,
    )

    sink = HeavyHittersMonitorSink(str(tmp_path / "hh"), capacity=2)
    # batch 0: 3 distinct tokens, one occurrence each -> merged summary
    # has 3 == capacity+1 rows all tied at est=1; truncation subtracts
    # 1 from everything and drops all rows -> EMPTY summary, n_total=3
    b0 = spark.createDataFrame(
        [("aa bb cc",)], "text string"
    ).withColumn("doc_id", F.lit(0))
    sink(b0, 0)
    assert sink.summary(spark).count() == 0
    assert sink.n_total(spark) == 3

    # batch 1: the heavy item arrives; n must ACCUMULATE to 3 + 9
    b1 = spark.createDataFrame(
        [("hh hh hh hh hh hh hh xx yy",)], "text string"
    ).withColumn("doc_id", F.lit(1))
    sink(b1, 1)
    assert sink.n_total(spark) == 12
    hh = {r["item"]: r for r in sink.heavy_hitters(spark).collect()}
    assert hh["hh"]["n_total"] == 12
    # bound computed against the TRUE total: 12 DIV 3 = 4
    assert hh["hh"]["max_undercount"] == 4
    # est(hh)=7 > 4 -> genuinely guaranteed under the honest n; with
    # the reset bug n was 9, understating the bound of later batches
    assert hh["hh"]["guaranteed_heavy"]


def test_kmv_monitor_sink_matches_batch_query(spark, tmp_path):
    """Round 7 (VERDICT r6 missing #3): the streaming KMV monitor's
    h_k/estimate must equal the batch ``event_kmv_distinct`` arm
    bit-for-bit after streaming the same rows in micro-batches, its
    per-key state must stay bounded at k+1 hashes, and replayed batch
    ids must drop."""
    import pathlib

    from mknssh_11_bigdata_spark.queries import QUERIES
    from mknssh_11_bigdata_spark.streaming.sinks import (
        KmvDistinctMonitorSink,
    )

    events = load_table(spark, SF_SMOKE, "events").select(
        "event_type", "user_id"
    )
    feed = tmp_path / "feed"
    feed.mkdir()
    for i in range(3):
        sl = events.filter(f"user_id % 3 = {i}")
        sl.coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / f"stage{i}")
        )
        part = next(
            pathlib.Path(tmp_path / f"stage{i}").glob("part-*.parquet")
        )
        part.rename(feed / f"{i:04d}.parquet")

    sink = KmvDistinctMonitorSink(str(tmp_path / "kmv"))
    assert sink.estimates(spark) is None
    q = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(feed))
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert sink.committed_batches() == {0, 1, 2}

    batch = {
        r["event_type"]: r
        for r in QUERIES["event_kmv_distinct"]
        .spark(spark, SF_SMOKE)
        .collect()
    }
    got = {
        r["event_type"]: r for r in sink.estimates(spark).collect()
    }
    assert set(got) == set(batch)
    for t, b in batch.items():
        # the estimate column is the contract: exact arm when <= k
        # distinct, (k-1)*2^60/h_k above — bit-for-bit vs batch
        assert got[t]["kmv_estimate"] == b["kmv_estimate"], t
        if b["n_exact_distinct"] <= sink.k:
            assert got[t]["n_state"] == b["n_exact_distinct"]
            assert got[t]["hk"] is None
    # state bounded at k+1 rows per key
    per_key = (
        sink.state(spark)
        .groupBy("event_type")
        .count()
        .collect()
    )
    assert all(r["count"] <= sink.k + 1 for r in per_key)

    # replay drop: re-delivering a committed id is a no-op
    before = {
        (r["event_type"], r["kmv_estimate"])
        for r in sink.estimates(spark).collect()
    }
    sink(events, 1)
    after = {
        (r["event_type"], r["kmv_estimate"])
        for r in sink.estimates(spark).collect()
    }
    assert after == before

    # round 8: the SAME persisted state serves the pair-overlap
    # algebra — streamed pair estimates must equal the batch
    # event_kmv_type_overlap sketch columns bit-for-bit
    ov_batch = {
        (r["type_a"], r["type_b"]): (
            r["kmv_union_estimate"],
            r["kmv_overlap_estimate"],
            r["jaccard_est"],
        )
        for r in QUERIES["event_kmv_type_overlap"]
        .spark(spark, SF_SMOKE)
        .collect()
    }
    ov_stream = {
        (r["key_a"], r["key_b"]): (
            r["u_est"],
            r["overlap_est"],
            r["jaccard_est"],
        )
        for r in sink.pair_overlaps(spark).collect()
    }
    assert ov_stream == ov_batch


def test_kmv_monitor_estimator_arm_and_batch_split_invariance(
    spark, tmp_path
):
    """Force the ESTIMATOR arm (distinct >> k) with synthetic keys and
    prove batch-split invariance: streaming the same rows as 1 batch
    or 4 batches yields identical state and estimates (bottom-k over
    distinct hashes is an associative, commutative set merge), and the
    estimate tracks the true cardinality within the ~1/sqrt(k-1) band."""
    from pyspark.sql import functions as F

    from mknssh_11_bigdata_spark.streaming.sinks import (
        KmvDistinctMonitorSink,
    )

    k = 16
    rows = spark.range(2000).select(
        F.lit("big").alias("event_type"), F.col("id").alias("user_id")
    ).unionByName(
        spark.range(5).select(
            F.lit("small").alias("event_type"),
            F.col("id").alias("user_id"),
        )
    ).localCheckpoint(eager=True)

    whole = KmvDistinctMonitorSink(str(tmp_path / "w"), k=k)
    whole(rows, 0)
    split = KmvDistinctMonitorSink(str(tmp_path / "s"), k=k)
    for i in range(4):
        split(rows.filter(f"user_id % 4 = {i}"), i)

    w = {
        tuple(r)
        for r in whole.estimates(spark)
        .select("event_type", "n_state", "hk", "kmv_estimate")
        .collect()
    }
    s = {
        tuple(r)
        for r in split.estimates(spark)
        .select("event_type", "n_state", "hk", "kmv_estimate")
        .collect()
    }
    assert w == s
    est = {r[0]: r[3] for r in w}
    assert est["small"] == 5  # exact arm: state IS the distinct set
    # estimator arm: within ~3/sqrt(k-1) of truth (generous CI)
    assert abs(est["big"] - 2000) / 2000 < 3 / (k - 1) ** 0.5
    hks = {r[0]: r[2] for r in w}
    assert hks["small"] is None and hks["big"] is not None


def test_novelty_monitor_one_sided_and_matches_exact_replay(
    spark, tmp_path
):
    """Round 7: the bounded-state novelty monitor (state = a Bloom
    bitmap of prior batches' grams) must (a) never OVER-report
    novelty — Bloom false positives can only mark unseen grams seen;
    (b) equal the exact batch-granular replay bit-for-bit while the
    bitmap is unsaturated (deterministic: the bitmap is a pure
    function of the data); (c) drop replayed batch ids."""
    from mknssh_11_bigdata_spark.streaming.sinks import (
        NoveltyMonitorSink,
    )

    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "text"
    )
    cuts = [(0, 40), (40, 80), (80, 140)]
    batches = [
        docs.filter(f"doc_id >= {lo} AND doc_id < {hi}").localCheckpoint(
            eager=True
        )
        for lo, hi in cuts
    ]
    sink = NoveltyMonitorSink(str(tmp_path / "nov"))
    assert sink.novelty(spark) is None
    for i, b in enumerate(batches):
        sink(b, i)
    assert sink.committed_batches() == {0, 1, 2}

    # exact batch-granular replay in plain python
    def grams_of(text):
        # mirrors TX.shingles_of exactly, INCLUDING the short-doc
        # branch: < n tokens emits ONE whole-text gram, not nothing
        # (review finding r8 — a fixture with a short doc would
        # silently drop it from the exact replay otherwise)
        t = [x for x in text.split(" ") if x]
        n = 3
        if len(t) < n:
            return {" ".join(t)}
        return {" ".join(t[i : i + n]) for i in range(len(t) - n + 1)}

    seen: set = set()
    exact = {}
    for b in batches:
        rows = b.collect()
        for r in rows:
            g = grams_of(r["text"])
            ns = sum(1 for x in g if x in seen)
            exact[r["doc_id"]] = (
                len(g),
                ns,
                (len(g) - ns) * 1_000_000 // len(g),
            )
        for r in rows:
            seen |= grams_of(r["text"])

    got = {
        r["doc_id"]: (r["n_grams"], r["n_seen_prior"], r["novelty_ppm"])
        for r in sink.novelty(spark).collect()
    }
    assert set(got) == set(exact)
    for d, (ng, ns, ppm) in exact.items():
        assert got[d][0] == ng
        # one-sided: streamed seen-count never undercounts
        assert got[d][1] >= ns
        assert got[d][2] <= ppm
    # unsaturated default geometry: exact equality (deterministic)
    assert got == exact

    # replay drop: re-delivering batch 0 is a no-op
    before = dict(got)
    sink(batches[0], 0)
    after = {
        r["doc_id"]: (r["n_grams"], r["n_seen_prior"], r["novelty_ppm"])
        for r in sink.novelty(spark).collect()
    }
    assert after == before

    # later batches with recycled text read as low-novelty: batch 0
    # docs re-fed as a NEW batch id report ~0 novelty
    recycled = batches[0].selectExpr("doc_id + 1000000 AS doc_id", "text")
    sink(recycled.localCheckpoint(eager=True), 3)
    rec = {
        r["doc_id"]: r["novelty_ppm"]
        for r in sink.novelty(spark).collect()
        if r["doc_id"] >= 1_000_000
    }
    assert rec and all(v == 0 for v in rec.values())


def test_novelty_monitor_compaction_read_invariant(spark, tmp_path):
    """compact() must fold the bitmap slices without changing any
    probe decision: a post-compaction batch reports the same novelty
    as an identical never-compacted twin; folded batch ids still
    drop; equal-epoch recompaction is a no-op."""
    import pathlib as _pl

    from mknssh_11_bigdata_spark.streaming.sinks import (
        NoveltyMonitorSink,
    )

    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "text"
    )
    batches = [
        docs.filter(f"doc_id >= {lo} AND doc_id < {hi}").localCheckpoint(
            eager=True
        )
        for lo, hi in [(0, 40), (40, 80), (80, 140)]
    ]
    probe = docs.filter("doc_id >= 140 AND doc_id < 200").localCheckpoint(
        eager=True
    )

    a = NoveltyMonitorSink(str(tmp_path / "a"))
    b = NoveltyMonitorSink(str(tmp_path / "b"))
    for i, bt in enumerate(batches):
        a(bt, i)
        b(bt, i)
    epoch = a.compact(spark)
    assert epoch == 2
    assert _pl.Path(f"{a.root}/bloom/compacted_v=2").exists()
    assert not _pl.Path(f"{a.root}/bloom/batch_id=0").exists()
    # equal-epoch recompaction: byte-identical no-op
    files_before = sorted(
        p.name for p in _pl.Path(f"{a.root}/bloom/compacted_v=2").iterdir()
    )
    assert a.compact(spark) == 2
    assert (
        sorted(
            p.name
            for p in _pl.Path(f"{a.root}/bloom/compacted_v=2").iterdir()
        )
        == files_before
    )

    # folded batch replays still drop (markers kept)
    a(batches[0], 0)
    assert a.committed_batches() == {0, 1, 2}

    # post-compaction probes identical to the never-compacted twin
    a(probe, 3)
    b(probe, 3)
    ga = {
        r["doc_id"]: (r["n_grams"], r["n_seen_prior"], r["novelty_ppm"])
        for r in a.novelty(spark).collect()
    }
    gb = {
        r["doc_id"]: (r["n_grams"], r["n_seen_prior"], r["novelty_ppm"])
        for r in b.novelty(spark).collect()
    }
    assert ga == gb


def test_geometry_guard_rejects_mismatched_reopen(spark, tmp_path):
    """Review finding (r7): persisted slices are pure functions of
    geometry (bitmap m/k, shingle width, bottom-k size) — reopening a
    root with different values must fail LOUDLY, because e.g. a
    re-sized bloom bitmap probes old slices at the wrong positions
    (false negatives, inverting the one-sided contract) and a larger
    KMV k reads short state as the exact arm."""
    import pytest
    from pyspark.sql import functions as F

    from mknssh_11_bigdata_spark.streaming.sinks import (
        KmvDistinctMonitorSink,
        NoveltyMonitorSink,
    )

    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "text"
    ).filter("doc_id < 30").localCheckpoint(eager=True)

    nov = NoveltyMonitorSink(str(tmp_path / "n"), m_bits=1 << 18)
    nov(docs, 0)
    reopened = NoveltyMonitorSink(str(tmp_path / "n"), m_bits=1 << 20)
    with pytest.raises(RuntimeError, match="geometry"):
        reopened(docs, 1)
    # same geometry reopens fine
    ok = NoveltyMonitorSink(str(tmp_path / "n"), m_bits=1 << 18)
    ok(docs, 1)
    assert ok.committed_batches() == {0, 1}

    ev = spark.createDataFrame(
        [("a", i) for i in range(50)], "event_type string, user_id long"
    )
    kmv = KmvDistinctMonitorSink(str(tmp_path / "k"), k=16)
    kmv(ev, 0)
    for bad in (
        KmvDistinctMonitorSink(str(tmp_path / "k"), k=32),
        KmvDistinctMonitorSink(str(tmp_path / "k"), k=16, salt="other"),
    ):
        with pytest.raises(RuntimeError, match="geometry"):
            bad(ev, 1)


def test_novelty_by_source_matches_exact_replay(spark, tmp_path):
    """Round 8 (VERDICT r7 missing #3): the per-source rollup view on
    the novelty ledger must equal the exact per-(batch, source) replay
    bit-for-bit at the unsaturated default geometry, and the one-sided
    contract must survive the aggregation (pooled/mean can only
    UNDER-report). Also pins: (a) novelty_by_source without source_col
    is a loud error; (b) source_col is ledger-schema geometry — a
    reopen that drops it fails the geometry guard."""
    import pytest

    from mknssh_11_bigdata_spark.streaming.sinks import (
        NoveltyMonitorSink,
    )

    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "source", "text"
    )
    cuts = [(0, 40), (40, 80), (80, 140)]
    batches = [
        docs.filter(f"doc_id >= {lo} AND doc_id < {hi}").localCheckpoint(
            eager=True
        )
        for lo, hi in cuts
    ]
    sink = NoveltyMonitorSink(
        str(tmp_path / "nov"), source_col="source"
    )
    for i, b in enumerate(batches):
        sink(b, i)

    # exact batch-granular replay, rolled up per (batch, source)
    def grams_of(text):
        # mirrors TX.shingles_of exactly, INCLUDING the short-doc
        # branch: < n tokens emits ONE whole-text gram, not nothing
        # (review finding r8 — a fixture with a short doc would
        # silently drop it from the exact replay otherwise)
        t = [x for x in text.split(" ") if x]
        n = 3
        if len(t) < n:
            return {" ".join(t)}
        return {" ".join(t[i : i + n]) for i in range(len(t) - n + 1)}

    seen: set = set()
    exact: dict = {}
    for bi, b in enumerate(batches):
        rows = b.collect()
        per_doc = []
        for r in rows:
            g = grams_of(r["text"])
            ns = sum(1 for x in g if x in seen)
            per_doc.append(
                (
                    r["source"],
                    len(g),
                    ns,
                    (len(g) - ns) * 1_000_000 // len(g),
                )
            )
        for r in rows:
            seen |= grams_of(r["text"])
        by_src: dict = {}
        for src, ng, ns, ppm in per_doc:
            a = by_src.setdefault(src, [0, 0, 0, 0, None, None])
            a[0] += 1
            a[1] += ng
            a[2] += ns
            a[3] += ppm
            a[4] = ppm if a[4] is None else min(a[4], ppm)
            a[5] = ppm if a[5] is None else max(a[5], ppm)
        for src, (nd, ng, ns, ps, mn, mx) in by_src.items():
            exact[(bi, src)] = (
                nd,
                ng,
                ns,
                (ng - ns) * 1_000_000 // ng,
                ps // nd,
                mn,
                mx,
            )

    got = {
        (r["batch_id"], r["source"]): (
            r["n_docs"],
            r["n_grams"],
            r["n_seen_prior"],
            r["pooled_novelty_ppm"],
            r["mean_doc_novelty_ppm"],
            r["min_doc_novelty_ppm"],
            r["max_doc_novelty_ppm"],
        )
        for r in sink.novelty_by_source(spark).collect()
    }
    assert set(got) == set(exact)
    for key, (nd, ng, ns, pooled, mean, mn, mx) in exact.items():
        assert got[key][0] == nd and got[key][1] == ng
        # one-sided: the streamed rollup never over-reports novelty
        assert got[key][2] >= ns
        assert got[key][3] <= pooled
        assert got[key][4] <= mean
    # unsaturated default geometry: exact equality (deterministic)
    assert got == exact

    # (a) sourceless sink: the per-source view is a loud error
    plain = NoveltyMonitorSink(str(tmp_path / "plain"))
    with pytest.raises(ValueError, match="source_col"):
        plain.novelty_by_source(spark)

    # (b) reopening the sourced root WITHOUT source_col = geometry
    # mismatch (telemetry schema is layout), before any batch lands
    bad = NoveltyMonitorSink(str(tmp_path / "nov"))
    with pytest.raises(RuntimeError, match="geometry"):
        bad(batches[0], 99)


def test_novelty_geometry_backcompat_sourceless_roots(spark, tmp_path):
    """Review finding r8: growing the geometry (source_col joined it)
    must not brick roots recorded BEFORE the key existed. A root whose
    _geometry.json carries only the r7 keys reopens cleanly as a
    sourceless sink (its layout truly is source_col="") — and still
    fails loudly for a SOURCED reopen (a real schema flip)."""
    import json
    import pathlib

    import pytest

    from mknssh_11_bigdata_spark.streaming.sinks import (
        NoveltyMonitorSink,
    )

    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "source", "text"
    )
    b0 = docs.filter("doc_id < 30").localCheckpoint(eager=True)
    root = tmp_path / "nov"
    sink = NoveltyMonitorSink(str(root))
    sink(b0, 0)
    # rewrite the geometry file to the pre-r8 3-key form
    p = pathlib.Path(root) / "_geometry.json"
    g = json.loads(p.read_text())
    assert g.pop("source_col") == ""
    p.write_text(json.dumps(g))
    # sourceless reopen: the missing key defaults to "" — writes work
    again = NoveltyMonitorSink(str(root))
    again(
        docs.filter("doc_id >= 30 AND doc_id < 60").localCheckpoint(
            eager=True
        ),
        1,
    )
    assert again.committed_batches() == {0, 1}
    # sourced reopen of the same old root: a REAL mismatch, still loud
    bad = NoveltyMonitorSink(str(root), source_col="source")
    with pytest.raises(RuntimeError, match="geometry"):
        bad(b0, 99)


def test_cms_monitor_sink_matches_batch_query(spark, tmp_path):
    """Round 8: the streaming Count-Min monitor's estimates must equal
    the batch ``corpus_cms_frequency`` estimates bit-for-bit after
    streaming the same documents in micro-batches (additive cells =>
    the streamed matrix IS the whole-stream matrix), its state must
    stay geometry-bounded, replayed batch ids must drop, and a
    geometry-mismatched reopen must fail loudly."""
    import pathlib

    import pytest

    from mknssh_11_bigdata_spark.functions import text as TX
    from mknssh_11_bigdata_spark.queries import QUERIES
    from mknssh_11_bigdata_spark.queries_curation import (
        CMS_DEPTH,
        CMS_SALT,
        CMS_WIDTH,
    )
    from mknssh_11_bigdata_spark.streaming.sinks import (
        CmsFrequencyMonitorSink,
    )

    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "text"
    )
    feed = tmp_path / "feed"
    feed.mkdir()
    for i in range(3):
        sl = docs.filter(f"doc_id % 3 = {i}")
        sl.coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / f"stage{i}")
        )
        part = next(
            pathlib.Path(tmp_path / f"stage{i}").glob("part-*.parquet")
        )
        part.rename(feed / f"{i:04d}.parquet")

    sink = CmsFrequencyMonitorSink(
        str(tmp_path / "cms"),
        depth=CMS_DEPTH,
        width=CMS_WIDTH,
        salt=CMS_SALT,
    )
    vocab = docs.select(
        F.explode(TX.tokens(F.col("text"))).alias("token")
    ).distinct()
    assert sink.estimates(vocab, "token") is None
    q = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(feed))
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert sink.committed_batches() == {0, 1, 2}

    batch = {
        r["token"]: r["cms_estimate"]
        for r in QUERIES["corpus_cms_frequency"]
        .spark(spark, SF_SMOKE)
        .collect()
    }
    got = {
        r["token"]: r["cms_estimate"]
        for r in sink.estimates(vocab, "token").collect()
    }
    assert got == batch

    # state bounded by the geometry, never the vocabulary
    assert sink.sketch(spark).count() <= CMS_DEPTH * CMS_WIDTH

    # replay drop: re-delivering a committed id is a no-op
    sink(docs, 1)
    after = {
        r["token"]: r["cms_estimate"]
        for r in sink.estimates(vocab, "token").collect()
    }
    assert after == batch

    # geometry guard: a reopen with a different width must be loud
    bad = CmsFrequencyMonitorSink(
        str(tmp_path / "cms"),
        depth=CMS_DEPTH,
        width=CMS_WIDTH * 2,
        salt=CMS_SALT,
    )
    with pytest.raises(RuntimeError, match="geometry"):
        bad(docs, 99)


def test_hll_monitor_sink_matches_batch_query(spark, tmp_path):
    """Round 8: the streaming HLL monitor's estimates must equal the
    batch ``event_hll_distinct`` columns bit-for-bit after streaming
    the same events in micro-batches (register MAX-merge => the
    streamed registers ARE the whole-stream registers), state must
    stay at <= 64 rows per key, replays must drop, and — the merge
    being idempotent — even re-delivering the WHOLE stream as a new
    batch id must not move any estimate."""
    import pathlib

    from mknssh_11_bigdata_spark.queries import QUERIES
    from mknssh_11_bigdata_spark.streaming.sinks import (
        HllDistinctMonitorSink,
    )

    events = load_table(spark, SF_SMOKE, "events").select(
        "event_type", "user_id"
    )
    feed = tmp_path / "feed"
    feed.mkdir()
    for i in range(3):
        sl = events.filter(f"user_id % 3 = {i}")
        sl.coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / f"stage{i}")
        )
        part = next(
            pathlib.Path(tmp_path / f"stage{i}").glob("part-*.parquet")
        )
        part.rename(feed / f"{i:04d}.parquet")

    sink = HllDistinctMonitorSink(str(tmp_path / "hll"))
    assert sink.estimates(spark) is None
    q = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(feed))
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert sink.committed_batches() == {0, 1, 2}

    batch = {
        r["event_type"]: (r["hll_estimate"], r["n_empty_registers"])
        for r in QUERIES["event_hll_distinct"]
        .spark(spark, SF_SMOKE)
        .collect()
    }
    got = {
        r["event_type"]: (r["hll_estimate"], r["n_empty_registers"])
        for r in sink.estimates(spark).collect()
    }
    assert got == batch

    # state bounded at m rows per key
    per_key = (
        sink.state(spark).groupBy("event_type").count().collect()
    )
    assert all(r["count"] <= 64 for r in per_key)

    # replay drop (committed id) AND idempotent-merge row re-delivery
    sink(events, 1)
    assert {
        r["event_type"]: (r["hll_estimate"], r["n_empty_registers"])
        for r in sink.estimates(spark).collect()
    } == batch
    sink(events, 7)  # whole stream again under a NEW id: max-merge no-op
    assert {
        r["event_type"]: (r["hll_estimate"], r["n_empty_registers"])
        for r in sink.estimates(spark).collect()
    } == batch


def test_quantile_monitor_sink_matches_batch_query(spark, tmp_path):
    """Round 8: the streaming quantile monitor's estimates must equal
    the batch ``event_value_quantile_sketch`` sketch-arm columns
    bit-for-bit after streaming the same events in micro-batches
    (bottom-k over rows is an associative multiset merge => the
    streamed sample IS the whole-stream sample), state must stay at
    <= k rows per key, n must ride the additive sidecar, replayed
    batch ids must drop, and a geometry-mismatched reopen must fail
    loudly (a row sample is NOT idempotent under re-delivered rows —
    the batch-id ledger is the correctness boundary)."""
    import pathlib

    import pytest

    from mknssh_11_bigdata_spark.queries import QUERIES
    from mknssh_11_bigdata_spark.queries_events import QSK_K, QSK_SALT
    from mknssh_11_bigdata_spark.streaming.sinks import (
        QuantileSketchMonitorSink,
    )

    events = load_table(spark, SF_SMOKE, "events").select(
        "event_type", "event_id", "value"
    )
    feed = tmp_path / "feed"
    feed.mkdir()
    for i in range(3):
        sl = events.filter(f"event_id % 3 = {i}")
        sl.coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / f"stage{i}")
        )
        part = next(
            pathlib.Path(tmp_path / f"stage{i}").glob("part-*.parquet")
        )
        part.rename(feed / f"{i:04d}.parquet")

    sink = QuantileSketchMonitorSink(
        str(tmp_path / "qsk"), k=QSK_K, salt=QSK_SALT
    )
    assert sink.estimates(spark) is None
    q = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(feed))
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert sink.committed_batches() == {0, 1, 2}

    cols = ["n_rows", "n_sample", "p50_est", "p90_est", "p99_est"]
    batch = {
        r["event_type"]: tuple(r[c] for c in cols)
        for r in QUERIES["event_value_quantile_sketch"]
        .spark(spark, SF_SMOKE)
        .collect()
    }
    got = {
        r["event_type"]: tuple(r[c] for c in cols)
        for r in sink.estimates(spark).collect()
    }
    assert got == batch

    # state bounded at k rows per key
    per_key = (
        sink.state(spark).groupBy("event_type").count().collect()
    )
    assert all(r["count"] <= QSK_K for r in per_key)

    # replay of a committed id: dropped, nothing moves
    sink(events, 1)
    assert {
        r["event_type"]: tuple(r[c] for c in cols)
        for r in sink.estimates(spark).collect()
    } == batch

    # geometry-mismatched reopen fails loudly
    bad = QuantileSketchMonitorSink(
        str(tmp_path / "qsk"), k=QSK_K * 2, salt=QSK_SALT
    )
    with pytest.raises(RuntimeError, match="geometry"):
        bad(events, 99)


def test_hll_monitor_windowed_view_matches_sliding_batch_query(
    spark, tmp_path
):
    """Round 8: an HLL monitor keyed by DAY bucket is exactly the
    state `event_hll_sliding_distinct` merges — the sink's
    windowed_estimates view (trailing-7-day MAX-merge of the
    persisted per-day registers) must equal the batch sliding query's
    sketch columns bit-for-bit after streaming the same events, with
    no look at the raw stream at view time."""
    import pathlib

    from mknssh_11_bigdata_spark.queries import QUERIES
    from mknssh_11_bigdata_spark.queries_events import HLL_WIN_DAYS
    from mknssh_11_bigdata_spark.streaming.sinks import (
        HllDistinctMonitorSink,
    )

    events = load_table(spark, SF_SMOKE, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    feed = tmp_path / "feed"
    feed.mkdir()
    for i in range(3):
        sl = events.filter(f"user_id % 3 = {i}")
        sl.coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / f"stage{i}")
        )
        part = next(
            pathlib.Path(tmp_path / f"stage{i}").glob("part-*.parquet")
        )
        part.rename(feed / f"{i:04d}.parquet")

    sink = HllDistinctMonitorSink(
        str(tmp_path / "hll"), key_col="day", id_col="user_id"
    )
    assert sink.windowed_estimates(spark) is None
    q = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(feed))
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert sink.committed_batches() == {0, 1, 2}

    batch = {
        r["day"]: (r["hll_estimate"], r["n_empty_registers"])
        for r in QUERIES["event_hll_sliding_distinct"]
        .spark(spark, SF_SMOKE)
        .collect()
    }
    got = {
        r["day"]: (r["hll_estimate"], r["n_empty_registers"])
        for r in sink.windowed_estimates(
            spark, window_days=HLL_WIN_DAYS
        ).collect()
    }
    assert got == batch


def test_quantile_monitor_windowed_view_matches_sliding_batch_query(
    spark, tmp_path
):
    """Round 8: a quantile monitor keyed by DAY bucket is the sliding
    query's substrate, streamed — windowed_estimates (trailing-7-day
    bottom-k re-merge of the persisted day samples + summed n sidecar)
    must equal event_value_sliding_quantiles' sketch columns
    bit-for-bit after streaming the same events."""
    import pathlib

    from mknssh_11_bigdata_spark.queries import QUERIES
    from mknssh_11_bigdata_spark.queries_events import (
        QSK_K,
        QSK_SALT,
        QSK_WIN_DAYS,
    )
    from mknssh_11_bigdata_spark.streaming.sinks import (
        QuantileSketchMonitorSink,
    )

    events = load_table(spark, SF_SMOKE, "events").select(
        F.to_date("ts").alias("day"), "event_id", "value"
    )
    feed = tmp_path / "feed"
    feed.mkdir()
    for i in range(3):
        sl = events.filter(f"event_id % 3 = {i}")
        sl.coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / f"stage{i}")
        )
        part = next(
            pathlib.Path(tmp_path / f"stage{i}").glob("part-*.parquet")
        )
        part.rename(feed / f"{i:04d}.parquet")

    sink = QuantileSketchMonitorSink(
        str(tmp_path / "qsk"), key_col="day", k=QSK_K, salt=QSK_SALT
    )
    assert sink.windowed_estimates(spark) is None
    q = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(feed))
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert sink.committed_batches() == {0, 1, 2}

    cols = ["n_rows", "n_sample", "p50_est", "p90_est", "p99_est"]
    batch = {
        r["day"]: tuple(r[c] for c in cols)
        for r in QUERIES["event_value_sliding_quantiles"]
        .spark(spark, SF_SMOKE)
        .collect()
    }
    got = {
        r["day"]: tuple(r[c] for c in cols)
        for r in sink.windowed_estimates(
            spark, window_days=QSK_WIN_DAYS
        ).collect()
    }
    assert got == batch
