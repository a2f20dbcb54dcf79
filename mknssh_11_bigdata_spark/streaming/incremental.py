"""Streaming corpus ingest with incremental dedup — the daily-crawl
loop as a Structured Streaming job.

The batch operator (:func:`operators.dedup.incremental_dedup_status`,
certified by the ``dedup_incremental`` oracle query) answers "which of
THIS increment's docs are exact/near duplicates of the corpus so far".
This module wires it into ``foreachBatch``: each micro-batch of crawled
documents is deduped against the ACCUMULATED corpus (seed + every
earlier batch's survivors), survivors are appended, and a status ledger
records every routing decision — so the corpus parquet only ever
contains the deduped stream prefix, exactly what a crawl pipeline
feeds to training.

Exactly-once discipline is the module-wide commit-marker contract
(:class:`sinks._CommitMarkerLedger`): a replayed batch id is dropped
before any work, a crashed batch overwrites its own partial output.
Within-batch duplicates are NOT collapsed (the operator's documented
semantics — the increment probes the corpus, it does not self-join);
run the batch MinHash chain over an increment first if crawl batches
self-duplicate.

Two sinks, one contract: :class:`IncrementalDedupCorpusSink`
recomputes the corpus-side fingerprint and band indexes per batch
(simple, correct, re-reads the corpus);
:class:`IndexedIncrementalDedupCorpusSink` MAINTAINS them as persisted
tables appended per batch — the 100 TB shape, where the per-day cost
is the increment plus index probes, never a corpus pass. Both route
every document identically (e2e batch-equivalence tested)."""

from __future__ import annotations

import pathlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sinks import _CommitMarkerLedger


class IncrementalDedupCorpusSink(_CommitMarkerLedger):
    """``foreachBatch`` callable maintaining a deduped corpus.

    Layout under ``root``::

        corpus/batch_id=<n>/   survivors of batch n (seed = batch_id=-1)
        status/batch_id=<n>/   (doc_id, status, dup_of) per increment doc
        _committed/<n>         commit marker (data first, marker after)
    """

    def __init__(
        self,
        root: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        **dedup_kwargs,
    ):
        super().__init__(root)
        self.id_col = id_col
        self.text_col = text_col
        self.dedup_kwargs = dedup_kwargs

    def seed(self, corpus: DataFrame) -> None:
        """Write the pre-existing corpus as the ``batch_id=-1`` slice.
        Call once before starting the stream (idempotent: overwrite)."""
        corpus.write.mode("overwrite").parquet(
            f"{self.root}/corpus/batch_id=-1"
        )

    def corpus(self, spark: SparkSession) -> DataFrame:
        """The accumulated deduped corpus: seed + committed survivors."""
        base = f"{self.root}/corpus"
        slices = [f"{base}/batch_id=-1"] + [
            f"{base}/batch_id={b}" for b in sorted(self.committed_batches())
        ]
        present = [p for p in slices if pathlib.Path(p).exists()]
        if not present:
            raise RuntimeError(
                "IncrementalDedupCorpusSink has no corpus slices under "
                f"{base}: call seed() with the pre-existing corpus "
                "before starting the stream (Spark's empty-path error "
                "inside foreachBatch is opaque otherwise)."
            )
        return (
            spark.read.option("basePath", base).parquet(*present)
        ).drop("batch_id")

    def statuses(self, spark: SparkSession) -> DataFrame:
        """Every committed batch's routing ledger."""
        base = f"{self.root}/status"
        paths = [
            f"{base}/batch_id={b}" for b in sorted(self.committed_batches())
        ]
        if not paths:
            raise RuntimeError(
                "IncrementalDedupCorpusSink has no committed batches "
                f"under {base} yet — statuses() is only meaningful "
                "after at least one micro-batch commits."
            )
        return spark.read.option("basePath", base).parquet(*paths)

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from ..operators.dedup import incremental_dedup_status

        if batch_id in self.committed_batches():
            return  # replay of a committed batch — exactly-once drop
        spark = batch_df.sparkSession
        # The file-source batch frame can't be reused across the two
        # consumers below (status + survivors) without re-listing;
        # pin it once. Increment batches are crawl-day-sized.
        inc = batch_df.select(self.id_col, self.text_col).localCheckpoint(
            eager=True
        )
        status = incremental_dedup_status(
            self.corpus(spark).select(self.id_col, self.text_col),
            inc,
            self.id_col,
            self.text_col,
            **self.dedup_kwargs,
        ).localCheckpoint(eager=True)  # feeds the ledger AND the filter
        status.write.mode("overwrite").parquet(
            f"{self.root}/status/batch_id={batch_id}"
        )
        survivors = inc.join(
            status.filter("status = 'new'").select(self.id_col),
            self.id_col,
        )
        survivors.write.mode("overwrite").parquet(
            f"{self.root}/corpus/batch_id={batch_id}"
        )
        self._mark_committed(batch_id)


class IndexedIncrementalDedupCorpusSink(IncrementalDedupCorpusSink):
    """The sink above with PERSISTED probe-index maintenance — the
    100 TB shape the base class's module docstring sketches: instead of
    re-fingerprinting and re-signing the ACCUMULATED corpus on every
    micro-batch (a per-day full-corpus pass), the corpus-side exact
    fingerprint index and LSH band index are materialized once per
    slice (seed, then each batch's survivors) and appended alongside
    the corpus, versioned by the same ``batch_id=`` layout and gated by
    the same commit markers — a half-written index slice from a crashed
    batch is invisible until its marker lands, and a replayed batch
    overwrites its own slices before re-marking.

    Per batch the dedup probe becomes
    :func:`operators.dedup.incremental_dedup_status_indexed`: exact
    gate joins the fp index, near probe equi-joins the band index on
    the increment's own band keys (at scale: a partition-pruned read
    of the key-partitioned index table), and verification shingles
    only candidate-touched texts. Routing decisions are IDENTICAL to
    the recomputing base class (e2e-asserted in the tests), so the
    certified ``dedup_incremental`` oracle covers this path's
    semantics too.

    Layout adds, under ``root``::

        fp_index/batch_id=<n>     (fp, doc_id) of slice n
        band_index/batch_id=<n>   (doc_id, band_idx, band_key) of slice n

    ``compact_every=K`` arms the cadence policy: after each commit, if
    K or more batch slices have accumulated past the newest compaction
    epoch, :meth:`compact` folds them — so a long-running stream keeps
    a BOUNDED per-table slice count (≤ K live slices + 1 consolidated)
    instead of growing one slice per crawl day forever. ``None`` (the
    default) leaves compaction to the operator.
    """

    #: slice-table names compact() folds and cleans; subclasses that
    #: persist extra per-batch tables extend this
    _TABLES: tuple[str, ...] = ("corpus", "fp_index", "band_index")

    def __init__(
        self,
        root: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        compact_every: int | None = None,
        **dedup_kwargs,
    ):
        super().__init__(root, id_col, text_col, **dedup_kwargs)
        if compact_every is not None and compact_every < 1:
            raise ValueError("compact_every must be >= 1 (or None)")
        self.compact_every = compact_every

    def _geometry_fields(self) -> dict:
        """Layout-shaping parameters the persisted index slices are a
        pure function of; subclasses that persist extra geometry-keyed
        tables (the bloom bitmaps) extend this. Validated against the
        root's ``_geometry.json`` on every seed/batch — a reopen with
        different values fails loudly instead of silently mis-probing
        (review finding, r7)."""
        return {
            "num_hashes": self.dedup_kwargs.get("num_hashes", 12),
            "bands": self.dedup_kwargs.get("bands", 4),
            "shingle_n": self.dedup_kwargs.get("shingle_n", 3),
        }

    def seed(self, corpus: DataFrame) -> None:
        self._geometry_guard(**self._geometry_fields())
        super().seed(corpus)
        self._write_index_slices(corpus, -1)

    def _write_index_slices(self, docs: DataFrame, batch_id: int) -> None:
        from ..operators.dedup import corpus_dedup_indexes

        fp, band = corpus_dedup_indexes(
            docs.select(self.id_col, self.text_col),
            self.id_col,
            self.text_col,
            **{
                k: v
                for k, v in self.dedup_kwargs.items()
                if k in ("num_hashes", "bands", "shingle_n")
            },
        )
        fp.write.mode("overwrite").parquet(
            f"{self.root}/fp_index/batch_id={batch_id}"
        )
        band.write.mode("overwrite").parquet(
            f"{self.root}/band_index/batch_id={batch_id}"
        )

    def _slice_paths(self, name: str) -> list[str]:
        """Committed data paths for ``name`` (corpus / fp_index /
        band_index) — the shared compaction-aware read rule
        (``_CommitMarkerLedger._compacted_slice_paths``)."""
        return self._compacted_slice_paths(name)

    def corpus(self, spark: SparkSession) -> DataFrame:
        """The accumulated deduped corpus, compaction-aware."""
        present = self._slice_paths("corpus")
        if not present:
            raise RuntimeError(
                "IndexedIncrementalDedupCorpusSink has no corpus slices "
                f"under {self.root}/corpus: call seed() with the "
                "pre-existing corpus before starting the stream."
            )
        # leaf dirs read WITHOUT basePath: no partition-column
        # inference, so batch_id= and compacted_v= dirs mix freely
        return spark.read.parquet(*present)

    def _index(self, spark: SparkSession, name: str) -> DataFrame:
        present = self._slice_paths(name)
        if not present:
            raise RuntimeError(
                f"IndexedIncrementalDedupCorpusSink has no {name} slices "
                f"under {self.root}/{name}: call seed() with the "
                "pre-existing corpus before starting the stream."
            )
        return spark.read.parquet(*present)

    def compact(self, spark: SparkSession) -> int:
        """Fold the seed + every committed slice of the corpus and both
        probe indexes into ONE consolidated slice per table, then drop
        the folded slice directories — bounding the per-batch read
        fan-in. One slice per table lands per crawl day; at 100 TB the
        probe join's file-listing/footer cost grows with that count,
        and periodic compaction is how every log-structured store
        bounds it (the read path is exactly an LSM level-0 merge).
        Returns the compaction epoch (the max committed batch id).

        Crash-safe by the module's marker discipline (the shared
        ``_finish_compaction`` tail): consolidated data is written
        FIRST, the epoch marker second, folded slices are deleted
        LAST — a crash before the marker leaves readers on the old
        slices (the half-written consolidation is invisible); a crash
        after the marker leaves stale slice dirs readers already
        ignore (``_slice_paths`` reads only slices ABOVE the epoch)
        and the next ``compact()`` removes. Batch COMMIT markers are
        kept, so the exactly-once replay drop still recognizes folded
        batch ids."""
        committed = self.committed_batches()
        if not committed:
            raise RuntimeError("nothing to compact: no committed batches yet")
        epoch = max(committed)
        prev_epoch = self._compact_epoch()
        if prev_epoch == epoch:
            # No batch committed since the last compaction: the only
            # slices are the consolidated compacted_v=<epoch> dirs
            # themselves. Re-compacting would read the LIVE copy
            # (pinned only in non-fault-tolerant localCheckpoint
            # storage) and mode('overwrite') the same directory — a
            # write failure in that window would destroy the corpus
            # while the marker still points at it. Nothing to fold:
            # no-op.
            return epoch
        for name in self._TABLES:
            df = spark.read.parquet(*self._slice_paths(name))
            # pin the read BEFORE overwriting anything under the table
            df = df.localCheckpoint(eager=True)
            df.write.mode("overwrite").parquet(
                f"{self.root}/{name}/compacted_v={epoch}"
            )
        self._finish_compaction(epoch, prev_epoch, self._TABLES)
        return epoch

    def _status(self, spark: SparkSession, inc: DataFrame) -> DataFrame:
        """The per-batch routing decision (id, status, dup_of) — the
        subclass seam the Bloom-prefiltered sink narrows. MUST return
        the same decisions :func:`incremental_dedup_status_indexed`
        would (the certified semantics); only the probe COST may
        change."""
        from ..operators.dedup import incremental_dedup_status_indexed

        return incremental_dedup_status_indexed(
            self.corpus(spark).select(self.id_col, self.text_col),
            self._index(spark, "fp_index"),
            self._index(spark, "band_index"),
            inc,
            self.id_col,
            self.text_col,
            **self.dedup_kwargs,
        )

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        self._geometry_guard(**self._geometry_fields())
        if batch_id in self.committed_batches():
            return  # replay of a committed batch — exactly-once drop
        spark = batch_df.sparkSession
        inc = batch_df.select(self.id_col, self.text_col).localCheckpoint(
            eager=True
        )
        status = self._status(spark, inc).localCheckpoint(eager=True)
        status.write.mode("overwrite").parquet(
            f"{self.root}/status/batch_id={batch_id}"
        )
        survivors = inc.join(
            status.filter("status = 'new'").select(self.id_col),
            self.id_col,
        ).localCheckpoint(eager=True)  # feeds corpus AND index writes
        survivors.write.mode("overwrite").parquet(
            f"{self.root}/corpus/batch_id={batch_id}"
        )
        self._write_index_slices(survivors, batch_id)
        # subclass hook — any extra per-batch state must land BEFORE the
        # commit marker (same crash-safety ordering as the slices: a
        # half-written batch stays invisible until its marker exists)
        self._post_route(spark, inc, status, batch_id)
        self._mark_committed(batch_id)
        if self.compact_every is not None:
            epoch = self._compact_epoch()
            live = [
                b
                for b in self.committed_batches()
                if epoch is None or b > epoch
            ]
            if len(live) >= self.compact_every:
                self.compact(spark)

    def _post_route(
        self,
        spark: SparkSession,
        inc: DataFrame,
        status: DataFrame,
        batch_id: int,
    ) -> None:
        """Per-batch extension point, called after the corpus/index
        slices land and before the commit marker. No-op here."""


class BloomPrefilteredIncrementalDedupSink(
    IndexedIncrementalDedupCorpusSink
):
    """The indexed sink with a BLOOM PRE-FILTER in front of both probe
    joins — the 100 TB shape of "most of today's crawl is new": before
    touching the fp/band indexes, each batch row probes two persisted
    Bloom bitmaps (corpus fingerprints; corpus band keys). A row whose
    fingerprint misses AND whose every band key misses provably has no
    exact match and no LSH candidate in the corpus, so it routes
    ``new`` without either index join; only the bloom-suspect sliver
    runs the full indexed probe. One-sided error makes this exact:
    false positives only send extra rows to the joins that then decide
    correctly, never the reverse (equality with the unfiltered sink is
    e2e-asserted in tests).

    Bitmap slices persist per batch as mergeable ``(__word, __bits)``
    tables (``bloom_fp/``, ``bloom_band/``), ride the same commit
    markers and compaction as the other index tables (``_TABLES``),
    and fold with one ``bit_or`` groupBy at read — total size is
    m_bits/8 bytes regardless of corpus row count. ``bloom_m_bits`` is
    FIXED geometry (words must align across slices): size it from the
    corpus forecast (~16 bits per expected item). A saturated bitmap
    degrades safely — everything probes as suspect and the sink
    behaves exactly like the parent, paying only the bitmap scan.

    The batch-side signature computation is NOT saved (the band probe
    needs the increment's own band keys either way); the savings is
    the corpus-side index join — file listing, pruned reads, shuffle —
    which is the term that grows with corpus size."""

    _TABLES = (
        "corpus",
        "fp_index",
        "band_index",
        "bloom_fp",
        "bloom_band",
    )

    def __init__(
        self,
        root: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        compact_every: int | None = None,
        bloom_m_bits: int = 1 << 18,
        bloom_k: int = 2,
        **dedup_kwargs,
    ):
        super().__init__(
            root, id_col, text_col, compact_every, **dedup_kwargs
        )
        if bloom_m_bits < 64 or bloom_k < 1:
            raise ValueError("bloom geometry: m_bits >= 64, k >= 1")
        self.bloom_m_bits = bloom_m_bits
        self.bloom_k = bloom_k
        #: (n_cleared, n_suspect) prefilter telemetry of the last batch
        self.last_prefilter_stats: tuple[int, int] | None = None

    def _geometry_fields(self) -> dict:
        return {
            **super()._geometry_fields(),
            "bloom_m_bits": self.bloom_m_bits,
            "bloom_k": self.bloom_k,
        }

    def _write_index_slices(self, docs: DataFrame, batch_id: int) -> None:
        from ..operators.sketches import bloom_word_frame

        super()._write_index_slices(docs, batch_id)
        spark = docs.sparkSession
        fp = spark.read.parquet(
            f"{self.root}/fp_index/batch_id={batch_id}"
        )
        band = spark.read.parquet(
            f"{self.root}/band_index/batch_id={batch_id}"
        )
        bloom_word_frame(
            fp.select(F.col("fp").alias("item")),
            "item",
            self.bloom_m_bits,
            self.bloom_k,
        ).write.mode("overwrite").parquet(
            f"{self.root}/bloom_fp/batch_id={batch_id}"
        )
        bloom_word_frame(
            band.select(F.col("band_key").alias("item")),
            "item",
            self.bloom_m_bits,
            self.bloom_k,
        ).write.mode("overwrite").parquet(
            f"{self.root}/bloom_band/batch_id={batch_id}"
        )

    def _bloom(self, spark: SparkSession, name: str) -> DataFrame:
        """Committed bitmap slices folded into the one-row broadcastable
        DENSE-ARRAY form (bit_or merge across slices — word-aligned by
        the fixed geometry; positional ``array<long>`` probe, not a
        linearly-scanned map — VERDICT r6 defect #1).

        Coverage check (ADVICE r6): the bloom slices must cover exactly
        the slices of the index table they summarize — a root seeded or
        partially written by the non-Bloom parent class would silently
        UNDER-filter (rows duplicating the uncovered slices would clear
        as 'new'), so a mixed/legacy root fails loudly instead."""
        from ..operators.sketches import bloom_dense_frame

        index_of = {"bloom_fp": "fp_index", "bloom_band": "band_index"}
        have = {p.rsplit("/", 1)[-1] for p in self._slice_paths(name)}
        want = {
            p.rsplit("/", 1)[-1]
            for p in self._slice_paths(index_of[name])
        }
        if not have or have != want:
            raise RuntimeError(
                f"{type(self).__name__}: bloom slice dirs under "
                f"{self.root}/{name} ({sorted(have)}) do not match the "
                f"{index_of[name]} slices ({sorted(want)}) — the root "
                "was seeded or written without the Bloom subclass; "
                "probing this partial bitmap would silently clear rows "
                "that duplicate the uncovered slices. Re-seed with this "
                "sink class (or compact with it) before streaming."
            )
        words = spark.read.parquet(*self._slice_paths(name))
        return bloom_dense_frame(words, self.bloom_m_bits)

    def _status(self, spark: SparkSession, inc: DataFrame) -> DataFrame:
        from ..operators.dedup import (
            fingerprint,
            melt_band_keys,
            minhash_signatures,
        )
        from ..operators.sketches import bloom_probe

        nh = self.dedup_kwargs.get("num_hashes", 12)
        nb = self.dedup_kwargs.get("bands", 4)
        sn = self.dedup_kwargs.get("shingle_n", 3)
        fp_probe = bloom_probe(
            inc.select(
                self.id_col,
                fingerprint(F.col(self.text_col)).alias("__fp"),
            ),
            "__fp",
            self._bloom(spark, "bloom_fp"),
            self.bloom_m_bits,
            self.bloom_k,
            "fp_hit",
        )
        melt_i = melt_band_keys(
            minhash_signatures(inc, self.id_col, self.text_col, nh, sn),
            self.id_col,
            nb,
            nh // nb,
        )
        band_probe = (
            bloom_probe(
                melt_i,
                "band_key",
                self._bloom(spark, "bloom_band"),
                self.bloom_m_bits,
                self.bloom_k,
                "band_hit",
            )
            .groupBy(self.id_col)
            .agg(F.max("band_hit").alias("band_hit"))
        )
        flags = (
            fp_probe.select(self.id_col, "fp_hit")
            .join(band_probe, self.id_col, "left")
            .select(
                self.id_col,
                # NULL text => NULL fingerprint => NULL probe flag; the
                # outer coalesce routes such rows to the SUSPECT arm so
                # the parent probe decides them — without it the row
                # fails both filter(__suspect) and filter(~__suspect)
                # and silently vanishes from status and corpus,
                # breaking the identical-decisions contract (ADVICE r6)
                F.coalesce(
                    F.col("fp_hit")
                    | F.coalesce(F.col("band_hit"), F.lit(False)),
                    F.lit(True),
                ).alias("__suspect"),
            )
            .localCheckpoint(eager=True)  # feeds both arms + telemetry
        )
        suspects = inc.join(
            flags.filter("__suspect").select(self.id_col), self.id_col
        )
        cleared = flags.filter(~F.col("__suspect")).select(self.id_col)
        # telemetry: ONE agg over the checkpointed flags (total +
        # suspect count in the same cached-block scan — was two jobs)
        trow = flags.agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(F.col("__suspect").cast("long")).alias("__ns"),
        ).collect()[0]
        n_suspect = int(trow["__ns"] or 0)
        self.last_prefilter_stats = (
            int(trow["__n"]) - n_suspect,
            n_suspect,
        )
        st_clear = cleared.select(
            F.col(self.id_col),
            F.lit("new").alias("status"),
            F.lit(None)
            .cast(dict(inc.dtypes)[self.id_col])
            .alias("dup_of"),
        )
        return (
            super()
            ._status(spark, suspects)
            .unionByName(st_clear)
            .orderBy(self.id_col)
        )

class LeakageSafeSplitDedupSink(IndexedIncrementalDedupCorpusSink):
    """The indexed daily-crawl sink PLUS leakage-safe train/val/test
    assignment AT INGEST — the incremental form of the batch
    ``dedup_leakage_safe_split`` query.

    Assignment rule per routed doc:

    * ``exact_dup`` / ``near_dup`` → INHERIT the split already assigned
      to ``dup_of`` (always an assigned corpus doc — disjoint id
      spaces guarantee it), carrying its group id. A doc and its
      verified duplicate can therefore never straddle a split boundary.
    * ``new`` survivors → component-routed assignment WITHIN the batch
      (:func:`pipelines.ml.leakage_safe_assignments`): two new docs
      that duplicate each other but nothing in the corpus found ONE
      group and share a side (per-doc hashing here would be the
      straddle bug in miniature).

    Assignments are IMMUTABLE once committed — split STABILITY is the
    contract a crawl pipeline needs (a doc that moves from train to
    test after a later component merge IS the leak, retroactively).
    The corollary is honest: if a later bridge doc connects two
    existing groups that landed on opposite sides, the bridge inherits
    its ``dup_of``'s side and its OTHER cross-group pairs straddle;
    the right production response is detect-and-quarantine (the
    straddle audit in the tests), never rewriting history. A
    from-scratch batch recompute after such a merge may legitimately
    differ — the e2e test asserts equality exactly when no cross-batch
    merge occurred, and stability always.

    Layout adds ``splits/batch_id=<n>`` slices of
    ``(doc_id, group_id, split)`` (seed = batch_id=-1), gated by the
    same commit markers as the corpus slices.
    """

    def seed(self, corpus: DataFrame) -> None:
        super().seed(corpus)
        from ..pipelines.ml import leakage_safe_assignments

        a = leakage_safe_assignments(
            corpus.select(self.id_col, self.text_col),
            self.id_col,
            self.text_col,
            **self.dedup_kwargs,
        )
        a.write.mode("overwrite").parquet(
            f"{self.root}/splits/batch_id=-1"
        )

    def assignments(self, spark: SparkSession) -> DataFrame:
        """Every committed (doc_id, group_id, split) assignment —
        seed plus committed batches (same slice discipline as the
        corpus; compaction does not touch split slices)."""
        base = f"{self.root}/splits"
        paths = [f"{base}/batch_id=-1"] + [
            f"{base}/batch_id={b}"
            for b in sorted(self.committed_batches())
        ]
        present = [p for p in paths if pathlib.Path(p).exists()]
        if not present:
            raise RuntimeError(
                f"LeakageSafeSplitDedupSink has no split slices under "
                f"{base}: call seed() before starting the stream."
            )
        return spark.read.parquet(*present)

    def _post_route(
        self,
        spark: SparkSession,
        inc: DataFrame,
        status: DataFrame,
        batch_id: int,
    ) -> None:
        from ..pipelines.ml import leakage_safe_assignments

        prev = self.assignments(spark).select(
            F.col(self.id_col).alias("dup_of"),
            "group_id",
            "split",
        )
        # LEFT join + loud failure (ADVICE r5): the disjoint-id
        # contract says every dup_of is an already-assigned corpus doc;
        # if an ingest bug or a missing split slice ever violates it,
        # an inner join would silently drop the doc's split row — the
        # worst outcome for an immutable-assignment ledger. Fail the
        # batch instead so the broken contract surfaces at ingest.
        inherited = (
            status.filter(F.col("status") != "new")
            .select(self.id_col, "dup_of")
            .join(prev, "dup_of", "left")
            .localCheckpoint(eager=True)  # count + write read one scan
        )
        n_orphans = inherited.filter(F.col("split").isNull()).count()
        if n_orphans:
            raise RuntimeError(
                f"LeakageSafeSplitDedupSink batch {batch_id}: "
                f"{n_orphans} dup-routed doc(s) point at a dup_of with "
                "no committed split assignment — the disjoint-id "
                "ingest contract is violated or a split slice is "
                "missing; refusing to write a silent gap."
            )
        inherited = inherited.select(self.id_col, "group_id", "split")
        fresh_docs = inc.join(
            status.filter(F.col("status") == "new").select(self.id_col),
            self.id_col,
        )
        fresh = leakage_safe_assignments(
            fresh_docs.select(self.id_col, self.text_col),
            self.id_col,
            self.text_col,
            **self.dedup_kwargs,
        )
        inherited.unionByName(fresh).write.mode("overwrite").parquet(
            f"{self.root}/splits/batch_id={batch_id}"
        )


class IncrementalEmbeddingDedupSink(_CommitMarkerLedger):
    """The EMBEDDING ingest loop — daily re-embedded crawl batches
    deduped against the accumulated vector corpus, the SRP twin of
    :class:`IndexedIncrementalDedupCorpusSink`: each micro-batch of
    ``(id, vector)`` rows probes the MAINTAINED corpus band index
    (:func:`operators.dedup.embedding_band_index` slices appended per
    committed batch), exact cosine verifies candidates only, 'new'
    survivors append to the corpus and the index, and a status ledger
    records every decision — commit-marker exactly-once throughout.

    Geometry is pinned at construction (``n_bits``/``bands``): a
    persisted index cannot n-scale per read. Production re-indexes
    when the corpus count crosses an ``srp_rows_per_band`` ladder step
    — one rebuild per ~256× corpus growth at the default target load.

    Layout under ``root``::

        corpus/batch_id=<n>      surviving vectors (seed = batch_id=-1)
        band_index/batch_id=<n>  (id, band_idx, band_key) of slice n
        status/batch_id=<n>      (id, status, dup_of) per increment row
        _committed/<n>           commit marker (data first, marker after)

    ``compact_every=K`` arms the same LSM-style compaction cadence the
    text sink carries (round 6): corpus + index slices fold into one
    consolidated ``compacted_v=<epoch>`` dir per table once K batch
    slices accumulate, with the text sink's crash-safety ordering and
    equal-epoch no-op. Status slices stay per-batch.
    """

    #: slice-table names compact() folds and cleans; subclasses that
    #: persist extra per-batch tables extend this (status and split
    #: slices stay per-batch — they are read by committed batch id,
    #: and markers survive compaction)
    _TABLES: tuple[str, ...] = ("corpus", "band_index")

    def __init__(
        self,
        root: str,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        dim: int = 64,
        threshold: float = 0.9,
        n_bits: int = 32,
        bands: int = 4,
        max_bucket_size: int | None = None,
        compact_every: int | None = None,
    ):
        super().__init__(root)
        self.id_col = id_col
        self.vec_col = vec_col
        self.dim = dim
        self.threshold = threshold
        self.n_bits = n_bits
        self.bands = bands
        self.max_bucket_size = max_bucket_size
        if compact_every is not None and compact_every < 1:
            raise ValueError("compact_every must be >= 1 (or None)")
        self.compact_every = compact_every

    def _write_index_slice(self, docs: DataFrame, batch_id: int) -> None:
        from ..operators.dedup import embedding_band_index

        embedding_band_index(
            docs.select(self.id_col, self.vec_col),
            self.id_col,
            self.vec_col,
            dim=self.dim,
            n_bits=self.n_bits,
            bands=self.bands,
        ).write.mode("overwrite").parquet(
            f"{self.root}/band_index/batch_id={batch_id}"
        )

    def _geometry_fields(self) -> dict:
        """Layout-shaping parameters the persisted SRP band index is a
        pure function of (threshold only shapes decisions, not the
        layout); the bloom subclass extends with its bitmap geometry.
        Validated against ``_geometry.json`` on seed and every batch."""
        return {
            "dim": self.dim,
            "n_bits": self.n_bits,
            "bands": self.bands,
        }

    def seed(self, corpus: DataFrame) -> None:
        """Write the pre-existing vector corpus + its band index as the
        ``batch_id=-1`` slices (idempotent: overwrite)."""
        self._geometry_guard(**self._geometry_fields())
        corpus.write.mode("overwrite").parquet(
            f"{self.root}/corpus/batch_id=-1"
        )
        self._write_index_slice(corpus, -1)

    def _slices(self, name: str) -> list[str]:
        """Committed data paths for ``name`` — the shared compaction-
        aware read rule, with this sink's raise-on-empty contract."""
        present = self._compacted_slice_paths(name)
        if not present:
            raise RuntimeError(
                f"IncrementalEmbeddingDedupSink has no {name} slices "
                f"under {self.root}/{name}: call seed() with the "
                "pre-existing corpus before starting the stream."
            )
        return present

    def compact(self, spark: SparkSession) -> int:
        """Fold seed + committed slices of every ``_TABLES`` table into
        one consolidated slice each, then drop the folded dirs —
        bounding the per-batch read fan-in (one slice lands per crawl
        day; the probe join's file-listing cost grows with that count).
        Same crash-safety ordering as the text sink: consolidated data
        first, epoch marker second, folded slices deleted last; equal
        epoch (no batch since the last compaction) is a NO-OP so the
        only persisted copy is never rewritten in place. Status and
        split slices are untouched — they are read per committed batch
        id, and batch COMMIT markers survive, so the exactly-once
        replay drop still recognizes folded ids."""
        committed = self.committed_batches()
        if not committed:
            raise RuntimeError(
                "nothing to compact: no committed batches yet"
            )
        epoch = max(committed)
        prev_epoch = self._compact_epoch()
        if prev_epoch == epoch:
            return epoch
        for name in self._TABLES:
            df = spark.read.parquet(*self._slices(name))
            df = df.localCheckpoint(eager=True)  # pin before overwrite
            df.write.mode("overwrite").parquet(
                f"{self.root}/{name}/compacted_v={epoch}"
            )
        self._finish_compaction(epoch, prev_epoch, self._TABLES)
        return epoch

    def corpus(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(*self._slices("corpus"))

    def statuses(self, spark: SparkSession) -> DataFrame:
        base = f"{self.root}/status"
        paths = [
            f"{base}/batch_id={b}" for b in sorted(self.committed_batches())
        ]
        if not paths:
            raise RuntimeError(
                "IncrementalEmbeddingDedupSink has no committed batches "
                f"under {base} yet."
            )
        return spark.read.parquet(*paths)

    def _status(self, spark: SparkSession, inc: DataFrame) -> DataFrame:
        """The per-batch routing decision (id, status, dup_of) — the
        subclass seam the Bloom-prefiltered sink narrows (same contract
        as the text sink's hook: decisions must be identical, only the
        probe COST may change)."""
        from ..operators.dedup import incremental_embedding_dedup_status

        return incremental_embedding_dedup_status(
            self.corpus(spark).select(self.id_col, self.vec_col),
            inc,
            self.id_col,
            self.vec_col,
            dim=self.dim,
            threshold=self.threshold,
            n_bits=self.n_bits,
            bands=self.bands,
            max_bucket_size=self.max_bucket_size,
            corpus_band_index=spark.read.parquet(
                *self._slices("band_index")
            ),
        )

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        self._geometry_guard(**self._geometry_fields())
        if batch_id in self.committed_batches():
            return  # replay of a committed batch — exactly-once drop
        spark = batch_df.sparkSession
        inc = batch_df.select(self.id_col, self.vec_col).localCheckpoint(
            eager=True
        )
        status = self._status(spark, inc).localCheckpoint(eager=True)
        status.write.mode("overwrite").parquet(
            f"{self.root}/status/batch_id={batch_id}"
        )
        survivors = inc.join(
            status.filter("status = 'new'").select(self.id_col),
            self.id_col,
        ).localCheckpoint(eager=True)  # feeds corpus AND index writes
        survivors.write.mode("overwrite").parquet(
            f"{self.root}/corpus/batch_id={batch_id}"
        )
        self._write_index_slice(survivors, batch_id)
        # subclass hook — any extra per-batch state must land BEFORE
        # the commit marker (same crash-safety ordering as the slices)
        self._post_route(spark, inc, status, batch_id)
        self._mark_committed(batch_id)
        if self.compact_every is not None:
            epoch = self._compact_epoch()
            live = [
                b
                for b in self.committed_batches()
                if epoch is None or b > epoch
            ]
            if len(live) >= self.compact_every:
                self.compact(spark)

    def _post_route(
        self,
        spark: SparkSession,
        inc: DataFrame,
        status: DataFrame,
        batch_id: int,
    ) -> None:
        """Per-batch extension point, called after the corpus/index
        slices land and before the commit marker. No-op here."""


class BloomPrefilteredEmbeddingDedupSink(IncrementalEmbeddingDedupSink):
    """The embedding ingest loop with an SRP band-key BLOOM PRE-FILTER
    — the semantic twin of
    :class:`BloomPrefilteredIncrementalDedupSink`: before probing the
    persisted band index, each batch vector's band keys test a
    persisted bitmap of the corpus's band keys; a vector whose EVERY
    band key misses provably has no LSH candidate in the corpus (the
    near probe is the only gate — embedding dedup has no exact arm)
    and routes ``new`` without the index join. One-sided error keeps
    routing identical to the parent (e2e-asserted).

    Bitmap slices (``bloom_band/batch_id=<n>``, mergeable
    ``(__word, __bits)`` rows) are written from each slice's band
    index and ride the same commit markers. Geometry is fixed at
    construction (words must align across slices); a saturated bitmap
    degrades to the parent's exact behavior. The increment's
    signatures are computed for the probe and again inside the parent
    status for the suspect sliver — the signature cost is plan-compile
    dominated locally (BASELINE.md r4) and batch-sized at scale; the
    savings is the corpus-side index read + join, the term that grows
    with corpus size.

    The prefilter's yield tracks BAND WIDTH, exactly like bucket load:
    8-bit bands (2^8 keys) saturate at a few hundred corpus vectors —
    measured 0/100 cleared — while the 16-bit large-corpus geometry
    (`srp_rows_per_band` ladder) cleared 97/100 on the same batch.
    Pair this sink with the wide-band geometry the corpus size calls
    for; narrow bands degrade it to the parent's behavior (safely)."""

    _TABLES = ("corpus", "band_index", "bloom_band")

    def __init__(
        self,
        root: str,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        dim: int = 64,
        threshold: float = 0.9,
        n_bits: int = 32,
        bands: int = 4,
        max_bucket_size: int | None = None,
        compact_every: int | None = None,
        bloom_m_bits: int = 1 << 18,
        bloom_k: int = 2,
    ):
        super().__init__(
            root,
            id_col,
            vec_col,
            dim,
            threshold,
            n_bits,
            bands,
            max_bucket_size,
            compact_every,
        )
        if bloom_m_bits < 64 or bloom_k < 1:
            raise ValueError("bloom geometry: m_bits >= 64, k >= 1")
        self.bloom_m_bits = bloom_m_bits
        self.bloom_k = bloom_k
        #: (n_cleared, n_suspect) prefilter telemetry of the last batch
        self.last_prefilter_stats: tuple[int, int] | None = None

    def _geometry_fields(self) -> dict:
        return {
            **super()._geometry_fields(),
            "bloom_m_bits": self.bloom_m_bits,
            "bloom_k": self.bloom_k,
        }

    def _write_index_slice(self, docs: DataFrame, batch_id: int) -> None:
        from ..operators.sketches import bloom_word_frame

        super()._write_index_slice(docs, batch_id)
        spark = docs.sparkSession
        band = spark.read.parquet(
            f"{self.root}/band_index/batch_id={batch_id}"
        )
        # item = band_idx|band_key: the raw SRP band key is a sig
        # substring whose meaning depends on its position, so the
        # bitmap item must carry the position (the text-side keys embed
        # it in the md5 already)
        bloom_word_frame(
            band.select(
                F.concat_ws(
                    "|", F.col("band_idx"), F.col("band_key")
                ).alias("item")
            ),
            "item",
            self.bloom_m_bits,
            self.bloom_k,
        ).write.mode("overwrite").parquet(
            f"{self.root}/bloom_band/batch_id={batch_id}"
        )

    def _bloom(self, spark: SparkSession) -> DataFrame:
        """Dense positional-array bitmap (VERDICT r6 defect #1 — probe
        via O(1) ``element_at`` on ArrayType, not a linearly-scanned
        map), with the same slice-coverage check as the text sink
        (ADVICE r6): bloom slices must match the band-index slices or
        the prefilter would silently under-filter a mixed/legacy root."""
        from ..operators.sketches import bloom_dense_frame

        have = {
            p.rsplit("/", 1)[-1] for p in self._slices("bloom_band")
        }
        want = {
            p.rsplit("/", 1)[-1] for p in self._slices("band_index")
        }
        if not have or have != want:
            raise RuntimeError(
                f"{type(self).__name__}: bloom slice dirs under "
                f"{self.root}/bloom_band ({sorted(have)}) do not match "
                f"the band_index slices ({sorted(want)}) — re-seed or "
                "compact with this sink class before streaming."
            )
        words = spark.read.parquet(*self._slices("bloom_band"))
        return bloom_dense_frame(words, self.bloom_m_bits)

    def _status(self, spark: SparkSession, inc: DataFrame) -> DataFrame:
        from ..operators.dedup import hyperplane_signatures
        from ..operators.sketches import bloom_probe

        rows = self.n_bits // self.bands
        sig_i = hyperplane_signatures(
            inc, self.id_col, self.vec_col, self.dim, self.n_bits
        )
        melt_i = sig_i.select(
            F.col(self.id_col),
            F.explode(
                F.array(
                    *[
                        F.concat_ws(
                            "|",
                            F.lit(j),
                            F.substring(
                                F.col("sig"), j * rows + 1, rows
                            ),
                        )
                        for j in range(self.bands)
                    ]
                )
            ).alias("band_key"),
        )
        flags = (
            bloom_probe(
                melt_i,
                "band_key",
                self._bloom(spark),
                self.bloom_m_bits,
                self.bloom_k,
                "band_hit",
            )
            .groupBy(self.id_col)
            .agg(F.max("band_hit").alias("__suspect"))
            .localCheckpoint(eager=True)  # feeds both arms + telemetry
        )
        suspects = inc.join(
            flags.filter("__suspect").select(self.id_col), self.id_col
        )
        # ONE agg for both telemetry counts (see the text sink above)
        trow = flags.agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(F.col("__suspect").cast("long")).alias("__ns"),
        ).collect()[0]
        n_suspect = int(trow["__ns"] or 0)
        self.last_prefilter_stats = (
            int(trow["__n"]) - n_suspect,
            n_suspect,
        )
        st_clear = flags.filter(~F.col("__suspect")).select(
            F.col(self.id_col),
            F.lit("new").alias("status"),
            F.lit(None)
            .cast(dict(inc.dtypes)[self.id_col])
            .alias("dup_of"),
        )
        return (
            super()
            ._status(spark, suspects)
            .unionByName(st_clear)
            .orderBy(self.id_col)
        )


class SemanticLeakageSplitDedupSink(IncrementalEmbeddingDedupSink):
    """The embedding ingest loop PLUS leakage-safe train/val/test
    assignment AT INGEST — the incremental form of the batch
    ``dedup_semantic_leakage_split`` query, and the semantic twin of
    :class:`LeakageSafeSplitDedupSink` (VERDICT r5 "What's missing"
    #3): a real crawl pipeline re-embeds every day's batch and needs
    the SEMANTIC split (paraphrases, re-encodings) maintained
    incrementally, not recomputed corpus-wide per day.

    Assignment rule per routed vector:

    * ``near_dup`` → INHERIT the split already assigned to ``dup_of``
      (always an assigned corpus vector — disjoint id spaces), carrying
      its group id; a vector and its verified semantic duplicate can
      never straddle a split boundary. An orphaned dup route (dup_of
      with no committed assignment) fails the batch loudly — same
      broken-contract policy as the text sink (ADVICE r5).
    * ``new`` survivors → component-routed assignment WITHIN the batch
      (:func:`pipelines.ml.semantic_leakage_safe_assignments`): two new
      vectors that duplicate each other but nothing in the corpus
      found ONE group and share a side.

    Assignments are IMMUTABLE once committed — the same stability
    contract, merge honesty, and detect-and-quarantine posture as the
    text sink's docstring spells out; a from-scratch recompute may
    legitimately differ after a cross-batch component merge, and the
    e2e test asserts equality exactly when none occurred.

    Layout adds ``splits/batch_id=<n>`` slices of
    ``(vec_id, group_id, split)`` (seed = batch_id=-1), gated by the
    same commit markers as the corpus slices.
    """

    def _slice_assignments(self, vecs: DataFrame) -> DataFrame:
        from ..pipelines.ml import semantic_leakage_safe_assignments

        return semantic_leakage_safe_assignments(
            vecs.select(self.id_col, self.vec_col),
            self.id_col,
            self.vec_col,
            self.dim,
            threshold=self.threshold,
            n_bits=self.n_bits,
            bands=self.bands,
            max_bucket_size=self.max_bucket_size,
        )

    def seed(self, corpus: DataFrame) -> None:
        super().seed(corpus)
        self._slice_assignments(corpus).write.mode("overwrite").parquet(
            f"{self.root}/splits/batch_id=-1"
        )

    def assignments(self, spark: SparkSession) -> DataFrame:
        """Every committed (vec_id, group_id, split) assignment — seed
        plus committed batches (same slice discipline as the corpus)."""
        base = f"{self.root}/splits"
        paths = [f"{base}/batch_id=-1"] + [
            f"{base}/batch_id={b}"
            for b in sorted(self.committed_batches())
        ]
        present = [p for p in paths if pathlib.Path(p).exists()]
        if not present:
            raise RuntimeError(
                f"SemanticLeakageSplitDedupSink has no split slices "
                f"under {base}: call seed() before starting the stream."
            )
        return spark.read.parquet(*present)

    def _post_route(
        self,
        spark: SparkSession,
        inc: DataFrame,
        status: DataFrame,
        batch_id: int,
    ) -> None:
        prev = self.assignments(spark).select(
            F.col(self.id_col).alias("dup_of"),
            "group_id",
            "split",
        )
        # LEFT join + loud failure: same rationale as the text sink —
        # a silently missing split row is the worst outcome for an
        # immutable-assignment ledger (ADVICE r5).
        inherited = (
            status.filter(F.col("status") != "new")
            .select(self.id_col, "dup_of")
            .join(prev, "dup_of", "left")
            .localCheckpoint(eager=True)  # count + write read one scan
        )
        n_orphans = inherited.filter(F.col("split").isNull()).count()
        if n_orphans:
            raise RuntimeError(
                f"SemanticLeakageSplitDedupSink batch {batch_id}: "
                f"{n_orphans} dup-routed vector(s) point at a dup_of "
                "with no committed split assignment — the disjoint-id "
                "ingest contract is violated or a split slice is "
                "missing; refusing to write a silent gap."
            )
        inherited = inherited.select(self.id_col, "group_id", "split")
        fresh_vecs = inc.join(
            status.filter(F.col("status") == "new").select(self.id_col),
            self.id_col,
        )
        fresh = self._slice_assignments(fresh_vecs)
        inherited.unionByName(fresh).write.mode("overwrite").parquet(
            f"{self.root}/splits/batch_id={batch_id}"
        )
