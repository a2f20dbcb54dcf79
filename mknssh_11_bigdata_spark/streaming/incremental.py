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

At 100 TB the corpus-side fingerprint and band indexes would be
persisted tables maintained alongside the corpus (the operator
recomputes them per batch here, which is correct but re-reads the
corpus — the artifact-maintenance step is sketched in the docstring of
``incremental_dedup_status``)."""

from __future__ import annotations

import pathlib

from pyspark.sql import DataFrame, SparkSession

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
        return (
            spark.read.option("basePath", base).parquet(*present)
        ).drop("batch_id")

    def statuses(self, spark: SparkSession) -> DataFrame:
        """Every committed batch's routing ledger."""
        base = f"{self.root}/status"
        paths = [
            f"{base}/batch_id={b}" for b in sorted(self.committed_batches())
        ]
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
