"""Streaming deduplication — the ingest-time twin of the batch dedup
family (operators/dedup.py).

An LLM-data pipeline ingesting crawl/event streams needs duplicates
dropped BEFORE they land in the corpus, not in a nightly batch pass.
Spark's ``dropDuplicatesWithinWatermark`` keeps per-key state only until
the watermark passes (state O(keys within the watermark horizon), not
O(stream)), which is the only formulation that survives an unbounded
stream — a plain ``dropDuplicates`` on a stream accumulates state
forever.

Batch/stream-agnostic contract like the rest of streaming/: on a static
frame the same call degrades to exact ``dropDuplicates`` (the watermark
is a no-op marker), so batch output certifies the semantics
(tests/test_streaming_dedup.py) and the ``event_stream_dedup`` query
oracle-checks the batch side against DISTINCT.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame

__all__ = ["dedup_stream"]


def dedup_stream(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Drop duplicate rows by ``keys`` with watermark-bounded state.

    Rows whose key was already seen within the watermark horizon are
    dropped; a duplicate arriving later than ``watermark`` after the
    original may pass (the price of bounded state — size the horizon to
    the stream's real duplicate window, e.g. retry storms are seconds,
    crawler revisits are hours). Output rows are restricted to the key
    columns plus ``ts_col``: with unrestricted payload columns, WHICH
    physical row survives is arrival-order-dependent on a stream —
    keying the projection makes the operator deterministic.
    """
    cols = [*keys, ts_col]
    pruned = df.select(*cols)
    if df.isStreaming:
        return pruned.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            list(keys)
        )
    # Static twin: ts_col is excluded from the dedup key on streams (any
    # ts within the horizon counts as the same key), so mirror that by
    # keeping the EARLIEST ts per key — deterministic and
    # oracle-expressible (GROUP BY keys, MIN(ts)).
    from pyspark.sql import functions as F

    return pruned.groupBy(*keys).agg(F.min(ts_col).alias(ts_col))
