"""Stream-stream joins with watermark-bounded state.

Batch/stream-agnostic builder (same contract as streaming/windows.py):
the interval-join expressions are identical for static and streaming
frames; on streams Spark plans a symmetric stateful join whose buffers
are bounded by the two watermarks + the interval width — without them a
stream-stream join's state grows forever, which is THE scale constraint
for joins at 100 TB/day ingest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["interval_join"]


def interval_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    lookback: str,
    watermark: str | None = None,
) -> DataFrame:
    """Join right rows to left rows with the same keys where
    ``right_ts ∈ [left_ts − lookback, left_ts]`` (e.g. every purchase to
    the clicks that preceded it within the attribution window).

    On streaming inputs both sides get ``watermark`` (required by Spark
    for state cleanup on inner interval joins); state per key is bounded
    by watermark delay + lookback. On static frames the same expressions
    plan as a range join.
    """
    if watermark is not None:
        if left.isStreaming:
            left = left.withWatermark(left_ts, watermark)
        if right.isStreaming:
            right = right.withWatermark(right_ts, watermark)
    cond = F.lit(True)
    for k in keys:
        cond = cond & (left[k] == right[k])
    cond = (
        cond
        & (right[right_ts] <= left[left_ts])
        & (
            right[right_ts]
            >= left[left_ts] - F.expr(f"INTERVAL {lookback}")
        )
    )
    joined = left.join(right, cond, "inner")
    # de-duplicate key columns (keep left's)
    return joined.drop(*[right[k] for k in keys])
