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
    how: str = "inner",
) -> DataFrame:
    """Join right rows to left rows with the same keys where
    ``right_ts ∈ [left_ts − lookback, left_ts]`` (e.g. every purchase to
    the clicks that preceded it within the attribution window).

    On streaming inputs both sides get ``watermark`` (required by Spark
    for state cleanup on inner interval joins); state per key is bounded
    by watermark delay + lookback. On static frames the same expressions
    plan as a range join.

    ``how='left_outer'`` keeps unmatched left rows (right columns NULL).
    Streaming semantics: Spark emits the NULL-padded row only after the
    watermark passes the join window — a correctness/latency trade
    inherent to outer stream-stream joins, and the reason ``watermark``
    is mandatory for outer mode on streams.
    """
    if how not in ("inner", "left_outer", "leftOuter"):
        raise ValueError(f"unsupported interval-join type {how!r}")
    if watermark is None and how != "inner" and (
        left.isStreaming or right.isStreaming
    ):
        raise ValueError("outer stream-stream interval join needs a watermark")
    if watermark is not None:
        if left.isStreaming:
            left = left.withWatermark(left_ts, watermark)
        if right.isStreaming:
            right = right.withWatermark(right_ts, watermark)
    # Rename right-side keys before joining: when both sides derive from
    # the SAME source frame (self-join, e.g. purchases vs clicks of one
    # events table), left[k]/right[k] references are ambiguous and a
    # drop() can remove the wrong one — renaming sidesteps plan-id
    # resolution entirely.
    renamed = right
    for k in keys:
        renamed = renamed.withColumnRenamed(k, f"__r_{k}")
    cond = F.lit(True)
    for k in keys:
        cond = cond & (left[k] == renamed[f"__r_{k}"])
    cond = (
        cond
        & (renamed[right_ts] <= left[left_ts])
        & (
            renamed[right_ts]
            >= left[left_ts] - F.expr(f"INTERVAL {lookback}")
        )
    )
    joined = left.join(renamed, cond, how)
    return joined.drop(*[f"__r_{k}" for k in keys])
