"""Partition-layout helpers.

The "small input, large intermediate" problem: a compact table (one
parquet file → one input split) that EXPLODES downstream (shingling
multiplies rows ~300×, a crossJoin multiplies by the query count) leaves
all that work in a single task. ``spark.sql.files.maxPartitionBytes``
can't help — it splits bytes, not future work. The fix is an explicit
repartition between the scan and the expansion: the shuffle moves the
small compact rows (cheap), the expansion then runs at full parallelism.

At 100 TB the same call remains correct: repartitioning by the id column
balances skewed documents, and AQE coalesces if the estimate overshoots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["spread"]


def spread(df: DataFrame, *cols: str, factor: int = 1) -> DataFrame:
    """Repartition to cluster parallelism (× factor) before a
    row-multiplying operator (explode / crossJoin / heavy per-row expr) —
    but ONLY if the input is under-partitioned. At real scale the scan
    already yields ≫ cores splits and the repartition would be a wasted
    shuffle; the no-op branch keeps the operator scale-correct.

    With ``cols``, hash-partitions on them (keeps same-key rows together
    for a downstream groupBy on the same key); otherwise round-robin.
    """
    n = df.sparkSession.sparkContext.defaultParallelism * factor
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n, *cols) if cols else df.repartition(n)
