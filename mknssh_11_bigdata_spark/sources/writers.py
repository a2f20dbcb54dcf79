"""Sinks.

Replaces ``save_dataset_parquet``
(``/root/reference/scripts/data_processing.py:377-386``, inventory S4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["write_parquet"]


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    compression: str = "snappy",
) -> None:
    """Parquet sink.

    ``partition_by`` enables partition pruning for downstream readers —
    at 100 TB, partitioning the fact tables by a low-cardinality scan key
    (e.g. date) is the single biggest read-side win.
    """
    writer = df.write.mode(mode).option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
