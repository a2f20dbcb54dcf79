"""Sinks.

Replaces ``save_dataset_parquet``
(``/root/reference/scripts/data_processing.py:377-386``, inventory S4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = [
    "write_parquet",
    "write_bucketed_table",
    "write_format",
]


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


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Bucketed (hash-clustered) managed-table sink.

    Two tables bucketed on the same join key with the same bucket count
    join WITHOUT a shuffle (SortMergeJoin reads co-located buckets) —
    at 100 TB this converts every recurring fact⋈fact join from a
    full-data exchange into a local merge, the biggest write-side win
    after partition pruning. ``sort_cols`` additionally pre-sorts each
    bucket, eliminating the join's sort step too.
    (Bucketing requires ``saveAsTable``; plain ``.parquet(path)`` drops
    bucket metadata.)
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table)


def write_format(
    df: DataFrame,
    path: str,
    fmt: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    options: dict[str, str] | None = None,
) -> None:
    """Generic sink for the non-parquet formats (json / orc / csv / avro —
    the connectors the reference lacked, SURVEY.md §2.1 "no other
    connectors").

    Format notes for scale:
    * ``orc`` — columnar like parquet; same pruning/pushdown properties.
    * ``json``/``csv`` — row formats, no pushdown, no types (csv) or
      slow parse (json): interchange only, never the analytic store.
    * ``avro`` — needs the external ``spark-avro`` package; callers
      should treat its absence as an environment gate.
    """
    writer = df.write.mode(mode).format(fmt)
    for k, v in (options or {}).items():
        writer = writer.option(k, v)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)
