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
    "write_sorted_for_skipping",
    "compact_parquet",
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


def write_sorted_for_skipping(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Range-clustered parquet layout for DATA SKIPPING.

    Parquet readers prune row groups (and whole files) whose column
    min/max statistics exclude the query predicate — but statistics
    only help if the data is CLUSTERED on the filtered column. A
    shuffle-partitioned write scatters every value range into every
    file (each file's min/max spans the whole domain → zero pruning).
    Range-repartition on the sort key + sort within partitions gives
    each output file a narrow, near-disjoint value range, so a
    selective filter reads a handful of files instead of all of them.
    At 100 TB this is the biggest read-side win after partitioning —
    the poor man's Z-order for single-dimension scan keys.

    (For TWO independent scan dimensions, partition by the coarse one
    and range-sort the fine one inside each partition — this helper
    handles the sort dimension; compose with ``write_parquet``'s
    ``partition_by`` layout upstream for the coarse key.)
    """
    parts = num_files or df.sparkSession.sparkContext.defaultParallelism
    (
        df.repartitionByRange(parts, *sort_cols)
        .sortWithinPartitions(*sort_cols)
        .write.mode(mode)
        .parquet(path)
    )


def compact_parquet(
    spark,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_cols: list[str] | None = None,
) -> int:
    """Small-file compaction — rewrite a parquet directory into
    ~``target_file_bytes`` files, returning the new file count.

    Streaming sinks and fine-grained partitioned writes accumulate
    thousands of tiny files; at scale each file costs a namenode/
    listing round-trip and a task, and row-group statistics degrade to
    per-tiny-file granularity. Compaction sizes output files from the
    MEASURED input bytes (never a guessed shuffle count), optionally
    restoring the range-cluster layout while it rewrites.

    Writes to ``<path>__compacting`` then swaps via two renames — this
    is CRASH-SAFE but NOT atomic: an in-process failure of the second
    rename restores the original (the ``except`` below), but a process
    death between the two renames leaves the dataset absent at ``path``
    with the original stranded at ``<path>__old``. Recovery after such
    a crash: ``mv <path>__old <path>`` (the compacted copy, if complete,
    is at ``<path>__compacting``). A truly atomic swap needs a
    current-pointer/symlink layout or a table format (Iceberg/Delta)
    rather than plain directories.

    Hive-partitioned inputs: partition COLUMNS are inferred on read and
    preserved as data columns, but the rewritten layout is flat — to
    keep the directory partitioning, compact each partition directory
    separately (the per-partition paths are what accumulate small files
    in practice anyway).
    """
    import pathlib
    import shutil

    src = pathlib.Path(path)
    total_bytes = sum(
        p.stat().st_size for p in src.rglob("*.parquet")
    )
    n_files = max(1, round(total_bytes / target_file_bytes))
    df = spark.read.parquet(path)
    tmp = str(src) + "__compacting"
    if sort_cols:
        (
            df.repartitionByRange(n_files, *sort_cols)
            .sortWithinPartitions(*sort_cols)
            .write.mode("overwrite")
            .parquet(tmp)
        )
    else:
        df.repartition(n_files).write.mode("overwrite").parquet(tmp)
    back = str(src) + "__old"
    shutil.move(str(src), back)
    try:
        shutil.move(tmp, str(src))
    except OSError:
        # second rename failed: put the original back so the source
        # path never dangles; the compacted copy stays in __compacting
        shutil.move(back, str(src))
        raise
    shutil.rmtree(back)
    return n_files
