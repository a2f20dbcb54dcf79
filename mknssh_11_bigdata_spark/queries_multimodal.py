"""Multimodal-column queries: binary payload profiling, frame sampling,
media feature extraction over Arrow-batched mapInPandas stages.

The ``documents`` table stands in for a media ingest: payload = UTF-8
bytes (opaque downstream), metadata typed as the fake ``raw8`` codec
(multimodal/media.py). Byte-length-level results are hash-checked
against DuckDB (``octet_length(encode(text))`` reproduces the payload
sizes exactly); per-byte numeric features are rows-only at the driver
and value-checked against numpy in tests/test_multimodal.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .multimodal.media import (
    attach_fake_media,
    extract_media_features,
    sample_frames,
)
from .registry import register
from .sources.readers import load_table

FRAME_SIZE = 32
FRAME_STRIDE = 4


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    return attach_fake_media(
        load_table(spark, sf_dir, "documents"),
        id_col="doc_id",
        text_col="text",
        media_type="video",
        frame_size=FRAME_SIZE,
    )


@register(
    "multimodal_payload_profile",
    """
    WITH m AS (
        SELECT source, octet_length(encode(text)) AS n_bytes
        FROM documents
    )
    SELECT source,
           COUNT(*) AS n_items,
           CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
           CAST(MIN(n_bytes) AS BIGINT) AS min_bytes,
           CAST(MAX(n_bytes) AS BIGINT) AS max_bytes
    FROM m GROUP BY source
    """,
)
def multimodal_payload_profile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-source payload profile, with byte counts produced by the
    mapInPandas feature extractor (not a SQL shortcut) — proves the
    binary plumbing end-to-end, then aggregates ~48 B/item feature rows.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    feats = extract_media_features(_media(spark, sf_dir), id_col="doc_id")
    return (
        feats.join(docs, feats.id == docs.doc_id)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("n_bytes").alias("total_bytes"),
            F.min("n_bytes").alias("min_bytes"),
            F.max("n_bytes").alias("max_bytes"),
        )
    )


@register(
    "multimodal_frame_sample",
    f"""
    WITH b AS (
        SELECT doc_id AS id,
               CAST(floor(octet_length(encode(text)) / {FRAME_SIZE})
                    AS INTEGER) AS nf
        FROM documents
    )
    SELECT id,
           CAST(unnest(range(0, nf, {FRAME_STRIDE})) AS INTEGER)
               AS frame_idx,
           {FRAME_SIZE} AS n_frame_bytes
    FROM b WHERE nf > 0
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every 4th fixed-size frame of each 'video' payload, via the
    mapInPandas flat-map sampler. The oracle reproduces the framing
    arithmetic (frame count, sampled indices, frame byte length);
    frame *content* equality is asserted in tests/test_multimodal.py."""
    frames = sample_frames(
        _media(spark, sf_dir), every_k=FRAME_STRIDE, id_col="doc_id"
    )
    return frames.select(
        "id",
        "frame_idx",
        F.octet_length("frame").cast("int").alias("n_frame_bytes"),
    )


@register("multimodal_media_features", None)  # per-byte math: rows-only
def multimodal_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-item decoded-byte features (mean/std/RMS/entropy) — per-byte
    folds aren't SQL-expressible over blobs in the oracle engine, so the
    driver records rows-only; numeric correctness is numpy-checked in
    tests/test_multimodal.py."""
    feats = extract_media_features(_media(spark, sf_dir), id_col="doc_id")
    return feats.select(
        "id",
        "n_bytes",
        F.round("mean_byte", 6).alias("mean_byte"),
        F.round("std_byte", 6).alias("std_byte"),
        F.round("rms", 6).alias("rms"),
        F.round("entropy", 6).alias("entropy"),
    )


@register(
    "multimodal_payload_dedup",
    """
    SELECT md5(text) AS payload_md5,
           CAST(COUNT(*) AS BIGINT) AS n_copies,
           MIN(doc_id) AS keeper_id
    FROM documents
    GROUP BY 1 HAVING COUNT(*) >= 2
    """,
)
def multimodal_payload_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact BINARY-payload dedup — the first pass of every multimodal
    curation pipeline (identical image/audio files re-crawled under
    different ids): content-hash the opaque payload bytes, group, keep
    the min id. One JVM-side md5 per payload at scan speed; the
    shuffle carries (16-byte hash, id) pairs, never payload bytes —
    the same never-shuffle-payloads rule as every op in
    multimodal/media.py.

    The oracle hashes the text the fake payload derives from
    (payload = UTF-8 bytes of text, attach_fake_media), so DuckDB's
    md5(VARCHAR) over the string equals Spark's md5 over the bytes."""
    m = _media(spark, sf_dir)
    return (
        m.select("doc_id", F.md5(F.col("payload")).alias("payload_md5"))
        .groupBy("payload_md5")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_copies"),
            F.min("doc_id").alias("keeper_id"),
        )
        .filter(F.col("n_copies") >= 2)
    )
