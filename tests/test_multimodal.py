"""Multimodal column plumbing: schema, Arrow batch shape, deterministic
fake-codec semantics, and numpy-verified per-byte math."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from mknssh_11_bigdata_spark.multimodal.media import (
    MEDIA_META_TYPE,
    attach_fake_media,
    decode_media,
    extract_media_features,
    resize_raw8,
    sample_frames,
)

TEXTS = [
    (1, "abcdefgh" * 20),  # 160 bytes = 5 full 32-byte frames
    (2, "xyz"),  # 3 bytes: shorter than one frame
    (3, ""),  # empty payload
    (4, "Ω" * 50),  # non-ASCII: 100 UTF-8 bytes
]


@pytest.fixture()
def media(spark):
    df = spark.createDataFrame(TEXTS, ["doc_id", "text"])
    return attach_fake_media(
        df, id_col="doc_id", text_col="text", media_type="video",
        frame_size=32,
    )


def test_media_schema(media):
    assert dict(media.dtypes)["payload"] == "binary"
    got = media.schema["media_meta"].dataType
    assert [(f.name, f.dataType) for f in got.fields] == [
        (f.name, f.dataType) for f in MEDIA_META_TYPE.fields
    ]


def test_payload_is_utf8_bytes(media):
    rows = {r.doc_id: r for r in media.collect()}
    assert bytes(rows[1].payload) == ("abcdefgh" * 20).encode()
    assert bytes(rows[4].payload) == ("Ω" * 50).encode()
    assert rows[1].media_meta.n_frames == 5
    assert rows[2].media_meta.n_frames == 0


def test_decode_media_rejects_real_codecs():
    with pytest.raises(NotImplementedError, match="jpeg"):
        decode_media(b"\xff\xd8\xff", "jpeg")


def test_extract_media_features_matches_numpy(media):
    feats = {
        r.id: r for r in extract_media_features(media, id_col="doc_id").collect()
    }
    for doc_id, text in TEXTS:
        arr = np.frombuffer(text.encode(), dtype=np.uint8).astype(float)
        got = feats[doc_id]
        assert got.n_bytes == arr.size
        if arr.size == 0:
            assert got.mean_byte == 0.0 and got.entropy == 0.0
            continue
        assert got.mean_byte == pytest.approx(arr.mean())
        assert got.std_byte == pytest.approx(arr.std())
        assert got.rms == pytest.approx(math.sqrt((arr**2).mean()))
        hist = np.bincount(arr.astype(int), minlength=256) / arr.size
        nz = hist[hist > 0]
        assert got.entropy == pytest.approx(float(-(nz * np.log2(nz)).sum()))


def test_resize_raw8_length_contract_and_nn_sampling(media):
    out = {r.id: r for r in resize_raw8(media, 4, 4, id_col="doc_id").collect()}
    assert all(len(bytes(r.payload)) == 16 for r in out.values())
    # exact nearest-neighbor indices for the 160-byte payload
    src = np.frombuffer(("abcdefgh" * 20).encode(), dtype=np.uint8)
    idx = (np.arange(16, dtype=np.int64) * src.size) // 16
    assert bytes(out[1].payload) == src[idx].tobytes()
    # empty payload resizes to zeros, not an error
    assert bytes(out[3].payload) == bytes(16)


def test_sample_frames_byte_equality(media):
    frames = sample_frames(media, every_k=4, id_col="doc_id").collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r.id, {})[r.frame_idx] = bytes(r.frame)
    payload = ("abcdefgh" * 20).encode()
    # 5 full frames -> sampled indices 0 and 4
    assert sorted(by_doc[1]) == [0, 4]
    assert by_doc[1][0] == payload[0:32]
    assert by_doc[1][4] == payload[128:160]
    # sub-frame and empty payloads yield no frames
    assert 2 not in by_doc and 3 not in by_doc
    # non-ASCII doc: 100 bytes -> 3 full frames -> index 0 only
    assert sorted(by_doc[4]) == [0]


def test_mapinpandas_preserves_partitioning(media):
    df = media.repartition(3)
    feats = extract_media_features(df, id_col="doc_id")
    assert feats.rdd.getNumPartitions() == 3
