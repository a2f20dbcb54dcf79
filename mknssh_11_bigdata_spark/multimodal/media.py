"""Multimodal columns: binary payloads, typed metadata, mapInPandas ops.

North-star extension (BASELINE.json): a 100 TB training-data pipeline
carries images/audio/video as opaque ``binary`` columns with typed
metadata and runs decode / feature-extraction / resize / frame-sampling
as Arrow-batched Python stages. The design contract here:

* **Schema**: ``payload: binary`` + ``media_meta: struct<media_type,
  format, width, height, n_frames, sample_rate>`` — metadata travels
  with the bytes so every stage can dispatch without sniffing payloads.
* **Execution**: all per-byte work is ``mapInPandas`` (Arrow batches,
  vectorized numpy inside; batch size bounded by
  ``spark.sql.execution.arrow.maxPartitionBytes`` /
  ``maxRecordsPerBatch``) — never row-at-a-time Python UDFs. Input
  partitioning is preserved: no shuffle is introduced by any op here;
  downstream aggs shuffle only their (tiny) feature rows.
* **Codecs**: real image/audio libraries (PIL, ffmpeg, torchaudio) are
  NOT in this environment. The ``raw8`` format — bytes are row-major
  uint8 grayscale pixels / uint8 PCM samples — is a *deterministic
  fake* codec so the plumbing is fully testable; any other format hits
  a clearly-marked ``NotImplementedError`` branch where a real codec
  would plug in. (The reference has no media handling at all —
  SURVEY.md §0; its binary-adjacent surface is Parquet I/O only,
  ``/root/reference/scripts/data_processing.py:377-386``.)
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

if TYPE_CHECKING:  # pandas only inside executors at runtime
    import pandas as pd

__all__ = [
    "MEDIA_META_TYPE",
    "attach_fake_media",
    "decode_media",
    "extract_media_features",
    "resize_raw8",
    "sample_frames",
]

#: Typed metadata carried alongside every binary payload.
MEDIA_META_TYPE = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("format", T.StringType()),  # raw8|jpeg|png|pcm16|…
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
    ]
)

#: Formats the deterministic fake codec can actually decode.
_DECODABLE = {"raw8"}


def _require_raw8(fmt: str) -> None:
    if fmt not in _DECODABLE:
        # STUB: a real pipeline plugs PIL/ffmpeg in right here. The
        # environment ships no media libs, so any non-fake format is an
        # explicit, loud failure instead of a silent wrong answer.
        raise NotImplementedError(
            f"codec for format={fmt!r} not available in this environment; "
            "only the deterministic 'raw8' fake codec is implemented"
        )


def attach_fake_media(
    df: DataFrame,
    id_col: str,
    text_col: str,
    media_type: str = "image",
    frame_size: int = 32,
) -> DataFrame:
    """Derive a deterministic media column from a text table: payload =
    UTF-8 bytes (opaque from here on), metadata typed as ``raw8``.

    This is the test harness's stand-in for a real ingest that reads
    image/audio files into ``binary``; every downstream op treats the
    payload as opaque bytes, so swapping in real media changes nothing
    but the ingest. Width×height tile = one ``frame_size``-byte frame
    (video framing for :func:`sample_frames`).
    """
    payload = F.encode(F.col(text_col), "UTF-8")
    n_bytes = F.octet_length(payload)
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit("raw8").alias("format"),
            F.lit(frame_size).cast("int").alias("width"),
            F.lit(1).cast("int").alias("height"),
            F.floor(n_bytes / frame_size).cast("int").alias("n_frames"),
            F.lit(8000).cast("int").alias("sample_rate"),
        ).alias("media_meta"),
    )


def decode_media(payload: bytes, fmt: str):
    """Decode a payload to a numpy uint8 array (the 'pixels'/'samples').

    ``raw8`` = bytes ARE the samples; anything else raises the
    clearly-marked stub. Used inside Arrow batches — one call per row,
    numpy-vectorized work after.
    """
    import numpy as np

    _require_raw8(fmt)
    return np.frombuffer(payload, dtype=np.uint8)


_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("mean_byte", T.DoubleType()),
        T.StructField("std_byte", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("entropy", T.DoubleType()),
    ]
)


def extract_media_features(
    df: DataFrame, id_col: str = "id"
) -> DataFrame:
    """Per-item payload features via ``mapInPandas``: byte count, mean,
    std, RMS (audio reading of the same bytes), byte-histogram entropy.

    Output schema is fixed (``_FEATURES_SCHEMA``); the heavy bytes stay
    executor-side and only ~48 B of features per item move on. At 100 TB
    this runs as a pure scan stage — no shuffle, partitioning preserved.
    """
    fmt_df = df.select(
        F.col(id_col).cast("long").alias("id"),
        "payload",
        F.col("media_meta.format").alias("fmt"),
    )

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in it:
            out = []
            for rid, payload, fmt in zip(
                pdf["id"], pdf["payload"], pdf["fmt"]
            ):
                arr = decode_media(payload, fmt).astype(np.float64)
                n = arr.size
                if n == 0:
                    out.append((rid, 0, 0.0, 0.0, 0.0, 0.0))
                    continue
                hist = np.bincount(
                    arr.astype(np.int64), minlength=256
                ) / float(n)
                nz = hist[hist > 0]
                entropy = float(-(nz * np.log2(nz)).sum())
                out.append(
                    (
                        rid,
                        int(n),
                        float(arr.mean()),
                        float(arr.std()),
                        float(np.sqrt((arr**2).mean())),
                        entropy,
                    )
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in _FEATURES_SCHEMA.fields]
            )

    return fmt_df.mapInPandas(batches, schema=_FEATURES_SCHEMA)


_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def resize_raw8(
    df: DataFrame, target_w: int, target_h: int, id_col: str = "id"
) -> DataFrame:
    """'Resize' raw8 images to ``target_w × target_h`` by nearest-
    neighbor index sampling (deterministic fake of a real resampler;
    same mapInPandas shape a PIL ``Image.resize`` batch would use).

    Short payloads are cyclically padded so the output length contract
    (``target_w*target_h`` bytes) always holds — schema-stable output.
    """
    fmt_df = df.select(
        F.col(id_col).cast("long").alias("id"),
        "payload",
        F.col("media_meta.format").alias("fmt"),
    )
    n_out = target_w * target_h

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in it:
            rows = []
            for rid, payload, fmt in zip(
                pdf["id"], pdf["payload"], pdf["fmt"]
            ):
                arr = decode_media(payload, fmt)
                if arr.size == 0:
                    resized = np.zeros(n_out, dtype=np.uint8)
                else:
                    idx = (
                        np.arange(n_out, dtype=np.int64) * arr.size
                    ) // n_out
                    resized = arr[idx % arr.size]
                rows.append((rid, resized.tobytes(), target_w, target_h))
            yield pd.DataFrame(
                rows, columns=[f.name for f in _RESIZE_SCHEMA.fields]
            )

    return fmt_df.mapInPandas(batches, schema=_RESIZE_SCHEMA)


_FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame, every_k: int = 4, id_col: str = "id"
) -> DataFrame:
    """Sample every k-th frame of a raw8 'video' (payload = n_frames
    frames of width×height bytes each; trailing partial frame dropped).

    One input row explodes to ceil(n_frames/k) output rows inside the
    Arrow batch — the flat-map shape a real ffmpeg frame sampler uses.
    Partitioning is preserved; no shuffle.
    """
    fmt_df = df.select(
        F.col(id_col).cast("long").alias("id"),
        "payload",
        F.col("media_meta.format").alias("fmt"),
        (F.col("media_meta.width") * F.col("media_meta.height")).alias(
            "frame_bytes"
        ),
    )

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            rows = []
            for rid, payload, fmt, fb in zip(
                pdf["id"], pdf["payload"], pdf["fmt"], pdf["frame_bytes"]
            ):
                arr = decode_media(payload, fmt)
                fb = int(fb)
                n_frames = arr.size // fb if fb > 0 else 0
                for fi in range(0, n_frames, every_k):
                    rows.append(
                        (rid, fi, arr[fi * fb : (fi + 1) * fb].tobytes())
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in _FRAMES_SCHEMA.fields]
            )

    return fmt_df.mapInPandas(batches, schema=_FRAMES_SCHEMA)
