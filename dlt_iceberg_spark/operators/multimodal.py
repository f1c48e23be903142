"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct
(modality, mime, width/height/duration, …).  The Spark-side mechanics —
schema, batching, partition sizing, Arrow transfer through ``mapInPandas``
— are real and tested.  Codec resolution is AUTODETECTED per executor:

- ``fake=True`` — deterministic content-derived stand-in (the oracle
  path: stable across runs/partitions, hash-checkable);
- ``fake=False`` — probe for PIL at execution time and decode/resize for
  real when it imports; raise NotImplementedError naming both routes
  (install Pillow, or use fake=True) when it doesn't.  This container
  ships neither PIL nor ffmpeg, so the real route is exercised by a
  skip-marked test that activates wherever Pillow exists.

Scale notes: binary payloads dominate row size, so operators here must
(1) never ship payloads through a shuffle — derive features first, then
shuffle the small features; (2) cap Arrow batch bytes via
``spark.sql.execution.arrow.maxRecordsPerBatch`` when rows are MB-sized.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_METADATA_TYPE = T.StructType(
    [
        T.StructField("modality", T.StringType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)


def attach_media_metadata(
    df: DataFrame, payload_col: str, modality: str, mime: str | None = None
) -> DataFrame:
    """Wrap a binary column with the typed metadata struct + content digest
    (digest enables exact dedup of media without re-shuffling payloads)."""
    return df.withColumns(
        {
            "media_meta": F.struct(
                F.lit(modality).alias("modality"),
                F.lit(mime).alias("mime"),
                F.lit(None).cast("int").alias("width"),
                F.lit(None).cast("int").alias("height"),
                F.lit(None).cast("long").alias("duration_ms"),
            ),
            "payload_sha": F.sha2(F.col(payload_col), 256),
            "payload_bytes": F.length(F.col(payload_col)).cast("long"),
        }
    )


_FEATURE_DIM = 16

IMAGE_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("payload_sha", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType(), False), False),
        T.StructField("decode_ok", T.BooleanType(), False),
    ]
)


def _fake_decode(payload: bytes) -> list[float]:
    """Deterministic stand-in for a real decoder: 16 floats derived from the
    sha256 digest — stable across runs/partitions, so tests can assert."""
    digest = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in digest[:_FEATURE_DIM]]


def _probe_pil():
    """PIL.Image if Pillow is importable HERE (called inside the UDF, so
    the probe answers for the executor actually decoding), else None."""
    try:
        from PIL import Image  # type: ignore

        return Image
    except ImportError:
        return None


_NO_CODEC_MSG = (
    "real image {op} requires Pillow (PIL), which this environment lacks — "
    "either install Pillow on the executors (the operator autodetects and "
    "uses it) or pass fake=True for the deterministic oracle-checkable "
    "stand-in"
)


def decode_image_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload", fake: bool = False
) -> DataFrame:
    """bytes → fixed-dim feature vector via Arrow-batched mapInPandas.

    ``fake=False`` autodetects Pillow per executor: real decodes produce a
    4×4 grayscale thumbnail's 16 pixel intensities (rows that fail to
    decode get ``decode_ok=False`` and a zero vector instead of failing
    the job — corrupt payloads are data, not errors, at corpus scale).
    Without Pillow it raises NotImplementedError naming both routes.  The
    plan, schema and batch plumbing are identical in every mode.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        Image = None if fake else _probe_pil()
        if not fake and Image is None:
            raise NotImplementedError(_NO_CODEC_MSG.format(op="decode"))

        def real_decode(payload: bytes) -> tuple[list[float], bool]:
            import io as _io

            try:
                img = Image.open(_io.BytesIO(payload)).convert("L").resize((4, 4))
                return [b / 255.0 for b in img.tobytes()], True
            except Exception:
                return [0.0] * _FEATURE_DIM, False

        for pdf in batches:
            if fake:
                feats = [(_fake_decode(p), True) for p in pdf[payload_col]]
            else:
                feats = [real_decode(bytes(p)) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "payload_sha": [
                        hashlib.sha256(p).hexdigest() for p in pdf[payload_col]
                    ],
                    "feature": [f for f, _ in feats],
                    "decode_ok": [ok for _, ok in feats],
                }
            )

    from dlt_iceberg_spark.operators.util import fan_out

    return fan_out(df.select(id_col, payload_col)).mapInPandas(run, IMAGE_FEATURE_SCHEMA)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    fake: bool = False,
) -> DataFrame:
    """bytes → resized-image bytes via Arrow-batched mapInPandas.

    The resize plumbing of an image-preprocessing stage: payloads stay
    inside their Arrow batch (never shuffled), output is one row per input
    with the target geometry and the re-encoded bytes.  ``fake=False``
    autodetects Pillow per executor — real path decodes, resizes to
    (width, height) grayscale and emits the raw pixel bytes (undecodable
    payloads yield zero bytes rather than failing the job); without
    Pillow it raises NotImplementedError naming both routes.
    ``fake=True`` substitutes a deterministic stand-in — the payload
    resampled by byte striding to exactly ``width*height`` bytes (cycling
    when upscaling) — so the Spark-side schema, batch shape, and row
    accounting are real and oracle-checkable while the codec is stubbed.

    Returns (id, width, height, orig_bytes, resized) with
    len(resized) == width*height always.
    """
    n_out = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        Image = None if fake else _probe_pil()
        if not fake and Image is None:
            raise NotImplementedError(_NO_CODEC_MSG.format(op="resize"))

        def real_resize(b: bytes) -> bytes:
            import io as _io

            try:
                return Image.open(_io.BytesIO(b)).convert("L").resize(
                    (width, height)
                ).tobytes()
            except Exception:
                return bytes(n_out)

        for pdf in batches:
            resized = []
            for p in pdf[payload_col]:
                b = bytes(p)
                if not fake:
                    resized.append(real_resize(b))
                elif not b:
                    resized.append(bytes(n_out))
                else:
                    resized.append(bytes(b[(i * len(b)) // n_out] for i in range(n_out)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "width": width,
                    "height": height,
                    "orig_bytes": [len(bytes(p)) for p in pdf[payload_col]],
                    "resized": resized,
                }
            )

    from dlt_iceberg_spark.operators.util import fan_out

    return fan_out(df.select(id_col, payload_col)).mapInPandas(
        run,
        "doc_id long, width int, height int, orig_bytes long, resized binary",
    )


def audio_windows(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    window_bytes: int = 1024,
    hop_bytes: int = 512,
    max_windows: int = 16,
) -> DataFrame:
    """Overlapping-window segmentation for audio-ish payloads — the STFT
    framing shape (window ``w``, hop ``h``): windows start at 0, h, 2h, …
    while a full window fits; payloads shorter than one window still emit
    one (truncated) window.  Pure map-side expressions: the payload never
    crosses a shuffle, and per-window work downstream (feature extraction,
    a real STFT UDF) fans out as rows.  ``max_windows`` caps the explode so
    a pathological hour-long payload cannot widen one input row into
    millions.

    Returns (id, window_idx, start_byte, window_len).
    """
    n = F.length(payload_col)
    full = F.floor((n - F.lit(window_bytes)) / F.lit(hop_bytes)).cast("long") + 1
    count = F.least(F.greatest(full, F.lit(1).cast("long")), F.lit(max_windows).cast("long"))
    idxs = F.sequence(F.lit(0).cast("long"), count - 1)
    return (
        df.select(
            F.col(id_col),
            n.alias("_n"),
            F.posexplode(idxs).alias("window_idx", "_i"),
        )
        .select(
            id_col,
            F.col("window_idx").cast("long").alias("window_idx"),
            (F.col("_i") * hop_bytes).alias("start_byte"),
            F.least(
                F.lit(window_bytes).cast("long"),
                F.col("_n") - F.col("_i") * hop_bytes,
            ).alias("window_len"),
        )
    )


def sample_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    every_n_bytes: int = 1024,
    max_frames: int = 8,
) -> DataFrame:
    """'Frame sampling' plumbing for video-ish payloads: emit up to
    ``max_frames`` byte-offset slices per payload (stand-in for keyframe
    extraction).  Demonstrates the explode-after-decode pattern where the
    payload never crosses a shuffle."""
    offsets = F.slice(
        F.sequence(F.lit(0), F.greatest((F.length(payload_col) / every_n_bytes).cast("int") - 1, F.lit(0))),
        1,
        max_frames,
    )
    return (
        df.select(
            F.col(id_col),
            F.posexplode(offsets).alias("frame_idx", "offset_idx"),
            F.substring(
                F.col(payload_col).cast("string"), 1, 32
            ).alias("frame_preview"),
        )
        .withColumn("byte_offset", F.col("offset_idx") * every_n_bytes)
        .drop("offset_idx")
    )
