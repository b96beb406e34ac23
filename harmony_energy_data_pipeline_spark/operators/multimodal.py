"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas UDFs
via ``mapInPandas``.

The Spark-side contract is fully real and tested — schemas, batch
iteration, partitioning, UDF signatures. The codec step itself is
STUBBED: this container has no image/audio libraries, so decode either
raises NotImplementedError (``strict=True``) or produces a
deterministic fake feature derived from the bytes (default) so the
distributed plumbing can be exercised end-to-end.

Scale notes: binary payloads ride in their own column so Parquet
column pruning skips them unless the query touches them; mapInPandas
streams Arrow record batches, so executor memory is bounded by batch
size (spark.sql.execution.arrow.maxRecordsPerBatch), not partition
size.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Typed metadata struct carried alongside every media payload.
MEDIA_META_SCHEMA = T.StructType([
    T.StructField("media_type", T.StringType()),   # image | audio | video
    T.StructField("format", T.StringType()),       # e.g. png, wav, mp4
    T.StructField("width", T.IntegerType()),       # images/video
    T.StructField("height", T.IntegerType()),
    T.StructField("n_bytes", T.LongType()),
])

FEATURE_DIM = 16
_DECODED_FIELDS = "id long, n_bytes long, sha256 string, feature array<float>"
_FRAMES_FIELDS = "id long, frame_idx int, frame_bytes binary"


def attach_media_meta(df: DataFrame, media_col: str, media_type: str, fmt: str) -> DataFrame:
    """Add the typed metadata struct for an opaque binary column.
    Width/height are unknown without decoding → null until a decoder
    fills them in."""
    return df.withColumn(
        f"{media_col}_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(fmt).alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.length(F.col(media_col)).cast("long").alias("n_bytes"),
        ),
    )


def _fake_feature(payload: bytes) -> list[float]:
    """Deterministic stand-in for a real decoder+encoder: 16 floats
    derived from the sha256 digest. Replace with PIL/torchvision etc.
    where available."""
    digest = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in digest[:FEATURE_DIM]]


def decode_features(
    df: DataFrame,
    id_col: str,
    media_col: str,
    strict: bool = False,
) -> DataFrame:
    """Decode + feature-extract each payload → (id, n_bytes, sha256,
    feature array<float>). The pandas UDF receives Arrow batches; only
    (id, media) columns are shipped to Python (select first = column
    pruning across the serialization boundary).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if strict:
            # Real decoder goes here (PIL / soundfile / av); not
            # available in this environment.
            raise NotImplementedError("media codecs not available in this container")
        for pdf in batches:
            payloads = pdf[media_col]
            yield pd.DataFrame({
                "id": pdf[id_col],
                "n_bytes": payloads.map(lambda b: len(b) if b is not None else 0).astype("int64"),
                "sha256": payloads.map(
                    lambda b: hashlib.sha256(b).hexdigest() if b is not None else None
                ),
                "feature": payloads.map(
                    lambda b: _fake_feature(b) if b is not None else None
                ),
            })

    return df.select(F.col(id_col), F.col(media_col)).mapInPandas(run, _DECODED_FIELDS)


def resize_images(
    df: DataFrame,
    id_col: str,
    media_col: str,
    width: int = 64,
    height: int = 64,
    strict: bool = False,
) -> DataFrame:
    """Image-resize stub: emits (id, width, height, resized binary).
    The real decoder+resampler (PIL) is unavailable in this container;
    the fake truncates/pads the payload to width*height bytes so the
    batch shapes, schema, and byte-budget semantics are exercised."""
    n_bytes = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if strict:
            raise NotImplementedError("image codecs not available in this container")
        for pdf in batches:
            payloads = pdf[media_col]
            yield pd.DataFrame({
                "id": pdf[id_col],
                "width": pd.array([width] * len(pdf), dtype="int32"),
                "height": pd.array([height] * len(pdf), dtype="int32"),
                "resized": payloads.map(
                    lambda b: bytes(b[:n_bytes]).ljust(n_bytes, b"\0")
                    if b is not None else None
                ),
            })

    return df.select(F.col(id_col), F.col(media_col)).mapInPandas(
        run, "id long, width int, height int, resized binary"
    )


def sample_frames(
    df: DataFrame,
    id_col: str,
    media_col: str,
    every_n: int = 10,
    frame_size: int = 64,
    strict: bool = False,
) -> DataFrame:
    """Frame-sampling stub for video payloads: emits every ``every_n``-th
    "frame" as a byte slice (a real implementation decodes with av/ffmpeg).
    Demonstrates the 1→N row fan-out shape of mapInPandas."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if strict:
            raise NotImplementedError("video codecs not available in this container")
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for _id, payload in zip(pdf[id_col], pdf[media_col]):
                if payload is None:
                    continue
                n_frames = max(len(payload) // frame_size, 1)
                for i in range(0, n_frames, every_n):
                    ids.append(_id)
                    idxs.append(i)
                    frames.append(bytes(payload[i * frame_size:(i + 1) * frame_size]))
            yield pd.DataFrame({"id": ids, "frame_idx": pd.array(idxs, dtype="int32"),
                                "frame_bytes": frames})

    return df.select(F.col(id_col), F.col(media_col)).mapInPandas(run, _FRAMES_FIELDS)


__all__ = [
    "MEDIA_META_SCHEMA", "FEATURE_DIM", "attach_media_meta",
    "decode_features", "resize_images", "sample_frames",
]
