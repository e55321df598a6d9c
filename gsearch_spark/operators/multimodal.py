"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images are first-class in this engine (the whole pipeline); this module
adds the generic multimodal surface a training-data pipeline needs for
audio/video too: decode, resize/downsample, frame-sample, and
feature-extract as Arrow-batched ``mapInPandas`` stages over
``binary`` columns with typed metadata.

The REAL codecs (libjpeg/ffmpeg/soundfile) are not available in this
container; the Spark-side plumbing — schemas, UDF signatures, batch
shapes, partitioning — is real and tested, while codec calls route
through ``gsearch_spark.codec`` for the deterministic containers and
raise ``NotImplementedError`` for foreign formats (clearly-marked stub;
drop in Pillow/ffmpeg bindings to light them up).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from gsearch_spark.codec import decode_image, encode_image
from gsearch_spark.phash import _pool_to
from gsearch_spark.codec import to_gray

THUMB_SCHEMA = ("image_id string, thumb binary, tw int, th int, "
                "mean_luma double")
FEATURE_SCHEMA = "image_id string, feat array<float>, dim int"


def decode_resize_thumbnails(images: DataFrame, size: int = 16) -> DataFrame:
    """bytes -> fixed-size thumbnail bytes + luma stat (decode + resize).

    The canonical multimodal map stage: binary in, binary + metadata out,
    one Arrow batch at a time, decoded pixels never leave the task.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            thumbs, lumas = [], np.empty(n, dtype=np.float64)
            for i in range(n):
                px = decode_image(pdf["bytes"].iat[i])
                gray = to_gray(px)
                pooled = _pool_to(gray, size)
                lumas[i] = float(pooled.mean())
                small = np.clip(pooled, 0, 255).astype(np.uint8)
                rgb = np.stack([small] * 3, axis=-1)
                thumbs.append(encode_image(rgb, "png"))
            yield pd.DataFrame({
                "image_id": pdf["image_id"].to_numpy(),
                "thumb": thumbs,
                "tw": np.full(n, size, dtype=np.int32),
                "th": np.full(n, size, dtype=np.int32),
                "mean_luma": np.round(lumas, 6),
            })

    return images.select("image_id", "bytes").mapInPandas(
        run, schema=THUMB_SCHEMA)


def extract_features(images: DataFrame, dim: int = 64) -> DataFrame:
    """bytes -> dense float feature vector (pooled-luma grid), the hook a
    real pipeline would replace with a vision-model embedding UDF."""
    side = int(np.sqrt(dim))
    if side * side != dim:
        raise ValueError("dim must be a perfect square for the grid stub")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            feats = []
            for i in range(n):
                px = decode_image(pdf["bytes"].iat[i])
                pooled = _pool_to(to_gray(px), side).astype(np.float32)
                feats.append((pooled / 255.0).ravel())
            yield pd.DataFrame({
                "image_id": pdf["image_id"].to_numpy(),
                "feat": feats,
                "dim": np.full(n, dim, dtype=np.int32),
            })

    return images.select("image_id", "bytes").mapInPandas(
        run, schema=FEATURE_SCHEMA)


def sample_video_frames(videos: DataFrame, every_n: int = 30) -> DataFrame:
    """Frame-sampling plumbing for video binary columns.

    STUB: no video codec in this container.  The signature, schema and
    batch shape are the real contract; a real deployment drops ffmpeg
    bindings into ``_decode_frames``.
    """

    def _decode_frames(data: bytes, every_n: int) -> "list[bytes]":
        raise NotImplementedError(
            "video decoding requires ffmpeg bindings, not present in this "
            "container; plug a decoder into _decode_frames")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"video_id": [], "frame_no": [], "frame": []}
            for i in range(len(pdf)):
                frames = _decode_frames(pdf["bytes"].iat[i], every_n)
                for j, fr in enumerate(frames):
                    rows["video_id"].append(pdf["video_id"].iat[i])
                    rows["frame_no"].append(j * every_n)
                    rows["frame"].append(fr)
            yield pd.DataFrame(rows)

    return videos.select("video_id", "bytes").mapInPandas(
        run, schema="video_id string, frame_no int, frame binary")
