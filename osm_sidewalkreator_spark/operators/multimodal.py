"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct;
decode / feature-extraction / resize / frame-sampling run as Arrow-
batched ``mapInPandas`` stages. The actual codec work is STUBBED (no
image/audio libraries in this environment — the decode seam raises
``NotImplementedError`` unless the deterministic fake is requested);
the Spark-side contract — schema, batch iteration, partitioning — is
real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("media_type", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("feat_mean", T.DoubleType()),
    T.StructField("feat_std", T.DoubleType()),
    T.StructField("width_px", T.IntegerType()),
    T.StructField("height_px", T.IntegerType()),
])


def decode_media(payload: bytes, media_type: str, use_fake: bool):
    """Decode seam. Real codecs are unavailable in this container;
    ``use_fake`` substitutes a deterministic byte-statistics pseudo-image
    so the distributed plumbing can be exercised end to end."""
    if not use_fake:
        raise NotImplementedError(
            "media codecs (PIL/ffmpeg) are not installed in this "
            "environment; pass use_fake=True for the deterministic stub")
    arr = np.frombuffer(payload, dtype=np.uint8)
    side = max(1, int(np.sqrt(len(arr))))
    return arr[: side * side].reshape(side, side)


def extract_media_features(df: DataFrame, payload_col: str = "html",
                           media_type: str = "image/fake",
                           use_fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction over a binary column.

    Batch shape: Iterator[pd.DataFrame] -> Iterator[pd.DataFrame]; one
    output row per input row; Arrow transfers the binary payloads.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, payload in zip(pdf["url"], pdf[payload_col]):
                img = decode_media(bytes(payload), media_type, use_fake)
                rows.append((url, media_type, len(payload),
                             float(img.mean()), float(img.std()),
                             img.shape[1], img.shape[0]))
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              MEDIA_META_SCHEMA])

    return df.select("url", payload_col).mapInPandas(run, MEDIA_META_SCHEMA)


def media_byte_stats(df: DataFrame, payload_col: str = "html") -> DataFrame:
    """Payload accounting without decode: JVM-side only."""
    return df.select(
        "url", F.length(F.col(payload_col)).alias("n_bytes"),
        F.crc32(F.col(payload_col)).alias("payload_crc32"))


RESIZED_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("width_px", T.IntegerType()),
    T.StructField("height_px", T.IntegerType()),
    T.StructField("pixels", T.BinaryType()),
])


def resize_media(df: DataFrame, target: int = 8,
                 payload_col: str = "html",
                 media_type: str = "image/fake",
                 use_fake: bool = True) -> DataFrame:
    """Resize stage: decode -> block-mean downsample to ``target`` x
    ``target`` -> re-emit raw pixels as a binary column (the shape a
    training-data pipeline feeds to an embedding model). Pure NumPy on
    the fake-decode path; the codec seam is the same honest stub."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, payload in zip(pdf["url"], pdf[payload_col]):
                img = decode_media(bytes(payload), media_type, use_fake)
                side = img.shape[0]
                k = max(1, -(-side // target))  # ceil: out side <= target
                crop = img[: (side // k) * k, : (side // k) * k]
                small = crop.reshape(crop.shape[0] // k, k,
                                     crop.shape[1] // k, k) \
                    .mean(axis=(1, 3)).astype(np.uint8)
                rows.append((url, small.shape[1], small.shape[0],
                             small.tobytes()))
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              RESIZED_SCHEMA])

    return df.select("url", payload_col).mapInPandas(run, RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("feat_mean", T.DoubleType()),
    T.StructField("feat_std", T.DoubleType()),
])


def sample_video_frames(df: DataFrame, every_n: int = 4,
                        n_frames: int = 16,
                        payload_col: str = "html",
                        use_fake: bool = True) -> DataFrame:
    """Frame-sampling stage (one input row -> many frame rows): the
    fake 'video' splits the payload into ``n_frames`` equal chunks;
    every ``every_n``-th frame is decoded and featurized. Exercises the
    one-to-many ``mapInPandas`` contract real video sampling needs
    (ffmpeg seam stubbed like ``decode_media``)."""
    if not use_fake:
        raise NotImplementedError(
            "video codecs are not installed in this environment; "
            "pass use_fake=True for the deterministic stub")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, payload in zip(pdf["url"], pdf[payload_col]):
                b = bytes(payload)
                step = max(1, len(b) // n_frames)
                for fi in range(0, n_frames, every_n):
                    chunk = b[fi * step: (fi + 1) * step]
                    if not chunk:
                        continue
                    arr = np.frombuffer(chunk, dtype=np.uint8)
                    rows.append((url, fi, float(arr.mean()),
                                 float(arr.std())))
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              FRAME_SCHEMA])

    return df.select("url", payload_col).mapInPandas(run, FRAME_SCHEMA)
