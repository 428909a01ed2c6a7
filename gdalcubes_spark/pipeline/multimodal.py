"""Multimodal column operators: image/audio/video payloads as opaque binary
columns with typed metadata, processed by Arrow-batched mapInPandas.

What is REAL here: the Spark-side plumbing — schemas, batch shapes, UDF
signatures, partitioning — plus genuine decode for the formats our zlib codec
implements (raw/png/jpeg-stub) and genuine numpy resize / feature math.

What is STUBBED (this container ships no image/audio libs — no PIL/ffmpeg):
real JPEG/WebP decode, audio resample, video codecs — each raises
NotImplementedError behind a clearly marked seam, or uses the deterministic
fake (codecs.py) so pipelines remain end-to-end testable.
"""

from __future__ import annotations

from typing import Iterable, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from gdalcubes_spark import codecs


def _resize_nearest(a: np.ndarray, h2: int, w2: int) -> np.ndarray:
    nb, h, w = a.shape
    yi = (np.arange(h2) * h // h2).clip(0, h - 1)
    xi = (np.arange(w2) * w // w2).clip(0, w - 1)
    return a[:, yi[:, None], xi[None, :]]


def decode_features(images: DataFrame, resize: Tuple[int, int] = (8, 8)) -> DataFrame:
    """images (input_hint schema) → per-image features: decoded dims, band
    means/stds, a resized thumbnail (flattened), recomputed aHash."""
    h2, w2 = resize
    schema = T.StructType([
        T.StructField("image_id", T.StringType(), False),
        T.StructField("nb", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("band_means", T.ArrayType(T.DoubleType()), False),
        T.StructField("band_stds", T.ArrayType(T.DoubleType()), False),
        T.StructField("thumb", T.ArrayType(T.DoubleType()), False),
        T.StructField("ahash", T.LongType(), False),
    ])

    def gen(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                a = codecs.decode(bytes(row["bytes"]), row["fmt"]).astype("float64")
                th = _resize_nearest(a, h2, w2)
                rows.append(dict(image_id=row["image_id"], nb=a.shape[0], h=a.shape[1], w=a.shape[2],
                                 band_means=list(a.mean(axis=(1, 2))),
                                 band_stds=list(a.std(axis=(1, 2))),
                                 thumb=list(th.ravel()),
                                 ahash=codecs.phash64(a.astype(np.uint8))))
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields]) if rows else \
                pd.DataFrame({f.name: pd.Series(dtype="object") for f in schema.fields})

    return images.select("image_id", "bytes", "fmt").mapInPandas(gen, schema)


def translate_format(images: DataFrame, to_fmt: str) -> DataFrame:
    """Bulk re-encode of the image collection (image_collection_ops.h:28-36:
    translate_gtiff/translate_cog analogue) — decode + re-encode in Arrow
    batches, preserving metadata columns. Lossless for raw/png; the jpeg
    stub documents the lossy seam."""

    def gen(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            if len(pdf) == 0:
                yield pdf
                continue
            out = pdf.copy()
            payloads, fmts = [], []
            for _, row in pdf.iterrows():
                a = codecs.decode(bytes(row["bytes"]), row["fmt"])
                payloads.append(codecs.encode(a, to_fmt))
                fmts.append(to_fmt)
            out["bytes"] = payloads
            out["fmt"] = fmts
            yield out

    return images.mapInPandas(gen, images.schema)


OVERVIEW_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType(), False),
    T.StructField("level", T.IntegerType(), False),
    T.StructField("w", T.IntegerType(), False),
    T.StructField("h", T.IntegerType(), False),
    T.StructField("fmt", T.StringType(), False),
    T.StructField("bytes", T.BinaryType(), False),
])


def create_overviews(images: DataFrame, levels=(2, 4, 8), fmt: str = "png") -> DataFrame:
    """image_collection_ops::create_overviews analogue
    (image_collection_ops.h:28-36): per image, a pyramid of /2^k reductions
    via exact block-mean (the gdaladdo 'average' resampling), re-encoded with
    the in-repo codec. Distributed: one Arrow batch at a time, one output row
    per (image, level). Levels not dividing the image evenly truncate to the
    covered block grid (gdaladdo behavior)."""

    def gen(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                a = codecs.decode(bytes(row["bytes"]), row["fmt"]).astype("float64")
                nb, h, w = a.shape
                for lv in levels:
                    oh, ow = h // lv, w // lv
                    if oh < 1 or ow < 1:
                        continue
                    blocks = (a[:, : oh * lv, : ow * lv]
                              .reshape(nb, oh, lv, ow, lv).mean(axis=(2, 4)))
                    enc = codecs.encode(np.clip(np.rint(blocks), 0, 255).astype(np.uint8), fmt)
                    rows.append(dict(image_id=row["image_id"], level=int(lv),
                                     w=ow, h=oh, fmt=fmt, bytes=enc))
            yield pd.DataFrame(rows, columns=[f.name for f in OVERVIEW_SCHEMA.fields]) if rows else \
                pd.DataFrame({f.name: pd.Series(dtype="object") for f in OVERVIEW_SCHEMA.fields})

    return images.select("image_id", "bytes", "fmt").mapInPandas(gen, OVERVIEW_SCHEMA)


AUDIO_SCHEMA = T.StructType([
    T.StructField("clip_id", T.StringType(), False),
    T.StructField("n_samples", T.LongType(), False),
    T.StructField("rms", T.DoubleType(), False),
    T.StructField("zero_crossings", T.LongType(), False),
])


def audio_features(clips: DataFrame, sample_rate: int = 16000) -> DataFrame:
    """clips: (clip_id string, pcm binary) — pcm int16 little-endian mono.
    STUB SEAM: a real pipeline would decode mp3/flac here (no audio libs in
    this container); int16 PCM framing IS real and the feature math runs."""

    def gen(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                raw = bytes(row["pcm"])
                if raw[:4] in (b"fLaC", b"ID3\x03", b"OggS"):
                    raise NotImplementedError("compressed audio decode needs an audio lib (STUB)")
                x = np.frombuffer(raw, dtype="<i2").astype("float64") / 32768.0
                zc = int(np.sum(np.signbit(x[1:]) != np.signbit(x[:-1])))
                rows.append(dict(clip_id=row["clip_id"], n_samples=len(x),
                                 rms=float(np.sqrt(np.mean(x**2))) if len(x) else 0.0,
                                 zero_crossings=zc))
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_SCHEMA.fields]) if rows else \
                pd.DataFrame({f.name: pd.Series(dtype="object") for f in AUDIO_SCHEMA.fields})

    return clips.mapInPandas(gen, AUDIO_SCHEMA)


VIDEO_SCHEMA = T.StructType([
    T.StructField("video_id", T.StringType(), False),
    T.StructField("frame_idx", T.IntegerType(), False),
    T.StructField("frame_mean", T.DoubleType(), False),
])


def sample_frames(videos: DataFrame, every_n: int = 10) -> DataFrame:
    """videos: (video_id string, frames binary, w int, h int, n_frames int) —
    frames = concatenated uint8 greyscale planes (the deterministic fake
    container). STUB SEAM: real codecs (h264/vp9) need ffmpeg; the frame-
    sampling plumbing (explode one row per sampled frame) is real."""

    def gen(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                raw = bytes(row["frames"])
                if raw[:4] == b"\x00\x00\x00\x18" or raw[:3] == b"FLV":
                    raise NotImplementedError("real video decode needs ffmpeg (STUB)")
                w, h, n = int(row["w"]), int(row["h"]), int(row["n_frames"])
                plane = w * h
                for i in range(0, n, every_n):
                    f = np.frombuffer(raw, dtype=np.uint8, count=plane, offset=i * plane)
                    rows.append(dict(video_id=row["video_id"], frame_idx=i,
                                     frame_mean=float(f.mean())))
            yield pd.DataFrame(rows, columns=[f.name for f in VIDEO_SCHEMA.fields]) if rows else \
                pd.DataFrame({f.name: pd.Series(dtype="object") for f in VIDEO_SCHEMA.fields})

    return videos.mapInPandas(gen, VIDEO_SCHEMA)
