"""Multimodal column operators: image/audio/video payloads as opaque binary
columns with typed metadata, processed by Arrow-batched mapInPandas.

What is REAL here: the Spark-side plumbing — schemas, batch shapes, UDF
signatures, partitioning — plus genuine decode for every format the codec
layer implements (raw / png / jpeg baseline+progressive / tiled GeoTIFF /
webp VP8L+VP8+ALPH / gif incl. animation) and genuine numpy resize /
feature / FFT math.  Frame sampling over animated GIF/WebP
(sample_animation_frames) is fully real.

What is STUBBED (this container ships no av libs — no ffmpeg): compressed
audio (mp3/flac) and video codecs (h264/vp9) — each raises
NotImplementedError behind a clearly marked seam, or uses the deterministic
fake so pipelines remain end-to-end testable.
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
            for iid, payload, fmt in zip(pdf["image_id"].to_numpy(),
                                         pdf["bytes"].to_numpy(),
                                         pdf["fmt"].to_numpy()):
                a = codecs.decode(bytes(payload), fmt).astype("float64")
                th = _resize_nearest(a, h2, w2)
                rows.append(dict(image_id=iid, nb=a.shape[0], h=a.shape[1], w=a.shape[2],
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
    batches, preserving metadata columns. Lossless targets: raw / png /
    tif / webp (VP8L) / bmp; lossy: jpeg (DCT) and gif beyond 256
    colors (median-cut palette)."""

    def gen(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            if len(pdf) == 0:
                yield pdf
                continue
            out = pdf.copy()
            payloads = [codecs.encode(codecs.decode(bytes(pl), fm), to_fmt)
                        for pl, fm in zip(pdf["bytes"].to_numpy(), pdf["fmt"].to_numpy())]
            out["bytes"] = payloads
            out["fmt"] = [to_fmt] * len(pdf)
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
            for iid, payload, fmt_in in zip(pdf["image_id"].to_numpy(),
                                            pdf["bytes"].to_numpy(),
                                            pdf["fmt"].to_numpy()):
                a = codecs.decode(bytes(payload), fmt_in).astype("float64")
                nb, h, w = a.shape
                for lv in levels:
                    oh, ow = h // lv, w // lv
                    if oh < 1 or ow < 1:
                        continue
                    blocks = (a[:, : oh * lv, : ow * lv]
                              .reshape(nb, oh, lv, ow, lv).mean(axis=(2, 4)))
                    enc = codecs.encode(np.clip(np.rint(blocks), 0, 255).astype(np.uint8), fmt)
                    rows.append(dict(image_id=iid, level=int(lv),
                                     w=ow, h=oh, fmt=fmt, bytes=enc))
            yield pd.DataFrame(rows, columns=[f.name for f in OVERVIEW_SCHEMA.fields]) if rows else \
                pd.DataFrame({f.name: pd.Series(dtype="object") for f in OVERVIEW_SCHEMA.fields})

    return images.select("image_id", "bytes", "fmt").mapInPandas(gen, OVERVIEW_SCHEMA)


# ------------------------------------------------------------------ wav
# Real RIFF/WAVE container (public Microsoft/IBM spec): PCM int16 and IEEE
# float32, any channel count — the honest part of the audio pipeline is no
# longer headerless PCM but genuine .wav bytes any tool plays. Compressed
# codecs (mp3/flac/ogg) remain the documented stub seam.

def encode_wav(x: np.ndarray, rate: int = 16000) -> bytes:
    """(n,) or (channels, n) int16 or float32 → RIFF/WAVE bytes."""
    import struct
    x = np.asarray(x)
    if x.ndim == 1:
        x = x[None]
    ch, n = x.shape
    if x.dtype == np.int16:
        fmt_code, bits = 1, 16
    elif x.dtype == np.float32:
        fmt_code, bits = 3, 32
    else:
        raise ValueError("wav supports int16 (PCM) or float32 (IEEE float)")
    inter = np.ascontiguousarray(x.T)  # (n, ch) interleaved frames
    data = inter.astype(x.dtype.newbyteorder("<")).tobytes()
    block = ch * bits // 8
    fmt = struct.pack("<HHIIHH", fmt_code, ch, rate, rate * block, block, bits)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(b: bytes):
    """RIFF/WAVE bytes → ((channels, n) array, rate). PCM16 / float32 only;
    other codecs raise (the stub seam)."""
    import struct
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, fmt_code, ch, rate, bits, data = 12, None, None, None, None, None
    while pos + 8 <= len(b):
        cid = b[pos:pos + 4]
        (ln,) = struct.unpack_from("<I", b, pos + 4)
        payload = b[pos + 8: pos + 8 + ln]
        if cid == b"fmt ":
            fmt_code, ch, rate, _br, _ba, bits = struct.unpack_from("<HHIIHH", payload, 0)
        elif cid == b"data":
            data = payload
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
    if fmt_code is None or data is None:
        raise ValueError("malformed wav: missing fmt/data chunk")
    if fmt_code == 1 and bits == 16:
        arr = np.frombuffer(data, dtype="<i2")
    elif fmt_code == 3 and bits == 32:
        arr = np.frombuffer(data, dtype="<f4")
    else:
        raise NotImplementedError(f"wav format {fmt_code}/{bits}-bit needs an audio lib (STUB)")
    return arr.reshape(-1, ch).T.copy(), rate


AUDIO_SCHEMA = T.StructType([
    T.StructField("clip_id", T.StringType(), False),
    T.StructField("n_samples", T.LongType(), False),
    T.StructField("rms", T.DoubleType(), False),
    T.StructField("zero_crossings", T.LongType(), False),
    T.StructField("spectral_centroid_hz", T.DoubleType(), False),
    T.StructField("dominant_hz", T.DoubleType(), False),
])


def audio_features(clips: DataFrame, sample_rate: int = 16000) -> DataFrame:
    """clips: (clip_id string, pcm binary) — raw int16 little-endian mono
    PCM, or a genuine RIFF/WAVE container (decode_wav: PCM16/float32, any
    channel count — multichannel is downmixed). STUB SEAM only for
    compressed codecs: mp3/flac/ogg need an audio lib this container lacks;
    the container parsing and feature math are real."""

    def gen(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            rows = []
            for cid, payload in zip(pdf["clip_id"].to_numpy(),
                                    pdf["pcm"].to_numpy()):
                raw = bytes(payload)
                if raw[:4] in (b"fLaC", b"ID3\x03", b"OggS"):
                    raise NotImplementedError("compressed audio decode needs an audio lib (STUB)")
                if raw[:4] == b"RIFF":  # genuine .wav container (decode_wav)
                    chans, sr = decode_wav(raw)  # container rate WINS over
                    x = chans.astype("float64").mean(axis=0)  # the argument
                    if chans.dtype == np.int16:
                        x = x / 32768.0
                else:
                    x = np.frombuffer(raw, dtype="<i2").astype("float64") / 32768.0
                    sr = sample_rate  # headerless PCM: caller-declared rate
                zc = int(np.sum(np.signbit(x[1:]) != np.signbit(x[:-1])))
                # spectral features via rFFT (magnitude-weighted mean and
                # argmax frequency; DC bin excluded so silence/offset clips
                # report 0 rather than a spurious 0 Hz "tone")
                if len(x) >= 4:
                    mag = np.abs(np.fft.rfft(x))[1:]
                    freqs = np.fft.rfftfreq(len(x), d=1.0 / sr)[1:]
                    tot = float(mag.sum())
                    centroid = float((freqs * mag).sum() / tot) if tot > 0 else 0.0
                    dominant = float(freqs[int(np.argmax(mag))]) if tot > 0 else 0.0
                else:
                    centroid = dominant = 0.0
                rows.append(dict(clip_id=cid, n_samples=len(x),
                                 rms=float(np.sqrt(np.mean(x**2))) if len(x) else 0.0,
                                 zero_crossings=zc,
                                 spectral_centroid_hz=round(centroid, 3),
                                 dominant_hz=round(dominant, 3)))
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_SCHEMA.fields]) if rows else \
                pd.DataFrame({f.name: pd.Series(dtype="object") for f in AUDIO_SCHEMA.fields})

    return clips.mapInPandas(gen, AUDIO_SCHEMA)


AUDIO_INFO_SCHEMA = T.StructType([
    T.StructField("clip_id", T.StringType(), False),
    T.StructField("container", T.StringType(), False),
    T.StructField("sample_rate", T.IntegerType(), False),
    T.StructField("channels", T.IntegerType(), False),
    T.StructField("bits_per_sample", T.IntegerType(), False),
    T.StructField("n_frames", T.IntegerType(), False),
    T.StructField("n_samples", T.LongType(), False),
    T.StructField("duration_s", T.DoubleType(), False),
    T.StructField("bitrate_kbps", T.DoubleType(), False),
    T.StructField("vbr", T.BooleanType(), False),
])


def audio_info(clips: DataFrame) -> DataFrame:
    """Container-metadata triage over an audio inventory (clip_id string,
    bytes binary): WAV / FLAC / MP3 parsed by pure header walks
    (audiometa.py) — duration, rate, channels, bitrate, VBR — with NO
    sample decode.  This is the 100 TB-shape complement of the
    audio_features stub seam: mp3/flac SAMPLE decode stays an external-
    library boundary, but inventory statistics (the thing a training
    pipeline filters on first) never needed it.  Shuffle-free
    mapInPandas; cost is a few KB of header bytes per object."""
    from gdalcubes_spark.audiometa import parse_audio

    def gen(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            rows = []
            for cid, payload in zip(pdf["clip_id"].to_numpy(),
                                    pdf["bytes"].to_numpy()):
                meta = parse_audio(bytes(payload))
                meta["clip_id"] = cid
                rows.append(meta)
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_INFO_SCHEMA.fields]) \
                if rows else pd.DataFrame(
                    {f.name: pd.Series(dtype="object")
                     for f in AUDIO_INFO_SCHEMA.fields})

    return clips.select("clip_id", "bytes").mapInPandas(
        gen, AUDIO_INFO_SCHEMA)


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
            for vid, payload, w, h, n in zip(pdf["video_id"].to_numpy(),
                                             pdf["frames"].to_numpy(),
                                             pdf["w"].to_numpy(),
                                             pdf["h"].to_numpy(),
                                             pdf["n_frames"].to_numpy()):
                raw = bytes(payload)
                if raw[:4] == b"\x00\x00\x00\x18" or raw[:3] == b"FLV":
                    raise NotImplementedError("real video decode needs ffmpeg (STUB)")
                w, h, n = int(w), int(h), int(n)
                plane = w * h
                for i in range(0, n, every_n):
                    f = np.frombuffer(raw, dtype=np.uint8, count=plane, offset=i * plane)
                    rows.append(dict(video_id=vid, frame_idx=i,
                                     frame_mean=float(f.mean())))
            yield pd.DataFrame(rows, columns=[f.name for f in VIDEO_SCHEMA.fields]) if rows else \
                pd.DataFrame({f.name: pd.Series(dtype="object") for f in VIDEO_SCHEMA.fields})

    return videos.mapInPandas(gen, VIDEO_SCHEMA)


VIDEO_INFO_SCHEMA = T.StructType([
    T.StructField("video_id", T.StringType(), False),
    T.StructField("brand", T.StringType(), False),
    T.StructField("codec", T.StringType(), False),
    T.StructField("width", T.IntegerType(), False),
    T.StructField("height", T.IntegerType(), False),
    T.StructField("duration_s", T.DoubleType(), False),
    T.StructField("n_samples", T.IntegerType(), False),
    T.StructField("n_keyframes", T.IntegerType(), False),
    T.StructField("fps", T.DoubleType(), False),
])


def video_container_info(videos: DataFrame) -> DataFrame:
    """ISO-BMFF (MP4/MOV) triage over (video_id, bytes): codec fourcc,
    dimensions, duration, sample/keyframe counts from the moov tables
    (mp4meta.py) — NO codec decode, a few KB of header parsing per
    object.  One row per video track."""
    from gdalcubes_spark.mp4meta import parse_mp4

    def gen(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            rows = []
            for vid, payload in zip(pdf["video_id"].to_numpy(),
                                    pdf["bytes"].to_numpy()):
                info = parse_mp4(bytes(payload))
                for t in info["tracks"]:
                    if t["handler"] != "vide":
                        continue
                    rows.append(dict(
                        video_id=vid, brand=info["brand"],
                        codec=t["codec"], width=t["width"],
                        height=t["height"], duration_s=t["duration_s"],
                        n_samples=t["n_samples"],
                        n_keyframes=t["n_keyframes"],
                        fps=(t["n_samples"] / t["duration_s"]
                             if t["duration_s"] else 0.0)))
            yield pd.DataFrame(
                rows, columns=[f.name for f in VIDEO_INFO_SCHEMA.fields]) \
                if rows else pd.DataFrame(
                    {f.name: pd.Series(dtype="object")
                     for f in VIDEO_INFO_SCHEMA.fields})

    return videos.select("video_id", "bytes").mapInPandas(
        gen, VIDEO_INFO_SCHEMA)


KEYFRAME_SCHEMA = T.StructType([
    T.StructField("video_id", T.StringType(), False),
    T.StructField("sample_idx", T.IntegerType(), False),
    T.StructField("t_s", T.DoubleType(), False),
    T.StructField("offset", T.LongType(), False),
    T.StructField("size_bytes", T.LongType(), False),
])


def video_keyframe_index(videos: DataFrame) -> DataFrame:
    """The distributed frame-extraction PLAN: one row per keyframe with
    its absolute byte range and timestamp, expanded from the
    stsc x stco x stsz x stts x stss tables.  At 100 TB the decode job
    reads ONLY these ranges (columnar range reads, no full-file scans);
    the h264/h265 decode of each range stays the documented external-
    library seam (sample_frames)."""
    from gdalcubes_spark.mp4meta import parse_mp4, sample_table

    def gen(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            rows = []
            for vid, payload in zip(pdf["video_id"].to_numpy(),
                                    pdf["bytes"].to_numpy()):
                b = bytes(payload)
                for t in parse_mp4(b)["tracks"]:
                    if t["handler"] != "vide":
                        continue
                    for si, off, size, ts, key in sample_table(b, t):
                        if key:
                            rows.append(dict(
                                video_id=vid, sample_idx=si,
                                t_s=ts, offset=off, size_bytes=size))
            yield pd.DataFrame(
                rows, columns=[f.name for f in KEYFRAME_SCHEMA.fields]) \
                if rows else pd.DataFrame(
                    {f.name: pd.Series(dtype="object")
                     for f in KEYFRAME_SCHEMA.fields})

    return videos.select("video_id", "bytes").mapInPandas(
        gen, KEYFRAME_SCHEMA)


ANIM_FRAME_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType(), False),
    T.StructField("frame_idx", T.IntegerType(), False),
    T.StructField("t_ms", T.IntegerType(), False),
    T.StructField("n_frames", T.IntegerType(), False),
    T.StructField("h", T.IntegerType(), False),
    T.StructField("w", T.IntegerType(), False),
    T.StructField("frame_mean", T.DoubleType(), False),
    T.StructField("opaque_frac", T.DoubleType(), False),
    T.StructField("frame_ahash", T.LongType(), False),
])


def sample_animation_frames(images: DataFrame, every_n: int = 1,
                            max_frames: int = 64) -> DataFrame:
    """REAL frame sampling over animated formats (GIF, animated WebP) —
    the video-pipeline shape (sample_frames) backed by formats the codec
    layer genuinely decodes end-to-end, not the ffmpeg stub seam.

    images: the input_hint table (image_id, bytes, fmt, ...).  Emits one
    row per sampled composited frame with its timeline position (t_ms =
    cumulative duration before the frame), per-frame stats and aHash —
    the columns a training pipeline keys frame dedup / scene sampling on.
    Still formats yield exactly one frame, so the operator is total over
    any inventory.  100 TB shape: pure mapInPandas (no shuffle); decode
    cost scales with payload bytes and the output is a few scalars per
    frame."""

    def gen(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            rows = []
            for iid, payload, fmt in zip(pdf["image_id"].to_numpy(),
                                         pdf["bytes"].to_numpy(),
                                         pdf["fmt"].to_numpy()):
                raw = bytes(payload)
                # decode STOPS at max_frames (no decode-then-truncate);
                # n_frames reports the TRUE animation length via a cheap
                # container walk, so consumers keying on it are not clipped
                frames, durs = codecs.decode_frames(raw, fmt,
                                                    max_frames=max_frames)
                n_total = codecs.count_frames(raw, fmt)
                t = 0
                for i, (f, d) in enumerate(zip(frames, durs)):
                    if i % every_n == 0:
                        rgb = f[1:].astype(np.float64)
                        rows.append(dict(
                            image_id=iid, frame_idx=i, t_ms=t,
                            n_frames=n_total,
                            h=f.shape[1], w=f.shape[2],
                            frame_mean=float(rgb.mean()),
                            opaque_frac=float((f[0] == 255).mean()),
                            frame_ahash=codecs.phash64(f[1:])))
                    t += d
            yield pd.DataFrame(
                rows, columns=[f.name for f in ANIM_FRAME_SCHEMA.fields]) \
                if rows else pd.DataFrame(
                    {f.name: pd.Series(dtype="object")
                     for f in ANIM_FRAME_SCHEMA.fields})

    return images.select("image_id", "bytes", "fmt") \
        .mapInPandas(gen, ANIM_FRAME_SCHEMA)


# ----------------------------------------------------------------- quality
# Structural similarity (Wang et al., "Image Quality Assessment: From Error
# Visibility to Structural Similarity", IEEE TIP 2004 — public paper) with a
# uniform window; plus the recompression-quality probe a curation pipeline
# runs to flag over-compressed sources.

def ssim_uniform(x: np.ndarray, y: np.ndarray, win: int = 8, L: float = 255.0) -> float:
    """Mean SSIM over all full windows (uniform filter form of the standard
    formula; C1=(0.01L)², C2=(0.03L)²). x, y: (h, w) float arrays."""
    x = x.astype("float64")
    y = y.astype("float64")
    h, w = x.shape
    if h < win or w < win:
        win = max(1, min(h, w))
    k = np.ones((win, win)) / (win * win)

    def box(a):  # valid-mode uniform filter via 2-D cumsum
        c = np.cumsum(np.cumsum(a, axis=0), axis=1)
        c = np.pad(c, ((1, 0), (1, 0)))
        return (c[win:, win:] - c[:-win, win:] - c[win:, :-win] + c[:-win, :-win]) / (win * win)

    mx, my = box(x), box(y)
    mxx, myy, mxy = box(x * x), box(y * y), box(x * y)
    vx = mxx - mx * mx
    vy = myy - my * my
    cxy = mxy - mx * my
    C1, C2 = (0.01 * L) ** 2, (0.03 * L) ** 2
    s = ((2 * mx * my + C1) * (2 * cxy + C2)) / ((mx * mx + my * my + C1) * (vx + vy + C2))
    return float(s.mean())


QUALITY_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType(), False),
    T.StructField("psnr", T.DoubleType(), False),
    T.StructField("ssim", T.DoubleType(), False),
])


def image_quality(images: DataFrame, quality: int = 35) -> DataFrame:
    """Recompression quality probe: decode each payload, re-encode through
    the REAL in-repo baseline JPEG at `quality`, and score the round trip
    with PSNR and mean-band SSIM. Sources that barely degrade under harsh
    recompression were already low-information/over-compressed — the classic
    curation filter. Executor-side mapInPandas over Arrow batches; returns
    (image_id, psnr, ssim) rounded to 6."""
    from gdalcubes_spark import codecs as _codecs
    from gdalcubes_spark.jpegcodec import decode_baseline, encode_baseline

    def gen(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            rows = []
            for iid, payload, fmt in zip(pdf["image_id"].to_numpy(),
                                         pdf["bytes"].to_numpy(),
                                         pdf["fmt"].to_numpy()):
                a = _codecs.decode(bytes(payload), fmt).astype("float64")
                nb = a.shape[0]
                ss, mse = [], []
                for b in range(nb):
                    orig = a[b].astype(np.uint8)
                    re = decode_baseline(encode_baseline(orig[None], quality=quality))[0].astype("float64")
                    ss.append(ssim_uniform(orig.astype("float64"), re))
                    mse.append(np.mean((orig.astype("float64") - re) ** 2))
                m = float(np.mean(mse))
                psnr = 99.0 if m < 1e-12 else 10.0 * np.log10(255.0 ** 2 / m)
                rows.append(dict(image_id=iid, psnr=round(psnr, 6),
                                 ssim=round(float(np.mean(ss)), 6)))
            yield pd.DataFrame(rows, columns=[f.name for f in QUALITY_SCHEMA.fields]) if rows else \
                pd.DataFrame({f.name: pd.Series(dtype="object") for f in QUALITY_SCHEMA.fields})

    from gdalcubes_spark.pipeline.dedup import widen_input
    return widen_input(images.select("image_id", "bytes", "fmt")).mapInPandas(gen, QUALITY_SCHEMA)


POOL_QUALITY_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType(), False),
    T.StructField("band", T.IntegerType(), False),
    T.StructField("mse", T.DoubleType(), False),
    T.StructField("psnr", T.DoubleType(), False),
])


def quality_pool_probe(images: DataFrame, factor: int = 2) -> DataFrame:
    """Deterministic-degrade quality probe: decode each payload, degrade it
    by factor×factor block-mean pooling + nearest upsample (a codec-free
    stand-in for lossy recompression), and score per band with MSE and PSNR.

    Unlike image_quality's JPEG round trip, every step here is exact
    rational arithmetic (integer pixels, power-of-two block means), so on a
    raw-format inventory whose pixels are the closed-form synth formula the
    whole decode→degrade→metric path is reproducible in pure SQL — this is
    the operator behind the multimodal_raw_oracle driver gate (r4 VERDICT
    item 4). PSNR is rounded to 6 (log10 is the one correctly-rounded-libm
    step); MSE is emitted unrounded (exact dyadic rational in float64).

    Arrow-batched mapInPandas; one output row per (image, band)."""

    def gen(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            rows = []
            for iid, payload, fmt in zip(pdf["image_id"].to_numpy(),
                                         pdf["bytes"].to_numpy(),
                                         pdf["fmt"].to_numpy()):
                a = codecs.decode(bytes(payload), fmt).astype("float64")
                nb, h, w = a.shape
                oh, ow = h // factor, w // factor
                crop = a[:, : oh * factor, : ow * factor]
                pooled = crop.reshape(nb, oh, factor, ow, factor).mean(axis=(2, 4))
                up = pooled.repeat(factor, axis=1).repeat(factor, axis=2)
                for ib in range(nb):
                    m = float(np.mean((crop[ib] - up[ib]) ** 2))
                    psnr = 99.0 if m < 1e-12 else round(10.0 * np.log10(255.0 ** 2 / m), 6)
                    rows.append(dict(image_id=iid, band=ib, mse=m, psnr=psnr))
            yield pd.DataFrame(rows, columns=[f.name for f in POOL_QUALITY_SCHEMA.fields]) if rows else \
                pd.DataFrame({f.name: pd.Series(dtype="object") for f in POOL_QUALITY_SCHEMA.fields})

    from gdalcubes_spark.pipeline.dedup import widen_input
    return widen_input(images.select("image_id", "bytes", "fmt")).mapInPandas(gen, POOL_QUALITY_SCHEMA)
