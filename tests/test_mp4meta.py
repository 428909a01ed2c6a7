"""ISO-BMFF demux (mp4meta.py): crafted spec-exact vectors (a minimal
test muxer building real ftyp/mdat/moov trees) — box walk, 64-bit
largesize, track metadata, stsc/stco/stsz/stts/stss expansion into the
per-sample byte-range plan, AVIF probing, and the video_info /
video_keyframe_index operators."""
from __future__ import annotations

import struct

import numpy as np
import pytest

from gdalcubes_spark import mp4meta as M


def box(typ: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + typ + payload


def full(typ: bytes, payload: bytes, version=0, flags=0) -> bytes:
    return box(typ, bytes([version]) + flags.to_bytes(3, "big") + payload)


def mux_mp4(sample_sizes, samples_per_chunk=3, timescale=600,
            sample_delta=20, keyframes=(1, 4), w=64, h=48,
            codec=b"avc1", largesize_mdat=False):
    """Minimal but spec-consistent ftyp+mdat+moov MP4. Returns (bytes,
    expected absolute sample offsets)."""
    n = len(sample_sizes)
    ftyp = box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    mdat_payload = b"".join(bytes([i % 251]) * s
                            for i, s in enumerate(sample_sizes))
    if largesize_mdat:
        mdat = struct.pack(">I", 1) + b"mdat" \
            + struct.pack(">Q", 16 + len(mdat_payload)) + mdat_payload
        data_start = len(ftyp) + 16
    else:
        mdat = box(b"mdat", mdat_payload)
        data_start = len(ftyp) + 8

    # chunks: ceil(n / spc) chunks, offsets derived from sizes
    offsets, chunk_offs = [], []
    pos = data_start
    for i, s in enumerate(sample_sizes):
        if i % samples_per_chunk == 0:
            chunk_offs.append(pos)
        offsets.append(pos)
        pos += s

    dur = n * sample_delta
    mvhd = full(b"mvhd", struct.pack(">II", 0, 0)
                + struct.pack(">II", timescale, dur) + bytes(80))
    tkhd = full(b"tkhd", struct.pack(">II", 0, 0) + struct.pack(">I", 7)
                + bytes(4) + struct.pack(">I", dur) + bytes(52)
                + struct.pack(">II", w << 16, h << 16))
    mdhd = full(b"mdhd", struct.pack(">II", 0, 0)
                + struct.pack(">II", timescale, dur) + bytes(4))
    hdlr = full(b"hdlr", bytes(4) + b"vide" + bytes(12) + b"vh\x00")
    entry = box(codec, bytes(6) + struct.pack(">H", 1) + bytes(16)
                + struct.pack(">HH", w, h) + bytes(50))
    stsd = full(b"stsd", struct.pack(">I", 1) + entry)
    stts = full(b"stts", struct.pack(">III", 1, n, sample_delta))
    stss = full(b"stss", struct.pack(">I", len(keyframes))
                + b"".join(struct.pack(">I", k) for k in keyframes))
    stsz = full(b"stsz", struct.pack(">II", 0, n)
                + b"".join(struct.pack(">I", s) for s in sample_sizes))
    stsc = full(b"stsc", struct.pack(">I", 1)
                + struct.pack(">III", 1, samples_per_chunk, 1))
    stco = full(b"stco", struct.pack(">I", len(chunk_offs))
                + b"".join(struct.pack(">I", o) for o in chunk_offs))
    stbl = box(b"stbl", stsd + stts + stss + stsz + stsc + stco)
    minf = box(b"minf", stbl)
    mdia = box(b"mdia", mdhd + hdlr + minf)
    trak = box(b"trak", tkhd + mdia)
    moov = box(b"moov", mvhd + trak)
    return ftyp + mdat + moov, offsets


SIZES = [100, 120, 90, 150, 80, 110, 95]


class TestParse:
    def test_track_metadata(self):
        b, _ = mux_mp4(SIZES)
        info = M.parse_mp4(b)
        assert info["brand"] == "isom"
        assert abs(info["duration_s"] - 7 * 20 / 600) < 1e-9
        (t,) = info["tracks"]
        assert t["handler"] == "vide"
        assert t["codec"] == "avc1"
        assert (t["width"], t["height"]) == (64, 48)
        assert t["n_samples"] == 7
        assert t["n_keyframes"] == 2
        assert t["timescale"] == 600

    def test_sample_table_expansion(self):
        b, offsets = mux_mp4(SIZES)
        (t,) = M.parse_mp4(b)["tracks"]
        rows = M.sample_table(b, t)
        assert len(rows) == 7
        for i, (si, off, size, ts, key) in enumerate(rows):
            assert si == i
            assert off == offsets[i]
            assert size == SIZES[i]
            assert abs(ts - i * 20 / 600) < 1e-9
            assert key == (i + 1 in (1, 4))
        # the byte ranges must slice the actual mdat payload content
        s3 = rows[3]
        assert b[s3[1]:s3[1] + s3[2]] == bytes([3 % 251]) * SIZES[3]

    def test_largesize_mdat(self):
        b, offsets = mux_mp4(SIZES, largesize_mdat=True)
        (t,) = M.parse_mp4(b)["tracks"]
        rows = M.sample_table(b, t)
        assert [r[1] for r in rows] == offsets

    def test_no_stss_means_all_keyframes(self):
        b, _ = mux_mp4(SIZES)
        # drop the stss box by re-muxing without it: easier — parse and
        # delete the parsed fields to simulate absence
        (t,) = M.parse_mp4(b)["tracks"]
        t.pop("_stss_off"), t.pop("_stss_cnt")
        t["n_keyframes"] = t["n_samples"]
        assert all(r[4] for r in M.sample_table(b, t))

    def test_uneven_last_chunk(self):
        sizes = [10] * 8  # spc=3 → chunks of 3,3,2
        b, offsets = mux_mp4(sizes, samples_per_chunk=3)
        (t,) = M.parse_mp4(b)["tracks"]
        rows = M.sample_table(b, t)
        assert [r[1] for r in rows] == offsets

    def test_corrupt_box_raises(self):
        with pytest.raises(ValueError):
            list(M.walk_boxes(struct.pack(">I", 3) + b"free"))

    def test_no_moov_raises(self):
        with pytest.raises(ValueError):
            M.parse_mp4(box(b"ftyp", b"isom") + box(b"mdat", b"xx"))


class TestAvifProbe:
    def _avif(self, w=320, h=200):
        ispe = full(b"ispe", struct.pack(">II", w, h))
        ipco = box(b"ipco", ispe)
        iprp = box(b"iprp", ipco)
        iinf = full(b"iinf", struct.pack(">H", 2))
        meta = full(b"meta", iinf + iprp)
        return box(b"ftyp", b"avif\x00\x00\x00\x00avifmif1") + meta

    def test_probe(self):
        m = M.probe_avif(self._avif())
        assert m["brand"] == "avif"
        assert (m["width"], m["height"]) == (320, 200)
        assert m["n_items"] == 2


class TestOperators:
    def test_video_info_and_keyframe_index(self, spark):
        import pandas as pd

        from gdalcubes_spark.pipeline.multimodal import (
            video_container_info, video_keyframe_index)
        b1, _ = mux_mp4(SIZES, keyframes=(1, 4))
        b2, off2 = mux_mp4([40] * 12, samples_per_chunk=4,
                           keyframes=(1, 5, 9), w=128, h=72)
        df = spark.createDataFrame(pd.DataFrame(
            [("v1", bytearray(b1)), ("v2", bytearray(b2))],
            columns=["video_id", "bytes"]))
        info = {r["video_id"]: r for r in video_container_info(df).collect()}
        assert info["v1"]["n_samples"] == 7
        assert info["v2"]["width"] == 128
        assert info["v2"]["n_keyframes"] == 3
        kf = video_keyframe_index(df).toPandas()
        k2 = kf[kf.video_id == "v2"].sort_values("sample_idx")
        assert list(k2.sample_idx) == [0, 4, 8]
        assert list(k2.offset) == [off2[0], off2[4], off2[8]]
        assert (k2.size_bytes == 40).all()
