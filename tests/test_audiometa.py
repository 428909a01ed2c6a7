"""Audio container metadata parsers (audiometa.py) + the audio_info
operator — crafted spec-exact vectors (MPEG frame headers, FLAC
STREAMINFO bit-packing, RIFF/WAVE) since no audio encoder ships in this
container; the WAV vector comes from the in-repo encoder."""
from __future__ import annotations

import struct

import numpy as np
import pytest

from gdalcubes_spark import audiometa as A
from gdalcubes_spark.pipeline.multimodal import encode_wav

_V1L3 = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)


def mp3_frame(kbps=128, rate_idx=0, pad=0, mode=3):
    """One valid MPEG-1 Layer III frame (header + zero payload)."""
    h = 0xFFE00000 | (3 << 19) | (1 << 17) | (1 << 16) \
        | (_V1L3.index(kbps) << 12) | (rate_idx << 10) | (pad << 9) \
        | (mode << 6)
    rate = (44100, 48000, 32000)[rate_idx]
    flen = 1152 // 8 * kbps * 1000 // rate + pad
    return (struct.pack(">I", h) + bytes(flen))[:flen]


def flac_streaminfo(rate=48000, channels=2, bps=16, total=480000):
    bits = (rate << 44) | ((channels - 1) << 41) | ((bps - 1) << 36) | total
    body = bytes(10) + bits.to_bytes(8, "big") + bytes(16)
    return (b"fLaC"
            + bytes([0x00]) + len(body).to_bytes(3, "big") + body
            + bytes([0x81]) + (4).to_bytes(3, "big") + bytes(4))  # padding


class TestMp3:
    def test_cbr_with_id3_prefix(self):
        id3 = b"ID3\x04\x00\x00\x00\x00\x00\x0a" + bytes(10)
        m = A.parse_mp3(id3 + b"".join(mp3_frame() for _ in range(20)))
        assert m["container"] == "mp3(v1L3)"
        assert m["n_frames"] == 20
        assert m["sample_rate"] == 44100
        assert abs(m["duration_s"] - 20 * 1152 / 44100) < 1e-9
        assert not m["vbr"]

    def test_mixed_bitrates_flag_vbr(self):
        m = A.parse_mp3(b"".join(mp3_frame(kbps=k)
                                 for k in (128, 192, 128, 320)))
        assert m["n_frames"] == 4 and m["vbr"]

    def test_xing_tag(self):
        fr = bytearray(mp3_frame())
        fr[4 + 17:4 + 21] = b"Xing"  # v1 mono side-info offset
        m = A.parse_mp3(bytes(fr))
        assert m["vbr"] and m["channels"] == 1

    def test_stereo_info_tag(self):
        fr = bytearray(mp3_frame(mode=0))
        fr[4 + 32:4 + 36] = b"Info"  # v1 stereo side-info offset
        m = A.parse_mp3(bytes(fr))
        assert not m["vbr"] and m["channels"] == 2

    def test_resync_over_garbage(self):
        m = A.parse_mp3(bytes(37) + mp3_frame() + b"\xFF\x00garbage"
                        + mp3_frame())
        assert m["n_frames"] == 2

    def test_padding_bit(self):
        m = A.parse_mp3(b"".join(mp3_frame(pad=1) for _ in range(3)))
        assert m["n_frames"] == 3

    def test_no_frames_raises(self):
        with pytest.raises(ValueError):
            A.parse_mp3(bytes(64))


class TestFlacWav:
    def test_streaminfo_exact(self):
        m = A.parse_flac(flac_streaminfo())
        assert m["sample_rate"] == 48000
        assert m["channels"] == 2
        assert m["bits_per_sample"] == 16
        assert m["n_samples"] == 480000
        assert abs(m["duration_s"] - 10.0) < 1e-9
        assert m["vbr"]

    def test_odd_rate_and_depth(self):
        m = A.parse_flac(flac_streaminfo(rate=44100, channels=1, bps=24,
                                         total=44100 * 3))
        assert (m["sample_rate"], m["channels"], m["bits_per_sample"]) \
            == (44100, 1, 24)
        assert abs(m["duration_s"] - 3.0) < 1e-9

    def test_wav_roundtrip(self):
        m = A.parse_wav(encode_wav(np.zeros(16000, np.float32), 16000))
        assert m["sample_rate"] == 16000
        assert m["n_samples"] == 16000
        assert abs(m["duration_s"] - 1.0) < 1e-9
        assert not m["vbr"]

    def test_sniff_dispatch(self):
        assert A.parse_audio(flac_streaminfo())["container"] == "flac"
        assert A.parse_audio(mp3_frame())["container"].startswith("mp3")
        assert A.parse_audio(
            encode_wav(np.zeros(8, np.float32), 8000))["container"] == "wav"


class TestAudioInfoOperator:
    def test_operator(self, spark):
        import pandas as pd

        from gdalcubes_spark.pipeline.multimodal import audio_info
        rows = [
            ("m1", bytearray(b"".join(mp3_frame() for _ in range(10)))),
            ("f1", bytearray(flac_streaminfo())),
            ("w1", bytearray(encode_wav(np.zeros(8000, np.float32), 8000))),
        ]
        df = spark.createDataFrame(
            pd.DataFrame(rows, columns=["clip_id", "bytes"]))
        out = {r["clip_id"]: r for r in audio_info(df).collect()}
        assert out["m1"]["n_frames"] == 10
        assert out["f1"]["sample_rate"] == 48000
        assert abs(out["w1"]["duration_s"] - 1.0) < 1e-9
