"""In-repo baseline JPEG codec (jpegcodec.py, ITU-T T.81 / JFIF 1.02): the
real DCT+Huffman path behind codecs.encode/decode(fmt='jpeg').

No external JPEG library exists in this container, so the ground truth is
(a) analytic (constant blocks quantize exactly; DCT matrix is orthonormal),
(b) roundtrip PSNR against the original, and (c) structural checks of the
emitted marker stream against the public spec.
"""

import struct

import numpy as np
import pytest

from gdalcubes_spark.jpegcodec import (_D, UNZIGZAG, ZIGZAG, decode_baseline,
                                       encode_baseline)


def psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return np.inf if mse == 0 else 10 * np.log10(255.0**2 / mse)


def gradient(nb, h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([((yy * (3 + b) + xx * (2 + b)) % 256) for b in range(nb)]).astype(np.uint8)


class TestTransforms:
    def test_dct_matrix_orthonormal(self):
        assert np.allclose(_D @ _D.T, np.eye(8), atol=1e-12)

    def test_zigzag_is_permutation(self):
        assert sorted(ZIGZAG.tolist()) == list(range(64))
        assert np.array_equal(ZIGZAG[UNZIGZAG], np.arange(64))


class TestRoundtrip:
    @pytest.mark.parametrize("shape,sub", [((1, 24, 24), "444"), ((3, 24, 24), "444"),
                                           ((3, 24, 24), "420"), ((3, 37, 51), "420"),
                                           ((1, 8, 8), "444"), ((3, 7, 5), "444")])
    def test_psnr_and_shape(self, shape, sub):
        if sub == "420":
            # chroma-smooth content (correlated bands): 4:2:0 halves chroma
            # resolution by design, so independent per-band wrap gradients
            # are out of its contract — natural images are chroma-smooth
            base = gradient(1, *shape[1:])[0]
            img = np.stack([base, np.clip(base + 10, 0, 255), np.clip(base + 20, 0, 255)]).astype(np.uint8)
        else:
            img = gradient(*shape)
        d = decode_baseline(encode_baseline(img, quality=95, subsampling=sub))
        assert d.shape == img.shape
        assert psnr(img, d) >= 40.0

    def test_constant_image_exact(self):
        for v in (0, 77, 128, 255):
            c = np.full((3, 19, 21), v, np.uint8)
            d = decode_baseline(encode_baseline(c, quality=80))
            assert np.array_equal(d, c), v

    def test_deterministic_bytes(self):
        img = gradient(3, 32, 32)
        assert encode_baseline(img, 90) == encode_baseline(img, 90)

    def test_quality_monotone(self):
        img = gradient(1, 64, 64) ^ np.arange(64, dtype=np.uint8)[None, None, :]
        errs = []
        for q in (50, 75, 90, 97):
            d = decode_baseline(encode_baseline(img, q))
            errs.append(np.mean((d.astype(float) - img.astype(float)) ** 2))
        assert errs == sorted(errs, reverse=True)  # higher quality, lower MSE

    def test_restart_markers_roundtrip(self):
        """DRI/RSTn path: encoder emits resync markers, decoder must reset
        DC predictors per segment — a wrong reset corrupts every later MCU."""
        img = gradient(1, 64, 64)
        b_plain = encode_baseline(img, 92)
        b_rst = encode_baseline(img, 92, restart_interval=3)
        assert b"\xff\xdd" in b_rst and b"\xff\xdd" not in b_plain
        assert any(bytes([0xFF, 0xD0 + i]) in b_rst for i in range(8))
        d1 = decode_baseline(b_plain)
        d2 = decode_baseline(b_rst)
        assert np.array_equal(d1, d2)  # identical coefficients either way

    def test_noise_worst_case_clears_gate_at_q97(self):
        rng = np.random.default_rng(11)
        n = rng.integers(0, 256, (3, 40, 40)).astype(np.uint8)
        assert psnr(n, decode_baseline(encode_baseline(n, 97))) >= 40.0


class TestMarkers:
    def test_stream_structure(self):
        b = encode_baseline(gradient(3, 16, 16), 90)
        assert b[:2] == b"\xff\xd8" and b[-2:] == b"\xff\xd9"
        assert b[2:4] == b"\xff\xe0" and b[6:11] == b"JFIF\x00"
        # SOF0 present with 3 components, 8-bit
        i = b.find(b"\xff\xc0")
        assert i > 0
        prec, h, w, nc = b[i + 4], *struct.unpack(">HH", b[i + 5:i + 9]), b[i + 9]
        assert (prec, h, w, nc) == (8, 16, 16, 3)

    def test_progressive_header_accepted_but_truncated_raises(self):
        # SOF2 is SUPPORTED since round 4; a stream with no SOS is truncated
        b = (b"\xff\xd8\xff\xc2" + struct.pack(">H", 11)
             + bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0]))
        with pytest.raises(ValueError, match="truncated"):
            decode_baseline(b)

    def test_lossless_sof_rejected(self):
        b = (b"\xff\xd8\xff\xc3" + struct.pack(">H", 11)
             + bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0]))
        with pytest.raises(NotImplementedError):
            decode_baseline(b)

    def test_16bit_quant_rejected(self):
        b = (b"\xff\xd8\xff\xdb" + struct.pack(">H", 2 + 129)
             + bytes([0x10]) + bytes(128) + b"\xff\xd9")
        with pytest.raises(NotImplementedError):
            decode_baseline(b)

    def test_not_jpeg_rejected(self):
        with pytest.raises(ValueError):
            decode_baseline(b"\x89PNG\r\n\x1a\n")

    def test_unknown_appn_and_comment_skipped(self):
        """APPn/COM segments from foreign encoders must be skipped cleanly."""
        b = bytearray(encode_baseline(gradient(1, 16, 16), 90))
        extra = (b"\xff\xee" + struct.pack(">H", 8) + b"Adobe\x00"       # APP14
                 + b"\xff\xfe" + struct.pack(">H", 7) + b"hello")        # COM
        out = bytes(b[:2]) + extra + bytes(b[2:])
        assert np.array_equal(decode_baseline(out), decode_baseline(bytes(b)))
