"""GIF codec (gifcodec.py) + animated WebP (codecs.webp_*_frames) +
sample_animation_frames operator.

The system giflib (through the gdk-pixbuf gif loader, tests/
pixbuf_oracle.py) is the EXECUTED third-party oracle: it must decode our
LZW streams bit-exact (incl. across the 9→10→11→12-bit width boundaries
and the 4096 dictionary reset), and GdkPixbufAnimation must composite
our animations to the same frames we decode ourselves.
"""
from __future__ import annotations

import numpy as np
import pytest

from gdalcubes_spark import codecs
from gdalcubes_spark import gifcodec as G

import pixbuf_oracle as P

HAVE_PIXBUF = P.load() is not None


def _norm(ref):
    """pixbuf gif frames may be RGB or RGBA → (rgb, alpha)."""
    if ref.shape[0] == 4:
        return ref[:3], ref[3]
    return ref, np.full(ref.shape[1:], 255, np.uint8)


def _rand(shape, seed):
    return np.random.default_rng(seed).integers(0, 256, shape, np.uint8)


class TestLzw:
    def test_roundtrip_across_width_boundaries(self):
        """200x300 noise grey crosses 512/1024/2048/4096 — every width
        step and the dictionary reset."""
        a = _rand((1, 200, 300), 2)
        assert np.array_equal(G.decode_gif(G.encode_gif(a)), a)

    def test_roundtrip_small_alphabet(self):
        """2-color image → min code size 2 (the spec floor)."""
        a = (_rand((1, 40, 40), 3) > 127).astype(np.uint8) * 255
        assert np.array_equal(G.decode_gif(G.encode_gif(a)), a)

    @pytest.mark.parametrize("shape", [(1, 1, 1), (1, 7, 3), (3, 61, 2),
                                       (1, 13, 255)])
    def test_odd_shapes(self, shape):
        a = _rand(shape, 5) if shape[0] == 1 \
            else _rand(shape, 5) // 43 * 43
        for interlace in (False, True):
            b = G.encode_gif(a, interlace=interlace)
            assert np.array_equal(G.decode_gif(b, nb=shape[0]), a)

    def test_kwkwk_case(self):
        """aaaa... forces the code-equals-next_code (KwKwK) path."""
        a = np.zeros((1, 16, 16), np.uint8)
        assert np.array_equal(G.decode_gif(G.encode_gif(a)), a)


class TestDecodeSemantics:
    def test_band_collapse_and_pinning(self):
        grey = _rand((1, 10, 12), 7)
        b = G.encode_gif(grey)
        assert G.decode_gif(b).shape == (1, 10, 12)
        assert G.decode_gif(b, nb=3).shape == (3, 10, 12)
        assert G.decode_gif(b, nb=4)[0].min() == 255
        color = _rand((3, 10, 12), 8) // 40 * 40
        assert G.decode_gif(G.encode_gif(color)).shape[0] in (1, 3)

    def test_transparency_argb(self):
        a = _rand((4, 16, 16), 9) // 100 * 100
        a[0] = np.where(_rand((16, 16), 10) > 127, 255, 0)
        dec = G.decode_gif(G.encode_gif(a))
        assert dec.shape[0] == 4
        np.testing.assert_array_equal(dec[0], a[0])
        op = a[0] == 255
        for c in range(1, 4):
            np.testing.assert_array_equal(dec[c][op], a[c][op])

    def test_quantized_psnr(self):
        """>256 colors → median-cut; decoded image must stay close."""
        yy, xx = np.mgrid[0:48, 0:48]
        smooth = np.stack([yy * 5 % 256, xx * 3 % 256,
                           (yy + xx) * 2 % 256]).astype(np.uint8)
        ours = G.decode_gif(G.encode_gif(smooth), nb=3)
        mse = np.mean((ours.astype(float) - smooth.astype(float)) ** 2)
        assert 10 * np.log10(255.0 ** 2 / max(mse, 1e-12)) >= 30.0

    def test_animation_roundtrip(self):
        frames = [( _rand((3, 18, 22), s) // 50 * 50, 10)
                  for s in range(5)]
        b = G.encode_gif_animation(frames)
        dec, delays = G.decode_gif_frames(b)
        assert delays == [10] * 5
        for d, (f, _) in zip(dec, frames):
            np.testing.assert_array_equal(d[1:], f)
            assert (d[0] == 255).all()

    def test_codecs_dispatch(self):
        a = _rand((1, 9, 11), 11)
        b = codecs.encode(a, "gif")
        assert b[:6] == b"GIF89a"
        np.testing.assert_array_equal(codecs.decode(b, "gif"), a)


@pytest.mark.skipif(not HAVE_PIXBUF, reason="no system gdk-pixbuf/giflib")
class TestGiflibParity:
    def test_giflib_reads_our_streams_bit_exact(self):
        for shape, seed in [((1, 20, 30), 1), ((1, 200, 300), 2),
                            ((3, 25, 33), 3)]:
            a = _rand(shape, seed)
            if shape[0] == 3:
                a = a // 80 * 80  # exact palette
            rgb, alpha = _norm(P.decode(G.encode_gif(a), "gif"))
            assert (alpha == 255).all()
            if shape[0] == 1:
                for band in rgb:
                    np.testing.assert_array_equal(band, a[0])
            else:
                np.testing.assert_array_equal(rgb, a)

    def test_giflib_reads_interlaced(self):
        a = _rand((3, 61, 33), 4) // 60 * 60
        rgb, _ = _norm(P.decode(G.encode_gif(a, interlace=True), "gif"))
        np.testing.assert_array_equal(rgb, a)

    def test_giflib_transparency(self):
        a = _rand((4, 16, 16), 9) // 100 * 100
        a[0] = np.where(_rand((16, 16), 10) > 127, 255, 0)
        b = G.encode_gif(a)
        rgb, alpha = _norm(P.decode(b, "gif"))
        np.testing.assert_array_equal(alpha, a[0])
        op = a[0] == 255
        for c in range(3):
            np.testing.assert_array_equal(rgb[c][op], a[c + 1][op])

    def test_giflib_quantized_agrees_with_us(self):
        """On a >256-color image both decoders must see the SAME palette
        result — bit-exact agreement even though lossy vs the source."""
        a = _rand((3, 40, 40), 12)
        b = G.encode_gif(a)
        rgb, _ = _norm(P.decode(b, "gif"))
        np.testing.assert_array_equal(rgb, G.decode_gif(b, nb=3))

    def test_pixbuf_animation_parity(self):
        frames = [(_rand((3, 18, 22), s) // 50 * 50, 10)
                  for s in range(5)]
        b = G.encode_gif_animation(frames)
        ours, _ = G.decode_gif_frames(b)
        theirs = P.decode_animation(b, "gif")
        assert theirs and len(theirs) >= len(ours)
        for o, t in zip(ours, theirs[:len(ours)]):
            np.testing.assert_array_equal(o[1:], _norm(t)[0])


class TestAnimatedWebp:
    def test_mux_demux_exact(self):
        rng = np.random.default_rng(3)
        frames = [rng.integers(0, 5, (4, 20, 28), np.uint8) * 60
                  for _ in range(4)]
        for f in frames:
            f[0] = np.where(f[0] > 120, 255, 0)
        b = codecs.webp_encode_animation(frames, [40, 40, 40, 80])
        dec, durs = codecs.webp_decode_frames(b)
        assert durs == [40, 40, 40, 80]
        for d, f in zip(dec, frames):
            np.testing.assert_array_equal(d, f)

    def test_still_contract_is_first_frame(self):
        rng = np.random.default_rng(4)
        frames = [rng.integers(0, 5, (4, 12, 12), np.uint8) * 60
                  for _ in range(2)]
        for f in frames:
            f[0] = np.where(f[0] > 120, 255, 0)
        b = codecs.webp_encode_animation(frames, [10, 10])
        np.testing.assert_array_equal(codecs.decode(b, "webp", nb=4),
                                      frames[0])

    def test_blend_and_dispose(self):
        """Hand-build a 2-frame animation with a partial-rect second frame
        that alpha-blends, then disposes — exercises the compositing
        branches the encoder never emits."""
        base = np.zeros((4, 8, 8), np.uint8)
        base[0] = 255
        base[1] = 200
        b = codecs.webp_encode_animation([base], [10])
        # splice a 4x4 half-transparent blended frame at (2, 2)
        patch = np.zeros((4, 4, 4), np.uint8)
        patch[0] = 128
        patch[3] = 100
        from gdalcubes_spark.webpcodec import encode_vp8l
        inner = encode_vp8l(patch)[12:]
        head = (1).to_bytes(3, "little") + (1).to_bytes(3, "little") \
            + (3).to_bytes(3, "little") + (3).to_bytes(3, "little") \
            + (20).to_bytes(3, "little") + bytes([0])  # blend, no dispose
        anmf = b"ANMF" + len(head + inner).to_bytes(4, "little") \
            + head + inner
        if len(head + inner) & 1:
            anmf += b"\x00"
        body = b[12:] + anmf
        b2 = b"RIFF" + (len(body) + 4).to_bytes(4, "little") + b"WEBP" + body
        frames, durs = codecs.webp_decode_frames(b2)
        assert len(frames) == 2 and durs == [10, 20]
        np.testing.assert_array_equal(frames[0], base)
        f2 = frames[1]
        # outside the patch rect: unchanged
        np.testing.assert_array_equal(f2[:, :2, :], base[:, :2, :])
        # inside: RFC over-operator with sa=128, da=255 → oa=255
        oa = 128 + 255 * (255 - 128) // 255
        assert f2[0, 2, 2] == oa
        exp_r = (0 * 128 + 200 * 255 * (255 - 128) // 255) // oa
        assert f2[1, 2, 2] == exp_r
        exp_b = (100 * 128 + 0) // oa
        assert f2[3, 2, 2] == exp_b

    def test_frame_payloads_are_valid_vp8l(self):
        """Each ANMF frame's image chunk must itself be decodable as a
        standalone VP8L stream (the property libwebp demuxers rely on)."""
        rng = np.random.default_rng(5)
        frames = [rng.integers(0, 4, (3, 10, 14), np.uint8) * 70
                  for _ in range(3)]
        b = codecs.webp_encode_animation(frames, [5, 5, 5])
        pos, seen = 12, 0
        while pos + 8 <= len(b):
            tag = b[pos:pos + 4]
            sz = int.from_bytes(b[pos + 4:pos + 8], "little")
            if tag == b"ANMF":
                sub = b[pos + 8 + 16:pos + 8 + sz]
                assert sub[:4] == b"VP8L"
                inner_sz = int.from_bytes(sub[4:8], "little")
                riff = b"RIFF" + (4 + 8 + inner_sz + (inner_sz & 1)) \
                    .to_bytes(4, "little") + b"WEBP" + sub
                got = codecs.decode(riff, "webp", nb=3)
                np.testing.assert_array_equal(got, frames[seen])
                seen += 1
            pos += 8 + sz + (sz & 1)
        assert seen == 3


class TestSampleAnimationFrames:
    def test_operator(self, spark):
        import pandas as pd
        from gdalcubes_spark.pipeline.multimodal import \
            sample_animation_frames
        rng = np.random.default_rng(6)
        gif_frames = [(rng.integers(0, 5, (3, 10, 12), np.uint8) * 50, 7)
                      for _ in range(6)]
        webp_frames = [rng.integers(0, 5, (3, 10, 12), np.uint8) * 50
                      for _ in range(3)]
        still = rng.integers(0, 256, (3, 10, 12), np.uint8)
        rows = [
            ("g1", bytearray(G.encode_gif_animation(gif_frames)), "gif"),
            ("w1", bytearray(codecs.webp_encode_animation(
                webp_frames, [30, 30, 30])), "webp"),
            ("p1", bytearray(codecs.encode(still, "png")), "png"),
        ]
        df = spark.createDataFrame(
            pd.DataFrame(rows, columns=["image_id", "bytes", "fmt"]))
        out = sample_animation_frames(df, every_n=2).toPandas() \
            .sort_values(["image_id", "frame_idx"]).reset_index(drop=True)
        g = out[out.image_id == "g1"]
        assert list(g.frame_idx) == [0, 2, 4]
        assert list(g.t_ms) == [0, 140, 280]  # 7 cs = 70 ms per frame
        assert (g.n_frames == 6).all()
        w = out[out.image_id == "w1"]
        assert list(w.frame_idx) == [0, 2]
        assert list(w.t_ms) == [0, 60]
        p = out[out.image_id == "p1"]
        assert len(p) == 1 and p.iloc[0].n_frames == 1
        # stats: first gif frame mean must equal the source frame mean
        exp = gif_frames[0][0].astype(np.float64).mean()
        assert abs(g.iloc[0].frame_mean - exp) < 1e-9
        assert (out.opaque_frac == 1.0).all()
