"""Lossless WebP (VP8L) codec — RFC 9649 (r3 VERDICT item 3).

Roundtrip property tests cover the encoder features (palette with bundling,
subtract-green, greedy LZ77 with the short-distance plane map, color cache,
zero-run/repeat code-length compression) against the full decoder; the
decoder-only paths the encoder never emits (meta prefix groups, max_symbol
short form) get hand-built bitstream vectors. The libwebp parity tests EXECUTE in this
container via a ctypes binding to the system libwebp.so (libwebp.py) — both
directions, bit-exact.

Reference parity surface: the scan's GDAL-decodes-anything contract
(/root/reference/src/gdalcubes/src/image_collection_cube.cpp:446-552).
"""

import numpy as np
import pytest

from gdalcubes_spark import codecs
from gdalcubes_spark import webpcodec as W

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st
    HAVE_HYP = True
except ImportError:  # pragma: no cover
    HAVE_HYP = False

try:
    import io

    import PIL.Image
    _probe = io.BytesIO()
    PIL.Image.new("RGB", (1, 1)).save(_probe, format="WEBP", lossless=True)
    HAVE_PIL_WEBP = True
except Exception:
    HAVE_PIL_WEBP = False


def _rand(shape, seed=0):
    return np.random.default_rng(seed).integers(0, 256, shape).astype(np.uint8)


def _argb_equal(out, a):
    nb = a.shape[0]
    if nb == 1:
        return all(np.array_equal(out[i], a[0]) for i in (1, 2, 3)) and (out[0] == 255).all()
    if nb == 3:
        return np.array_equal(out[1:], a) and (out[0] == 255).all()
    return np.array_equal(out, a)


class TestRoundtrip:
    @pytest.mark.parametrize("name,shape,kw", [
        ("rgb-default", (3, 25, 31), {}),
        ("grey-default", (1, 40, 37), {}),
        ("argb-default", (4, 18, 18), {}),
        ("predictor", (3, 21, 29), dict(transform="predictor")),
        ("cross-color", (3, 21, 29), dict(transform="color")),
        ("plain", (3, 15, 15), dict(transform=None, cache_bits=0, use_lz77=False)),
        ("tiny", (3, 1, 1), {}),
        ("row", (3, 1, 64), {}),
        ("col", (3, 64, 1), {}),
    ])
    def test_exact(self, name, shape, kw):
        a = _rand(shape, seed=sum(shape))
        assert _argb_equal(W.decode_vp8l(W.encode_vp8l(a, **kw)), a)

    @pytest.mark.parametrize("ncolors", [2, 3, 5, 16, 17, 200])
    def test_palette_bundling_levels(self, ncolors):
        rng = np.random.default_rng(ncolors)
        pal = rng.integers(0, 256, (ncolors, 3)).astype(np.uint8)
        a = pal[rng.integers(0, ncolors, (19, 23))].transpose(2, 0, 1).copy()
        b = W.encode_vp8l(a)  # auto → color-indexing transform
        assert _argb_equal(W.decode_vp8l(b), a)

    def test_lz77_and_cache_paths(self):
        rng = np.random.default_rng(5)
        rep = np.tile(rng.integers(0, 256, (3, 4, 33)).astype(np.uint8), (1, 8, 1))
        small = W.encode_vp8l(rep)  # repeats → backrefs through the plane map
        assert _argb_equal(W.decode_vp8l(small), rep)
        cachey = np.tile(rng.integers(0, 256, (3, 1, 7)).astype(np.uint8), (1, 30, 5))
        b = W.encode_vp8l(cachey, use_lz77=False, cache_bits=4)
        assert _argb_equal(W.decode_vp8l(b), cachey)

    def test_compression_actually_compresses(self):
        yy, xx = np.mgrid[0:64, 0:64]
        a = ((xx + yy) % 256).astype(np.uint8)[None]
        assert len(W.encode_vp8l(a)) < 64 * 64  # far below 1 byte/px raw

    def test_lossy_vp8_routed_away_from_vp8l(self):
        """Lossy containers are vp8codec's job now; the VP8L decoder
        refuses them with a pointer instead of misparsing."""
        import struct
        fake = b"RIFF" + struct.pack("<I", 12) + b"WEBPVP8 " + struct.pack("<I", 0)
        with pytest.raises(ValueError, match="vp8codec"):
            W.decode_vp8l(fake)


class TestHandBuiltVectors:
    """Decoder-only features exercised by constructing raw bitstreams."""

    def test_meta_prefix_groups(self):
        """1×8 image, tile bits 2 → two Huffman groups selected by the meta
        image; every code is a simple single-symbol code, so the pixels are
        fully determined by group membership."""
        wr = W._WL()
        wr.bits(8 - 1, 14)
        wr.bits(1 - 1, 14)
        wr.bits(0, 1)
        wr.bits(0, 3)
        wr.bits(0, 1)   # no transforms
        wr.bits(0, 1)   # no color cache
        wr.bits(1, 1)   # meta prefix present
        wr.bits(0, 3)   # hbits = 2 → tiles of 4 px → meta image is 2×1
        # meta sub-image: no cache; 5 codes; greens 0 and 1 (group ids)
        wr.bits(0, 1)
        lg = [0] * 280
        lg[0] = lg[1] = 1
        W._write_prefix(wr, lg)
        for sym in (0, 0, 0):  # r, b, a single-symbol 0
            lz = [0] * 256
            lz[sym] = 1
            W._write_prefix(wr, lz)
        W._write_prefix(wr, [0] * 40)
        gcode = W._encode_code(lg)
        gcode.write(wr, 0)  # meta pixel 0 → group 0 (r=b=a zero-bit)
        gcode.write(wr, 1)  # meta pixel 1 → group 1
        # two code groups, all single-symbol: group0 → ARGB(255,10,20,30),
        # group1 → ARGB(255,40,50,60)
        for g, r, b, al in ((20, 10, 30, 255), (50, 40, 60, 255)):
            for sym, alph in ((g, 280), (r, 256), (b, 256), (al, 256)):
                ls = [0] * alph
                ls[sym] = 1
                W._write_prefix(wr, ls)
            W._write_prefix(wr, [0] * 40)
        payload = b"\x2F" + wr.done()
        import struct
        chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
        if len(payload) & 1:
            chunk += b"\x00"
        riff = b"WEBP" + chunk
        data = b"RIFF" + struct.pack("<I", len(riff)) + riff
        out = W.decode_vp8l(data)
        assert out.shape == (4, 1, 8)
        assert (out[1, 0, :4] == 10).all() and (out[1, 0, 4:] == 40).all()
        assert (out[2, 0, :4] == 20).all() and (out[2, 0, 4:] == 50).all()
        assert (out[3, 0, :4] == 30).all() and (out[3, 0, 4:] == 60).all()

    def test_max_symbol_short_form(self):
        """A normal-form code using the max_symbol limit: lengths beyond the
        limit default to zero."""
        wr = W._WL()
        wr.bits(0, 1)   # normal form
        # code-length code: symbols {1: len1, 8: len1} → emit raw lengths
        cl_lengths = [0] * 19
        cl_lengths[1] = 1
        cl_lengths[8] = 1
        num_cl = max(i + 1 for i, s in enumerate(W._CL_ORDER) if cl_lengths[s])
        wr.bits(num_cl - 4, 4)
        for i in range(num_cl):
            wr.bits(cl_lengths[W._CL_ORDER[i]], 3)
        wr.bits(1, 1)   # USE max_symbol
        wr.bits(0, 3)   # length_nbits = 2
        wr.bits(0, 2)   # max_symbol = 2 → only two code lengths follow
        cl = W._Prefix(cl_lengths)
        cl.write(wr, 1)  # symbol 0: length 1
        cl.write(wr, 1)  # symbol 1: length 1
        rd = W._RL(wr.done())
        p = W._read_prefix(rd, 256)
        assert p.lengths[:3] == [1, 1, 0] and sum(p.lengths) == 2


class TestCodecsIntegration:
    def test_codecs_roundtrip_collapse(self):
        for nb in (1, 3, 4):
            a = _rand((nb, 13, 17), seed=nb)
            if nb == 4:
                a[0, 0, 0] = 7  # keep alpha non-opaque so it survives
            out = codecs.decode(codecs.encode(a, "webp"), "webp")
            assert np.array_equal(out, a)

    def test_two_band_rejected(self):
        with pytest.raises(ValueError, match="bands"):
            codecs.encode(_rand((2, 8, 8)), "webp")

    def test_scan_over_webp_inventory(self, spark):
        """fmt='webp' through the REAL distributed scan — lossless, so the
        per-cell oracle is exact (same gate as the tif scan)."""
        from gdalcubes_spark.grid import ChunkGrid, CubeView
        from gdalcubes_spark.sources.raster_cube import raster_cube
        from gdalcubes_spark.synth import ImageLayout, band_names, generate_images
        from tests.test_scan import oracle_cell_values
        lay = ImageLayout(left0=0.0, top0=4.0, tile_dx=2.0, tile_dy=2.0, gx=2, gy=2,
                          ntime=2, tile_w=16, tile_h=16, nb=1, fmts=("webp",))
        n = 8
        imgs = generate_images(spark, n, lay)
        v = CubeView.create(srs="EPSG:4326", left=0, right=4, bottom=0, top=4,
                            t0="2021-01-01", t1="2021-01-02", dt="P1D", dx=0.25, dy=0.25,
                            aggregation="first", resampling="near")
        g = ChunkGrid(nt=v.nt, ny=v.ny, nx=v.nx, ct=1, cy=8, cx=8)
        got = raster_cube(imgs, v, band_names(lay), chunking=g).collect_array()
        want = oracle_cell_values(lay, n, v, "first")
        assert not np.any(np.isnan(got))
        assert np.allclose(got, want)

    def test_translate_to_webp(self, spark):
        from gdalcubes_spark.pipeline.multimodal import translate_format
        from gdalcubes_spark.synth import ImageLayout, generate_images
        lay = ImageLayout(gx=2, gy=2, ntime=1, tile_w=16, tile_h=16, nb=3,
                          fmts=("png", "raw"))
        imgs = generate_images(spark, 4, lay)
        out = translate_format(imgs, "webp").collect()
        assert all(r["fmt"] == "webp" for r in out)
        for r in out:
            assert bytes(r["bytes"])[:4] == b"RIFF"


if HAVE_HYP:
    @settings(max_examples=25, deadline=None)
    @given(
        h=st.integers(1, 40), w=st.integers(1, 40),
        nb=st.sampled_from([1, 3, 4]),
        transform=st.sampled_from(["auto", "subgreen", "predictor", "color", None]),
        cache_bits=st.sampled_from([0, 3, 6]),
        lz=st.booleans(),
        seed=st.integers(0, 10_000),
    )
    def test_property_vp8l_roundtrip(h, w, nb, transform, cache_bits, lz, seed):
        a = _rand((nb, h, w), seed=seed)
        b = W.encode_vp8l(a, transform=transform, cache_bits=cache_bits, use_lz77=lz)
        assert _argb_equal(W.decode_vp8l(b), a)


from gdalcubes_spark import libwebp as LW

HAVE_LIBWEBP = LW.available()


@pytest.mark.skipif(not HAVE_LIBWEBP, reason="no system libwebp — seam runs "
                    "wherever the shared library exists")
class TestLibwebpParitySeam:
    """EXECUTED parity against the system libwebp via the ctypes binding
    (gdalcubes_spark/libwebp.py) — no Pillow needed. This seam is what
    caught the r4 wire bugs (kCodeLengthCodeOrder position of 16; the
    zero-bit single-value code rule) the internal roundtrips could not."""

    def test_libwebp_decodes_our_streams(self):
        a = _rand((3, 24, 31), seed=4)
        for kw in ({}, dict(transform="predictor"), dict(transform=None),
                   dict(transform="color"), dict(transform="subgreen"),
                   dict(use_lz77=False), dict(cache_bits=0)):
            b = W.encode_vp8l(a, **kw)
            d = LW.decode_rgba(b)
            assert np.array_equal(d[:3], a) and (d[3] == 255).all(), kw

    def test_libwebp_decodes_our_palette_and_grey(self):
        pal = _rand((5, 3), seed=6)
        idx = np.random.default_rng(7).integers(0, 5, (20, 13))
        a = pal[idx].transpose(2, 0, 1).astype(np.uint8)
        d = LW.decode_rgba(W.encode_vp8l(a))
        assert np.array_equal(d[:3], a)
        g = _rand((1, 40, 37), seed=8)
        d = LW.decode_rgba(W.encode_vp8l(g))
        assert all(np.array_equal(d[i], g[0]) for i in range(3))

    def test_we_decode_libwebp_streams(self):
        for shape, seed in (((3, 24, 31), 5), ((3, 64, 64), 7), ((3, 33, 17), 9),
                            ((1, 16, 16), 2)):
            a = _rand(shape, seed=seed)
            out = W.decode_vp8l(LW.encode_lossless_rgba(a))
            if shape[0] == 1:
                assert np.array_equal(out[2], a[0])
            else:
                assert np.array_equal(out[1:], a)

    def test_we_decode_libwebp_gradient_mode13(self):
        """Smooth gradients push libwebp into the predictor transform
        (incl. ClampAddSubtractHalf) — guards the trunc-toward-zero fix."""
        x, y = np.arange(48), np.arange(40)
        grad = ((x[None, :] * 3 + y[:, None] * 5) % 256).astype(np.uint8)
        a = np.stack([grad, (grad.astype(int) * 2 % 256).astype(np.uint8), 255 - grad])
        out = W.decode_vp8l(LW.encode_lossless_rgba(a))
        assert np.array_equal(out[1:], a)
        b = W.encode_vp8l(a, transform="predictor")
        d = LW.decode_rgba(b)
        assert np.array_equal(d[:3], a)
