"""Progressive JPEG (SOF2) — encode + decode (r3 VERDICT items 2 and 8).

The load-bearing invariant: baseline and progressive streams at the same
quality/subsampling carry IDENTICAL quantized coefficients (shared
_dct_quant_components front half) and differ ONLY in the entropy layer, so
decode(progressive) must equal decode(baseline) bit-for-bit. The progressive
decoder (jdphuff-style scan state machine) and the progressive encoder are
independent code paths from the baseline hot loops, so agreement pins both.

Reference parity surface: the scan's GDAL-decodes-anything contract
(/root/reference/src/gdalcubes/src/image_collection_cube.cpp:446-552) — a
real inventory mixes baseline and progressive JPEGs.
"""

import numpy as np
import pytest

from gdalcubes_spark import jpegcodec as J

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st
    HAVE_HYP = True
except ImportError:  # pragma: no cover
    HAVE_HYP = False

try:
    import PIL.Image  # noqa: F401
    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False


def _rand(shape, seed=0):
    return np.random.default_rng(seed).integers(0, 256, shape).astype(np.uint8)


class TestProgressiveRoundtrip:
    @pytest.mark.parametrize("shape,sub", [
        ((1, 16, 16), "444"), ((1, 33, 41), "444"), ((3, 32, 32), "444"),
        ((3, 24, 40), "420"), ((3, 37, 29), "420"),
    ])
    def test_equals_baseline_decode(self, shape, sub):
        a = _rand(shape, seed=sum(shape))
        for q in (50, 90):
            base = J.decode_baseline(J.encode_baseline(a, quality=q, subsampling=sub))
            prog = J.decode_baseline(J.encode_progressive(a, quality=q, subsampling=sub))
            assert np.array_equal(base, prog)

    def test_stream_is_really_progressive(self):
        b = J.encode_progressive(_rand((3, 32, 32)))
        assert b"\xFF\xC2" in b and b"\xFF\xC0" not in b  # SOF2, no SOF0
        assert b.count(b"\xFF\xDA") == 10  # the 3-component scan script

    def test_grey_scan_script(self):
        b = J.encode_progressive(_rand((1, 24, 24)))
        assert b"\xFF\xC2" in b and b.count(b"\xFF\xDA") == 4

    def test_eob_runs_batch_across_blocks(self):
        """A nearly-flat image makes most blocks all-zero in the AC bands →
        the encoder batches EOBn runs > 1 and the decoder must walk them
        (including refinement-scan correction bits buffered per run)."""
        a = np.full((3, 64, 64), 128, np.uint8)
        a[:, 30:33, 30:33] = 250  # one feature so some blocks have content
        base = J.decode_baseline(J.encode_baseline(a, quality=85))
        prog = J.decode_baseline(J.encode_progressive(a, quality=85))
        assert np.array_equal(base, prog)

    def test_psnr_gate_against_source(self):
        """input_hint acceptance: decoded progressive payloads meet the
        PSNR≥40dB lossy gate vs the original pixels (structured scene —
        pure noise is JPEG's pathological case and fails the gate for any
        encoder at any standard quality)."""
        yy, xx = np.mgrid[0:48, 0:48]
        a = np.stack([(xx + yy) // 2, xx // 2, yy // 2]).astype(np.uint8)
        out = J.decode_baseline(J.encode_progressive(a, quality=95))
        mse = np.mean((out.astype(np.float64) - a) ** 2)
        psnr = 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))
        assert psnr >= 40.0

    def test_codecs_decode_handles_progressive(self):
        from gdalcubes_spark import codecs
        a = _rand((1, 32, 32), seed=9)
        assert codecs.decode(J.encode_progressive(a, quality=92), "jpeg").shape == a.shape


if HAVE_HYP:
    @settings(max_examples=25, deadline=None)
    @given(
        h=st.integers(9, 70), w=st.integers(9, 70),
        nb=st.sampled_from([1, 3]),
        sub=st.sampled_from(["444", "420"]),
        quality=st.integers(35, 97),
        seed=st.integers(0, 10_000),
    )
    def test_property_progressive_equals_baseline(h, w, nb, sub, quality, seed):
        a = _rand((nb, h, w), seed=seed)
        base = J.decode_baseline(J.encode_baseline(a, quality=quality, subsampling=sub))
        prog = J.decode_baseline(J.encode_progressive(a, quality=quality, subsampling=sub))
        assert np.array_equal(base, prog)


class TestScanOverProgressive:
    def test_raster_cube_decodes_progressive_payloads(self, spark):
        """A real inventory mixes baseline and progressive JPEGs under the
        same fmt='jpeg'; the scan's decode dispatch must handle both. Build
        the synth inventory, re-encode every payload progressively, and
        check the cube equals the baseline-payload cube exactly (identical
        coefficients by construction)."""
        import pandas as pd

        from gdalcubes_spark.grid import ChunkGrid, CubeView
        from gdalcubes_spark.sources.raster_cube import raster_cube
        from gdalcubes_spark.synth import ImageLayout, band_names, generate_images
        lay = ImageLayout(left0=0.0, top0=4.0, tile_dx=2.0, tile_dy=2.0, gx=2, gy=2,
                          ntime=2, tile_w=16, tile_h=16, nb=1, fmts=("jpeg",))
        imgs = generate_images(spark, 8, lay)

        def reencode(batches):
            from gdalcubes_spark.jpegcodec import decode_baseline, encode_progressive
            for pdf in batches:
                if len(pdf):
                    pdf = pdf.copy()
                    pdf["bytes"] = [encode_progressive(decode_baseline(bytes(b)), quality=90)
                                    for b in pdf["bytes"]]
                yield pdf

        prog = imgs.mapInPandas(reencode, imgs.schema)
        v = CubeView.create(srs="EPSG:4326", left=0, right=4, bottom=0, top=4,
                            t0="2021-01-01", t1="2021-01-02", dt="P1D", dx=0.25, dy=0.25,
                            aggregation="first", resampling="near")
        g = ChunkGrid(nt=v.nt, ny=v.ny, nx=v.nx, ct=1, cy=8, cx=8)
        base_arr = raster_cube(imgs, v, band_names(lay), chunking=g).collect_array()
        # progressive payloads are a re-encode of the DECODED baseline pixels
        # at q90 — decode both and compare within the lossy PSNR gate
        prog_arr = raster_cube(prog, v, band_names(lay), chunking=g).collect_array()
        assert prog_arr.shape == base_arr.shape
        assert not np.any(np.isnan(prog_arr))
        mse = np.nanmean((prog_arr - base_arr) ** 2)
        assert 10 * np.log10(255.0 ** 2 / max(mse, 1e-12)) >= 40.0


@pytest.mark.skipif(not HAVE_PIL, reason="PIL/libjpeg not in this container — "
                    "seam contract documented; runs wherever Pillow exists")
class TestLibjpegParitySeam:
    """The 'production cluster swaps in libjpeg at the codecs.decode seam'
    claim, executable (r3 VERDICT item 4): our decoder must agree with
    libjpeg within the PSNR gate on OUR streams, and decode libjpeg-made
    progressive streams at all."""

    def _psnr(self, x, y):
        mse = np.mean((x.astype(np.float64) - y.astype(np.float64)) ** 2)
        return 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))

    def test_our_streams_match_libjpeg_decode(self):
        import io

        import PIL.Image
        a = _rand((3, 40, 40), seed=1)
        for enc in (J.encode_baseline, J.encode_progressive):
            b = enc(a, quality=90)
            ours = J.decode_baseline(b)
            theirs = np.array(PIL.Image.open(io.BytesIO(b))).transpose(2, 0, 1)
            # IDCT/upsample rounding differs by impl; parity gate is PSNR
            assert self._psnr(ours, theirs) >= 40.0

    def test_we_decode_libjpeg_progressive(self):
        import io

        import PIL.Image
        a = _rand((3, 40, 40), seed=2)
        buf = io.BytesIO()
        PIL.Image.fromarray(a.transpose(1, 2, 0)).save(
            buf, format="JPEG", quality=90, progressive=True)
        ours = J.decode_baseline(buf.getvalue())
        theirs = np.array(PIL.Image.open(io.BytesIO(buf.getvalue()))).transpose(2, 0, 1)
        assert self._psnr(ours, theirs) >= 40.0
