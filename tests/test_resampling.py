"""Scan-level oracles for the full resampling set (view.h:66-79,
warp.cpp:178-196): footprint reductions are EXACT on aligned integer-factor
grids; interpolating kernels (cubic, lanczos) reproduce pixel values at pixel
centers and linear ramps everywhere; cubicspline has linear precision."""

import collections

import numpy as np
import pandas as pd
import pytest

from gdalcubes_spark.grid import ChunkGrid, CubeView
from gdalcubes_spark.sources.raster_cube import raster_cube
from gdalcubes_spark.synth import IMAGE_SCHEMA
from gdalcubes_spark import codecs


def image_df(spark, arr: np.ndarray, bbox=(0.0, 4.0, 0.0, 4.0), epsg=4326):
    """One-image inventory from a given uint8 (nb,h,w) array covering bbox
    (left, right, bottom, top) on 2021-01-01."""
    nb, h, w = arr.shape
    l, r, b, t = bbox
    row = dict(image_id="img_000000000000", bytes=codecs.encode(arr, "raw"),
               w=w, h=h, fmt="raw", caption="resampling fixture",
               phash=codecs.phash64(arr), left=l, right=r, bottom=b, top=t,
               datetime=pd.Timestamp("2021-01-01"), epsg=epsg,
               nleft=l, nright=r, nbottom=b, ntop=t)
    return spark.createDataFrame(pd.DataFrame([row]), IMAGE_SCHEMA)


def view(dx, resampling, left=0.0, right=4.0, bottom=0.0, top=4.0, srs="EPSG:4326"):
    return CubeView.create(srs=srs, left=left, right=right, bottom=bottom, top=top,
                           t0="2021-01-01", t1="2021-01-01", dt="P1D", dx=dx, dy=dx,
                           aggregation="first", resampling=resampling)


def scan(spark, arr, v, **kw):
    g = ChunkGrid(nt=1, ny=v.ny, nx=v.nx, ct=1, cy=max(4, v.ny // 2), cx=max(4, v.nx // 2))
    df = image_df(spark, arr, **{k: kw[k] for k in ("bbox", "epsg") if k in kw})
    return raster_cube(df, v, [f"band{i+1}" for i in range(arr.shape[0])], chunking=g).collect_array()


PATTERN = ((7 * np.arange(32 * 32)) % 251).astype(np.uint8).reshape(1, 32, 32)


def block_oracle(a2d: np.ndarray, k: int, method: str) -> np.ndarray:
    """Reduce k×k blocks of a 2-D array with the footprint semantics."""
    h, w = a2d.shape
    blocks = a2d.reshape(h // k, k, w // k, k).transpose(0, 2, 1, 3).reshape(h // k, w // k, k * k)
    if method == "average":
        return blocks.mean(axis=-1)
    if method == "min":
        return blocks.min(axis=-1)
    if method == "max":
        return blocks.max(axis=-1)
    if method in ("med", "q1", "q3"):
        q = {"med": 50, "q1": 25, "q3": 75}[method]
        return np.percentile(blocks, q, axis=-1)
    if method == "mode":
        out = np.empty(blocks.shape[:2])
        for i in range(blocks.shape[0]):
            for j in range(blocks.shape[1]):
                cnt = collections.Counter(blocks[i, j].tolist())
                best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
                out[i, j] = best[0]
        return out
    raise ValueError(method)


class TestFootprintExact:
    # 32px image over 4°, view dx=0.5° → 4×4 source pixels per cell, aligned
    @pytest.mark.parametrize("method", ["average", "min", "max", "med", "q1", "q3", "mode"])
    def test_downsample_matches_block_oracle(self, spark, method):
        got = scan(spark, PATTERN, view(0.5, method))[0, 0]
        want = block_oracle(PATTERN[0].astype("float64"), 4, method)
        assert got.shape == want.shape
        assert np.allclose(got, want), method

    def test_upsample_average_equals_near(self, spark):
        # no source pixel center inside most cells → nearest fallback
        a_avg = scan(spark, PATTERN, view(1 / 16, "average"))
        a_near = scan(spark, PATTERN, view(1 / 16, "near"))
        assert np.allclose(np.nan_to_num(a_avg, nan=-1), np.nan_to_num(a_near, nan=-1))

    def test_chunking_invariance(self, spark):
        v = view(0.5, "average")
        df = image_df(spark, PATTERN)
        a1 = raster_cube(df, v, ["band1"], chunking=ChunkGrid(nt=1, ny=8, nx=8, ct=1, cy=8, cx=8)).collect_array()
        a2 = raster_cube(df, v, ["band1"], chunking=ChunkGrid(nt=1, ny=8, nx=8, ct=1, cy=3, cx=2)).collect_array()
        assert np.allclose(np.nan_to_num(a1, nan=-1), np.nan_to_num(a2, nan=-1))


class TestKernels:
    def test_cubic_lanczos_exact_at_pixel_centers(self, spark):
        # view dx == source pixel size, same origin → cell centers hit pixel
        # centers exactly; interpolating kernels reproduce the pixel values
        near = scan(spark, PATTERN, view(0.125, "near"))[0, 0]
        for method in ("cubic", "lanczos"):
            got = scan(spark, PATTERN, view(0.125, method))[0, 0]
            assert np.allclose(got[3:-3, 3:-3], near[3:-3, 3:-3], atol=1e-9), method

    @pytest.mark.parametrize("method", ["cubic", "cubicspline", "lanczos"])
    def test_linear_precision(self, spark, method):
        # exact linear ramp along x: cubic/cubicspline have exact linear
        # precision; normalized lanczos-3 is linear only to ~0.04 on this
        # ramp (windowed sinc), so it gets a loose tolerance
        ramp = (2 * np.arange(32) + 10).astype(np.uint8)[None, None, :] * np.ones((1, 32, 1), dtype=np.uint8)
        v = view(0.17, method, left=0.6, right=3.32, bottom=0.6, top=3.32)
        got = scan(spark, ramp.astype(np.uint8), v)[0, 0]
        # expected value at cell center x: pixel coord f=(x-0)/0.125; value = 2*(f-0.5)+10
        xs = 0.6 + (np.arange(v.nx) + 0.5) * 0.17
        want = 2.0 * ((xs - 0.0) / 0.125 - 0.5) + 10.0
        inner = slice(2, -2)
        atol = 0.06 if method == "lanczos" else 1e-6
        assert np.allclose(got[8, inner], want[inner], atol=atol), method

    def test_cubicspline_smooths_but_bounded(self, spark):
        got = scan(spark, PATTERN, view(0.125, "cubicspline"))[0, 0]
        assert not np.any(np.isnan(got))
        assert got.min() >= -1e-6 and got.max() <= 255 + 1e-6


class TestReprojectionPath:
    def test_average_constant_utm_view(self, spark):
        # constant image scanned into a UTM view: supersampled footprint
        # average must return the constant wherever covered
        const = np.full((1, 32, 32), 99, dtype=np.uint8)
        from gdalcubes_spark import srs as S
        E0, N0 = S.geodetic_to_utm(8.1, 51.1, zone=32)
        E1, N1 = S.geodetic_to_utm(8.9, 51.9, zone=32)
        v = CubeView.create(srs="EPSG:32632", left=float(E0), right=float(E1),
                            bottom=float(N0), top=float(N1),
                            t0="2021-01-01", t1="2021-01-01", dt="P1D",
                            nx=16, ny=16, aggregation="first", resampling="average")
        df = image_df(spark, const, bbox=(8.0, 9.0, 51.0, 52.0))
        g = ChunkGrid(nt=1, ny=16, nx=16, ct=1, cy=8, cx=8)
        a = raster_cube(df, v, ["band1"], chunking=g).collect_array()
        covered = ~np.isnan(a)
        assert covered.mean() > 0.9
        assert np.allclose(a[covered], 99.0)

    def test_cubic_constant_utm_view(self, spark):
        const = np.full((1, 32, 32), 55, dtype=np.uint8)
        from gdalcubes_spark import srs as S
        E0, N0 = S.geodetic_to_utm(8.1, 51.1, zone=32)
        E1, N1 = S.geodetic_to_utm(8.9, 51.9, zone=32)
        v = CubeView.create(srs="EPSG:32632", left=float(E0), right=float(E1),
                            bottom=float(N0), top=float(N1),
                            t0="2021-01-01", t1="2021-01-01", dt="P1D",
                            nx=16, ny=16, aggregation="first", resampling="cubic")
        df = image_df(spark, const, bbox=(8.0, 9.0, 51.0, 52.0))
        g = ChunkGrid(nt=1, ny=16, nx=16, ct=1, cy=8, cx=8)
        a = raster_cube(df, v, ["band1"], chunking=g).collect_array()
        covered = ~np.isnan(a)
        assert covered.mean() > 0.9
        assert np.allclose(a[covered], 55.0)
