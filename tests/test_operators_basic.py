"""Operator golden tests on dummy/empty cubes — values from the reference
suite (inst/tinytest/test_reduce_time.R, test_crop.R, test_slice_*.R,
test_selection.R)."""

import numpy as np
import pytest

from gdalcubes_spark.cube import Cube, cube_from_array, dummy_cube, empty_cube
from gdalcubes_spark.grid import ChunkGrid, CubeView


def daily_view(nx=10, ny=10, agg="first"):
    # 10x10 spatial, 365 daily steps (test_reduce_time.R:4-8 style)
    return CubeView.create(srs="EPSG:4326", left=0, right=10, bottom=0, top=10,
                           t0="2021-01-01", t1="2021-12-31", dt="P1D", dx=1.0, dy=1.0,
                           aggregation=agg)


@pytest.fixture(scope="module")
def c365(spark):
    v = daily_view()
    g = ChunkGrid(nt=v.nt, ny=v.ny, nx=v.nx, ct=100, cy=4, cx=5)  # deliberately awkward chunking
    return dummy_cube(spark, v, nbands=1, fill=1.0, chunking=g)


class TestReduceTime:
    def test_golden_fill1(self, c365):
        # test_reduce_time.R:9-18: sum=365, mean=median=min=max=1, var=sd=0
        r = c365.reduce_time("sum(band1)", "mean(band1)", "median(band1)",
                             "min(band1)", "max(band1)", "var(band1)", "count(band1)")
        a = r.collect_array()
        assert a.shape == (7, 1, 10, 10)
        assert np.allclose(a[0], 365.0)
        assert np.allclose(a[1], 1.0) and np.allclose(a[2], 1.0)
        assert np.allclose(a[3], 1.0) and np.allclose(a[4], 1.0)
        assert np.allclose(a[5], 0.0)
        assert np.allclose(a[6], 365.0)
        assert r.bands == ["band1_sum", "band1_mean", "band1_median", "band1_min",
                           "band1_max", "band1_var", "band1_count"]

    def test_empty_cube_all_nan(self, spark):
        # test_reduce_time.R:24-27: empty in → all NaN out (even sum/count)
        v = daily_view()
        e = empty_cube(spark, v, nbands=1)
        a = e.reduce_time("sum(band1)", "count(band1)").collect_array()
        assert np.all(np.isnan(a))

    def test_narrow_path_ct1(self, spark):
        v = daily_view()
        g = ChunkGrid(nt=v.nt, ny=v.ny, nx=v.nx, ct=v.nt, cy=10, cx=10)  # nct == 1
        c = dummy_cube(spark, v, nbands=1, fill=2.0, chunking=g)
        a = c.reduce_time("sum(band1)", "var(band1)").collect_array()
        assert np.allclose(a[0], 730.0) and np.allclose(a[1], 0.0)

    def test_which_max(self, spark):
        # value increases with it → which_max = last day (to_double encoding)
        v = daily_view()
        g = ChunkGrid(nt=v.nt, ny=v.ny, nx=v.nx, ct=50, cy=10, cx=10)
        c = dummy_cube(spark, v, nbands=1, fill=1.0, chunking=g).apply_pixel("it", ["t_idx"])
        a = c.reduce_time("which_max(t_idx)", "which_min(t_idx)").collect_array()
        assert np.allclose(a[0], 20211231000000.0)
        assert np.allclose(a[1], 20210101000000.0)

    def test_median_even_count_averaging(self, spark):
        # 4 slices valued 0,1,2,3 → exact median 1.5 (reduce_time.cpp:376-394)
        v = CubeView.create(srs="EPSG:4326", left=0, right=2, bottom=0, top=2,
                            t0="2021-01-01", t1="2021-01-04", dt="P1D", dx=1.0, dy=1.0)
        arr = np.arange(4, dtype="float64").reshape(1, 4, 1, 1) * np.ones((1, 4, 2, 2))
        g = ChunkGrid(nt=4, ny=2, nx=2, ct=1, cy=2, cx=2)
        c = cube_from_array(spark, arr, v, chunking=g)
        a = c.reduce_time("median(band1)", "Q1(band1)", "Q3(band1)").collect_array()
        assert np.allclose(a[0], 1.5)
        assert np.allclose(a[1], 0.75)  # HF-7
        assert np.allclose(a[2], 2.25)


class TestReduceSpace:
    def test_fill1(self, c365):
        r = c365.reduce_space("sum(band1)", "mean(band1)", "count(band1)", "sd(band1)")
        a = r.collect_array()
        assert a.shape == (4, 365, 1, 1)
        assert np.allclose(a[0], 100.0)
        assert np.allclose(a[1], 1.0)
        assert np.allclose(a[2], 100.0)
        assert np.allclose(a[3], 0.0)

    def test_median_gather(self, spark):
        v = CubeView.create(srs="EPSG:4326", left=0, right=4, bottom=0, top=1,
                            t0="2021-01-01", t1="2021-01-02", dt="P1D", dx=1.0, dy=1.0)
        arr = np.array([[1.0, 2.0, 3.0, 4.0]]).reshape(1, 1, 1, 4) * np.ones((1, 2, 1, 4))
        g = ChunkGrid(nt=2, ny=1, nx=4, ct=1, cy=1, cx=2)
        c = cube_from_array(spark, arr, v, chunking=g)
        a = c.reduce_space("median(band1)").collect_array()
        assert np.allclose(a[0], 2.5)


class TestApplyFilter:
    def test_apply_ndvi_style(self, spark):
        v = daily_view()
        g = ChunkGrid(nt=365, ny=10, nx=10, ct=365, cy=5, cx=5)
        c = dummy_cube(spark, v, nbands=2, fill=2.0, chunking=g)
        r = c.apply_pixel("(band1 - band2) / (band1 + band2 + 1)", ["idx"])
        a = r.collect_array()
        assert a.shape == (1, 365, 10, 10)
        assert np.allclose(a, 0.0)

    def test_keep_bands_and_coord_vars(self, spark):
        v = daily_view()
        g = ChunkGrid(nt=365, ny=10, nx=10, ct=100, cy=4, cx=3)
        c = dummy_cube(spark, v, 1, 7.0, chunking=g)
        r = c.apply_pixel(["ix + iy", "it"], ["sxy", "t"], keep_bands=True)
        assert r.bands == ["band1", "sxy", "t"]
        a = r.collect_array()
        assert np.allclose(a[0], 7.0)
        iy, ix = np.meshgrid(np.arange(10), np.arange(10), indexing="ij")
        assert np.allclose(a[1, 0], ix + iy)
        assert np.allclose(a[2, :, 0, 0], np.arange(365))

    def test_filter_pixel_preserves_shape(self, spark):
        v = daily_view()
        c = dummy_cube(spark, v, 1, 5.0, chunking=ChunkGrid(nt=365, ny=10, nx=10, ct=365, cy=10, cx=10))
        r = c.apply_pixel("ix", ["vx"]).filter_pixel("vx > 4.5")
        a = r.collect_array()
        assert a.shape == (1, 365, 10, 10)
        assert np.all(np.isnan(a[:, :, :, :5]))
        assert np.allclose(a[0, :, :, 5:], np.arange(5, 10))


class TestSelection:
    def test_select_rename(self, spark):
        v = daily_view()
        c = dummy_cube(spark, v, 3, 1.0)
        r = c.select_bands(["band3", "band1"]).rename_bands({"band3": "B3"})
        assert r.bands == ["B3", "band1"]
        assert r.collect_array().shape == (2, 365, 10, 10)

    def test_slice_time(self, spark):
        v = daily_view()
        g = ChunkGrid(nt=365, ny=10, nx=10, ct=100, cy=10, cx=10)
        c = dummy_cube(spark, v, 1, 1.0, chunking=g).apply_pixel("it", ["t"])
        s = c.slice_time(t="2021-02-01")
        a = s.collect_array()
        assert a.shape == (1, 1, 10, 10)
        assert np.allclose(a, 31.0)

    def test_slice_space(self, spark):
        v = daily_view()
        c = dummy_cube(spark, v, 1, 1.0).apply_pixel("ix*100 + iy", ["v"])
        s = c.slice_space(ix=3, iy=7)
        a = s.collect_array()
        assert a.shape == (1, 365, 1, 1)
        assert np.allclose(a, 307.0)

    def test_select_time(self, spark):
        v = daily_view()
        g = ChunkGrid(nt=365, ny=10, nx=10, ct=30, cy=10, cx=10)
        c = dummy_cube(spark, v, 1, 1.0, chunking=g).apply_pixel("it", ["t"])
        s = c.select_time(["2021-01-01", "2021-06-01", "2021-12-31"])
        a = s.collect_array()
        assert a.shape == (1, 3, 10, 10)
        assert np.allclose(a[0, 0], 0.0)
        assert np.allclose(a[0, 1], 151.0)
        assert np.allclose(a[0, 2], 364.0)

    def test_crop(self, spark):
        # test_crop.R:7-29 style: crop dims + coordinate variables survive
        v = daily_view()
        g = ChunkGrid(nt=365, ny=10, nx=10, ct=100, cy=4, cx=3)
        c = dummy_cube(spark, v, 1, 1.0, chunking=g).apply_pixel("ix", ["vx"])
        r = c.crop(left=2.0, right=7.0, bottom=3.0, top=8.0, t0="2021-02-01", t1="2021-02-28")
        assert (r.view.nx, r.view.ny, r.view.nt) == (5, 5, 28)
        a = r.collect_array()
        assert a.shape == (1, 28, 5, 5)
        # original global ix values 2..6 survive the crop
        assert np.allclose(a[0, 0, 0], np.arange(2, 7))


class TestSelectionSugar:
    def test_getitem_chunking_invariant(self, spark):
        # test_selection.R:7-38: pixel (240,240) identical across chunkings
        v = CubeView.create(srs="EPSG:4326", left=5, right=10, bottom=48, top=53,
                            t0="2021-01-01", t1="2021-12-31", dt="P1M", dx=0.02, dy=0.02)
        vals = []
        for cyx in (67, 160, 256):
            g = ChunkGrid(nt=v.nt, ny=v.ny, nx=v.nx, ct=1, cy=cyx, cx=cyx)
            cube = dummy_cube(spark, v, 1, 0.0, chunking=g).apply_pixel(["ix", "iy"], ["ix", "iy"])
            x = cube[None, None, 240, 240].collect_array()
            assert np.all(x[0] == 240) and np.all(x[1] == 240), cyx
            vals.append(x)
        assert np.allclose(vals[0], vals[1]) and np.allclose(vals[1], vals[2])

    def test_getitem_band_and_time(self, spark):
        v = daily_view()
        c = dummy_cube(spark, v, 3, 1.0).apply_pixel("it", ["t"], keep_bands=True)
        s = c["t", "2021-03-01"]
        a = s.collect_array()
        assert a.shape == (1, 1, 10, 10)
        assert np.allclose(a, 59.0)

    def test_getitem_spatial_slices(self, spark):
        v = daily_view()
        c = dummy_cube(spark, v, 1, 1.0)
        s = c[None, None, slice(2, 8), slice(3, 7)]
        assert (s.view.ny, s.view.nx) == (6, 4)


class TestReduceSpaceGolden:
    """Verbatim port of inst/tinytest/test_reduce_space.R + slice goldens."""

    def _v(self):
        return CubeView.create(srs="EPSG:4326", left=5, right=10, bottom=48, top=53,
                               t0="2021-01-01", t1="2021-12-31", dt="P1D", dx=0.05, dy=0.05)

    def test_mixed_reducers_100x100(self, spark):
        v = self._v()
        g = ChunkGrid(nt=v.nt, ny=v.ny, nx=v.nx, ct=365, cy=64, cx=64)
        c = dummy_cube(spark, v, 3, 1.0, chunking=g)
        x = c.reduce_space("sum(band1)", "median(band2)", "mean(band3)",
                           "min(band1)", "max(band2)", "var(band3)").collect_array()
        assert np.all(x[0] == 100 * 100)
        assert np.all(x[1] == 1) and np.all(x[2] == 1)
        assert np.all(x[3] == 1) and np.all(x[4] == 1)
        assert np.allclose(x[5], 0)

    def test_empty_all_nan(self, spark):
        x = empty_cube(spark, self._v(), 3).reduce_space(
            "sum(band1)", "median(band2)", "var(band3)").collect_array()
        assert np.all(np.isnan(x))

    def test_names_override(self, spark):
        c = dummy_cube(spark, self._v(), 3, 1.0)
        r = c.reduce_space("sum(band1)", "median(band2)", names=["A", "B"])
        assert r.bands == ["A", "B"]

    def test_median_of_time_ramp(self, spark):
        v = self._v()
        g = ChunkGrid(nt=v.nt, ny=v.ny, nx=v.nx, ct=100, cy=100, cx=100)
        x = (dummy_cube(spark, v, 1, 1.0, chunking=g).apply_pixel("it", ["t"])
             .reduce_space("median(t)").collect_array())
        assert np.array_equal(x[0, :, 0, 0], np.arange(365.0))

    def test_slice_space_time_ramp(self, spark):
        # test_slice_time.R: slice at (6.123, 49.26933) → the it ramp
        v = self._v()
        c = dummy_cube(spark, v, 1, 1.0).apply_pixel("it", ["t"])
        x = c.slice_space(x=6.123, y=49.26933).collect_array()
        assert np.array_equal(x[0, :, 0, 0], np.arange(365.0))

    def test_reduce_time_udf_two_outputs(self, spark):
        # test_reduce_space.R UDF block: fn sees (nb, nt), returns 2 values
        from gdalcubes_spark.operators.stream import reduce_time_udf
        v = CubeView.create(srs="EPSG:4326", left=5, right=10, bottom=48, top=53,
                            t0="2021-01-01", t1="2021-12-31", dt="P1D", dx=0.5, dy=0.5)
        c = dummy_cube(spark, v, 2, 1.0)
        r = reduce_time_udf(
            c, lambda s: np.array([np.max(s[0] + np.arange(1, s.shape[1] + 1)),
                                   float(np.mean(s[1]))]), ["A", "B"])
        assert r.bands == ["A", "B"]
        x = r.collect_array()
        assert np.all(x[0] == 366.0)
        assert np.all(x[1] == 1.0)
