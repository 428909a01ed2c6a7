"""Verbatim port of inst/tinytest/test_apply_pixel.R — math + the full
coordinate-variable contract (t0/t1 are epoch seconds of [slice_start,
next_slice_start), left/right/top/bottom per-cell bounds)."""

import numpy as np

from gdalcubes_spark.cube import dummy_cube
from gdalcubes_spark.grid import ChunkGrid, CubeView, Datetime


def _view():
    return CubeView.create(srs="EPSG:4326", left=5, right=10, bottom=48, top=53,
                           t0="2021-01-01", t1="2021-12-31", dt="P6M", dx=0.01, dy=0.01)


class TestApplyPixelGolden:
    def test_simple_math(self, spark):
        v = _view()
        g = ChunkGrid(nt=v.nt, ny=v.ny, nx=v.nx, ct=1, cy=256, cx=256)
        x = (dummy_cube(spark, v, 3, 1.0, chunking=g)
             .apply_pixel(["band1 - band2", "band1 * 2", "sqrt(band3)", "1", "cos(pi)"])
             .collect_array())
        assert np.all(x[0] == 0)
        assert np.all(x[1] == 2)
        assert np.all(x[2] == 1)
        assert np.all(x[3] == 1)
        assert np.allclose(x[4], -1)

    def test_dimension_variables(self, spark):
        v = _view()
        g = ChunkGrid(nt=v.nt, ny=v.ny, nx=v.nx, ct=1, cy=256, cx=256)
        x = (dummy_cube(spark, v, 1, 1.0, chunking=g)
             .apply_pixel(["it", "iy", "ix", "left", "right", "top", "bottom", "t0", "t1"])
             .collect_array())
        assert (x[0].min(), x[0].max()) == (0, 1)
        assert (x[1].min(), x[1].max()) == (0, 499)
        assert (x[2].min(), x[2].max()) == (0, 499)
        assert np.isclose(x[3].min(), v.left) and np.isclose(x[3].max(), v.right - v.dx)
        assert np.isclose(x[4].min(), v.left + v.dx) and np.isclose(x[4].max(), v.right)
        assert np.isclose(x[5].min(), v.bottom + v.dy) and np.isclose(x[5].max(), v.top)
        assert np.isclose(x[6].min(), v.bottom) and np.isclose(x[6].max(), v.top - v.dy)
        # t0/t1 ranges are slice-start epochs: Jan 1 / Jul 1; next: Jul 1 / Jan 1 '22
        assert x[7].min() == Datetime.parse("2021-01-01").epoch()
        assert x[7].max() == Datetime.parse("2021-07-01").epoch()
        assert x[8].min() == Datetime.parse("2021-07-01").epoch()
        assert x[8].max() == Datetime.parse("2022-01-01").epoch()
