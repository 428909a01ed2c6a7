"""Golden tests for the grid kernel, asserting the exact values of the
reference suite (/root/reference/inst/tinytest/test_cube_view.R and
src/gdalcubes/src/test/test_view.cpp)."""

import math

import pytest

from gdalcubes_spark.grid import ChunkGrid, CubeView, Datetime, Duration, Unit, default_chunking


def V(t0, t1, dt=None, dx=0.01, dy=0.01, **kw):
    return CubeView.create(
        srs="EPSG:4326", left=5, right=10, bottom=48, top=53, t0=t0, t1=t1, dt=dt, dx=dx, dy=dy, **kw
    )


class TestDuration:
    def test_parse(self):
        assert Duration.parse("P1M") == Duration(1, Unit.MONTH)
        assert Duration.parse("P16D") == Duration(16, Unit.DAY)
        assert Duration.parse("PT1H") == Duration(1, Unit.HOUR)
        assert Duration.parse("PT30M") == Duration(30, Unit.MINUTE)
        assert Duration.parse("P2Y") == Duration(2, Unit.YEAR)
        assert str(Duration.parse("P1M")) == "P1M"
        assert str(Duration.parse("PT5S")) == "PT5S"

    def test_mixed_unit_division_raises(self):
        with pytest.raises(ValueError):
            Duration(1, Unit.MONTH) // Duration(1, Unit.DAY)


class TestDatetime:
    def test_unit_inference(self):
        assert Datetime.parse("2021").unit == Unit.YEAR
        assert Datetime.parse("2021-03").unit == Unit.MONTH
        assert Datetime.parse("2021-03-05").unit == Unit.DAY
        assert Datetime.parse("2021-03-05T12").unit == Unit.HOUR
        assert Datetime.parse("2021-03-05T12:30").unit == Unit.MINUTE
        assert Datetime.parse("2021-03-05T12:30:59").unit == Unit.SECOND

    def test_month_arithmetic_clamps(self):
        d = Datetime.parse("2021-01-31").add(Duration(1, Unit.MONTH))
        assert d.to_string() == "2021-02-28"
        d = Datetime.parse("2016-02-29").add(Duration(1, Unit.YEAR))
        assert d.to_string() == "2017-02-28"

    def test_diff_units(self):
        a, b = Datetime.parse("2021-03-01"), Datetime.parse("2021-01-31")
        assert (a - b) == Duration(29, Unit.DAY)
        a, b = Datetime.parse("2021-03"), Datetime.parse("2020-11")
        assert (a - b) == Duration(4, Unit.MONTH)

    def test_to_double(self):
        assert Datetime.parse("2018-04-01T12:30:59").to_double() == 20180401123059.0


class TestCubeViewGolden:
    """test_cube_view.R:1-67 verbatim expectations."""

    def test_daily(self):
        v = V("2021-01-01", "2021-12-31", "P1D")
        assert (v.nx, v.ny, v.nt) == (500, 500, 365)
        assert math.isclose(v.dx, 0.01) and math.isclose(v.dy, 0.01)

    def test_monthly_from_days(self):
        v = V("2021-01-01", "2021-12-31", "P1M")
        assert v.nt == 12
        assert v.t0.to_string() == "2021-01-01"
        assert v.t1.to_string() == "2021-12-31"

    def test_monthly_interior_dates(self):
        v = V("2021-01-06", "2021-12-15", "P1M")
        assert v.nt == 12
        assert v.t0.to_string() == "2021-01-01"
        assert v.t1.to_string() == "2021-12-31"

    def test_p2m(self):
        v = V("2021-01", "2021-05", "P2M")
        assert v.nt == 3
        assert v.t0.to_string() == "2021-01-01"
        assert v.t1.to_string() == "2021-06-30"

    def test_p2y(self):
        v = V("2021-01", "2021-05", "P2Y")
        assert v.nt == 1
        assert v.t0.to_string() == "2021-01-01"
        assert v.t1.to_string() == "2022-12-31"

    def test_p1d_from_months(self):
        v = V("2021-01", "2021-05", "P1D")
        assert v.t0.to_string() == "2021-01-01"
        assert v.t1.to_string() == "2021-05-31"

    def test_p2d_from_months(self):
        v = V("2021-01", "2021-05", "P2D")
        assert v.t0.to_string() == "2021-01-01"
        assert v.t1.to_string() == "2021-06-01"

    def test_x_misalignment_symmetric_enlargement(self):
        # view.cpp:187-198: extent enlarged by (n*delta-(max-min))/2 both sides
        v = CubeView.create(
            srs="EPSG:4326", left=0, right=1, bottom=0, top=1,
            t0="2021-01-01", t1="2021-01-01", dt="P1D", dx=0.3, dy=0.3,
        )
        assert v.nx == 4 and v.ny == 4
        assert math.isclose(v.left, -0.1) and math.isclose(v.right, 1.1)
        assert math.isclose(v.bottom, -0.1) and math.isclose(v.top, 1.1)

    def test_json_roundtrip(self):
        v = V("2021-01-06", "2021-12-15", "P1M", aggregation="median", resampling="bilinear")
        v2 = CubeView.from_json(v.to_json())
        assert v2.nt == v.nt and v2.nx == v.nx
        assert v2.t0.to_string() == v.t0.to_string()
        assert v2.dt == v.dt


class TestCellMath:
    def test_cell_coords(self):
        v = V("2021-01-01", "2021-12-31", "P1D")
        # y counts downward from top (view.cpp:416-422)
        it, iy, ix = v.cell_coords(5.005, 52.995, Datetime.parse("2021-01-01"))
        assert (it, iy, ix) == (0, 0, 0)
        it, iy, ix = v.cell_coords(9.995, 48.005, Datetime.parse("2021-12-31"))
        assert (it, iy, ix) == (364, 499, 499)

    def test_index_at_datetime_monthly(self):
        v = V("2021-01-01", "2021-12-31", "P1M")
        assert v.index_at_datetime(Datetime.parse("2021-01-15")) == 0
        assert v.index_at_datetime(Datetime.parse("2021-03-01")) == 2
        assert v.index_at_datetime(Datetime.parse("2021-12-31")) == 11


class TestChunkGrid:
    def test_linearization(self):
        g = ChunkGrid(nt=10, ny=10, nx=10, ct=3, cy=4, cx=5)
        assert (g.nct, g.ncy, g.ncx) == (4, 3, 2)
        assert g.n_chunks == 24
        # id = ct*(ncy*ncx) + cy*ncx + cx  (cube.h:495-497)
        assert g.chunk_id(0, 0, 0) == 0
        assert g.chunk_id(1, 2, 1) == 1 * 6 + 2 * 2 + 1
        for cid in range(g.n_chunks):
            assert g.chunk_id(*g.chunk_coords(cid)) == cid

    def test_boundary_clamp(self):
        g = ChunkGrid(nt=10, ny=10, nx=10, ct=3, cy=4, cx=5)
        assert g.chunk_shape(3, 2, 1) == (1, 2, 5)
        assert g.chunk_cell_range(3, 2, 1) == ((9, 10), (8, 10), (5, 10))

    def test_find_chunk(self):
        g = ChunkGrid(nt=10, ny=10, nx=10, ct=3, cy=4, cx=5)
        assert g.find_chunk_containing(9, 9, 9) == g.chunk_id(3, 2, 1)

    def test_default_chunking_multiple_of_64(self):
        v = V("2021-01-01", "2021-12-31", "P1D", dx=0.001, dy=0.001)  # 5000x5000
        g = default_chunking(v, parallelism=32)
        assert g.ct == 1
        assert g.cy % 64 == 0 and 64 <= g.cy <= 1024
