"""Sinks: typed export packing (cube.h:52-96 / ncdf auto_unpack), the PNG
per-slice export (write_tif analogue, cube.cpp:292-615), and the Iceberg DDL
seam."""

import glob
import os

import numpy as np
import pytest

from gdalcubes_spark import codecs
from gdalcubes_spark.cube import cube_from_array, dummy_cube, read_parquet_cube
from gdalcubes_spark.grid import ChunkGrid, CubeView
from gdalcubes_spark.packing import Packing


def _view(n=4, nx=8, ny=8):
    return CubeView.create(srs="EPSG:4326", left=0, right=nx, bottom=0, top=ny,
                           t0="2021-01-01", t1=f"2021-01-{n:02d}", dt="P1D", dx=1.0, dy=1.0)


class TestPackingUnit:
    def test_uint8_roundtrip_and_nodata(self):
        p = Packing(type="uint8", scale=0.5, offset=10.0)
        v = np.array([10.0, 10.5, 100.0, np.nan, 500.0])  # 500 clips to (254*0.5)+10
        out = p.unpack(p.pack(v), (5,))
        assert np.allclose(out[:3], [10.0, 10.5, 100.0])
        assert np.isnan(out[3])
        assert out[4] == 254 * 0.5 + 10  # clipped below the 255 nodata code
    def test_int16_negative_nodata(self):
        p = Packing(type="int16", scale=0.1, offset=-5.0)
        v = np.array([-5.0, 0.0, np.nan])
        out = p.unpack(p.pack(v), (3,))
        assert np.allclose(out[:2], [-5.0, 0.0], atol=0.05)
        assert np.isnan(out[2])

    def test_float32_nan_nodata(self):
        p = Packing(type="float32")
        v = np.array([1.5, np.nan, -2.25])
        out = p.unpack(p.pack(v), (3,))
        assert np.allclose(out[[0, 2]], [1.5, -2.25])
        assert np.isnan(out[1])

    def test_json_roundtrip(self):
        for p in (Packing(), Packing(type="uint16", scale=2.0, offset=1.0),
                  Packing(type="float32")):
            q = Packing.from_json(p.to_json())
            assert q.type == p.type and q.scale == p.scale and q.offset == p.offset


class TestPackedWrite:
    def test_roundtrip_at_packing_precision(self, spark, tmp_path):
        v = _view()
        rng = np.random.default_rng(7)
        arr = rng.uniform(0, 100, size=(1, 4, 8, 8))
        arr[0, 1, 2, 3] = np.nan
        c = cube_from_array(spark, arr, v, chunking=ChunkGrid(nt=4, ny=8, nx=8, ct=2, cy=4, cx=4))
        p = str(tmp_path / "packed")
        c.write_parquet(p, packing=Packing(type="uint16", scale=100.0 / 65534, offset=0.0))
        back = read_parquet_cube(spark, p).collect_array()
        assert np.isnan(back[0, 1, 2, 3])
        ok = ~np.isnan(arr)
        assert np.allclose(back[ok], arr[ok], atol=100.0 / 65534 + 1e-9)

    def test_uint8_checkpoint_is_8x_smaller(self, spark, tmp_path):
        # realistic chunk size (256×256) so parquet framing is amortized:
        # the 8× payload shrink must survive to disk (~7× after framing)
        v = _view(n=4, nx=256, ny=256)
        rng = np.random.default_rng(3)
        arr = rng.uniform(0, 255, size=(1, 4, 256, 256))
        c = cube_from_array(spark, arr, v, chunking=ChunkGrid(nt=4, ny=256, nx=256, ct=2, cy=128, cx=128))
        raw_p, packed_p = str(tmp_path / "raw"), str(tmp_path / "packed")
        c.write_parquet(raw_p)
        c.write_parquet(packed_p, packing="uint8")

        def du(d):
            return sum(os.path.getsize(f) for f in glob.glob(f"{d}/*.parquet"))

        ratio = du(raw_p) / du(packed_p)
        assert ratio > 6.0, ratio

    def test_packing_by_name(self, spark, tmp_path):
        v = _view()
        c = dummy_cube(spark, v, 1, 42.0, chunking=ChunkGrid(nt=4, ny=8, nx=8, ct=4, cy=8, cx=8))
        p = str(tmp_path / "byname")
        c.write_parquet(p, packing="int32")
        assert np.allclose(read_parquet_cube(spark, p).collect_array(), 42.0)


class TestPngSlices:
    def test_one_file_per_slice_decodable(self, spark, tmp_path):
        v = _view(n=3, nx=8, ny=8)
        arr = np.arange(3 * 64, dtype="float64").reshape(1, 3, 8, 8) % 256
        c = cube_from_array(spark, arr, v, chunking=ChunkGrid(nt=3, ny=8, nx=8, ct=1, cy=4, cx=4))
        out = str(tmp_path / "png")
        rows = c.write_png_slices(out, vmin=0.0, vmax=255.0).collect()
        assert len(rows) == 3
        files = sorted(glob.glob(f"{out}/slice_*.png"))
        assert len(files) == 3
        # decode slice 0 and compare against the source values (scale 1:1)
        a = codecs.decode(open(files[0], "rb").read(), "png")
        assert a.shape == (1, 8, 8)
        assert np.allclose(a[0], arr[0, 0])

    def test_rgb_export(self, spark, tmp_path):
        v = _view(n=1, nx=8, ny=8)
        arr = np.stack([np.full((1, 8, 8), 10.0 * (i + 1)) for i in range(3)]).reshape(3, 1, 8, 8)
        c = cube_from_array(spark, arr, v, chunking=ChunkGrid(nt=1, ny=8, nx=8, ct=1, cy=8, cx=8))
        out = str(tmp_path / "rgb")
        rows = c.write_png_slices(out, band=["band1", "band2", "band3"], vmin=0, vmax=255).collect()
        a = codecs.decode(open(rows[0]["file"], "rb").read(), "png")
        assert a.shape == (3, 8, 8)
        assert np.allclose(a[0], 10) and np.allclose(a[1], 20) and np.allclose(a[2], 30)

    def test_two_band_rejected(self, spark, tmp_path):
        v = _view(n=1)
        c = dummy_cube(spark, v, 2, 1.0)
        with pytest.raises(ValueError):
            c.write_png_slices(str(tmp_path / "x"), band=["band1", "band2"])


class TestIcebergSeam:
    def test_ddl_string(self, spark):
        v = _view()
        c = dummy_cube(spark, v, 1, 1.0)
        ddl = c.iceberg_ddl("cat.db.chunks")
        assert ddl.startswith("CREATE TABLE cat.db.chunks")
        assert "USING iceberg" in ddl and "PARTITIONED BY (ct)" in ddl
        for col in ("chunk_id BIGINT", "ct INT", "data BINARY", "_meta_pack STRING"):
            assert col in ddl, col

    def test_iceberg_format_falls_back_to_parquet(self, spark, tmp_path):
        # no Iceberg catalog in this sandbox: the seam must degrade to a
        # readable parquet layout with identical contents
        v = _view()
        c = dummy_cube(spark, v, 1, 5.0, chunking=ChunkGrid(nt=4, ny=8, nx=8, ct=2, cy=8, cx=8))
        p = str(tmp_path / "iceberg_fallback")
        c.write_parquet(p, format="iceberg")
        assert np.allclose(read_parquet_cube(spark, p).collect_array(), 5.0)
