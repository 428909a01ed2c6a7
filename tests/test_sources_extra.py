"""stack_cube (simple_cube), translate_format, streamed-reduce UDFs."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdalcubes_spark.grid import ChunkGrid, CubeView
from gdalcubes_spark.sources.simple_cube import stack_cube
from gdalcubes_spark.synth import ImageLayout, band_names, generate_images


class TestStackCube:
    def test_identity_placement(self, spark):
        # all images share one grid (gx=gy=1) → pixels land 1:1 in the cube
        lay = ImageLayout(left0=0, top0=4, tile_dx=4.0, tile_dy=4.0, gx=1, gy=1,
                          ntime=3, tile_w=16, tile_h=16, nb=2, fmts=("raw",))
        imgs = generate_images(spark, 3, lay)
        c = stack_cube(imgs, band_names(lay), dt="P1D",
                       chunking=ChunkGrid(nt=3, ny=16, nx=16, ct=1, cy=16, cx=16))
        assert (c.view.nx, c.view.ny, c.view.nt) == (16, 16, 3)
        a = c.collect_array()
        for i in range(3):
            want = lay.decoded_pixels(i).astype("float64")
            assert np.array_equal(a[:, i], want), i  # byte-exact placement

    def test_mixed_grids_rejected(self, spark):
        lay1 = ImageLayout(gx=1, gy=1, ntime=1, tile_w=16, tile_h=16, nb=1, fmts=("raw",))
        lay2 = ImageLayout(gx=1, gy=1, ntime=1, tile_w=8, tile_h=8, nb=1, fmts=("raw",))
        imgs = generate_images(spark, 1, lay1).unionByName(
            generate_images(spark, 1, lay2).withColumn("image_id", F.lit("img_x")))
        with pytest.raises(ValueError, match="identical grids"):
            stack_cube(imgs, ["B01"])


class TestTranslateFormat:
    def test_lossless_reencode(self, spark):
        from gdalcubes_spark import codecs
        from gdalcubes_spark.pipeline.multimodal import translate_format
        lay = ImageLayout(gx=2, gy=2, ntime=1, tile_w=8, tile_h=8, nb=1, fmts=("raw",))
        imgs = generate_images(spark, 4, lay)
        out = translate_format(imgs, "png").toPandas().sort_values("image_id")
        assert set(out["fmt"]) == {"png"}
        for i, (_, row) in enumerate(out.iterrows()):
            assert np.array_equal(codecs.decode(bytes(row["bytes"]), "png"), lay.pixels(i))
            assert row["caption"].startswith(f"synthetic scene {i} ")  # metadata preserved


class TestReduceUdf:
    def _cube(self, spark, ct):
        from gdalcubes_spark.cube import cube_from_array
        v = CubeView.create(srs="EPSG:4326", left=0, right=2, bottom=0, top=2,
                            t0="2021-01-01", t1="2021-01-06", dt="P1D", dx=1.0, dy=1.0)
        arr = np.arange(6, dtype="float64").reshape(1, 6, 1, 1) * np.ones((1, 6, 2, 2))
        return cube_from_array(spark, arr, v, chunking=ChunkGrid(nt=6, ny=2, nx=2, ct=ct, cy=2, cx=2))

    @pytest.mark.parametrize("ct", [6, 2])
    def test_reduce_time_udf(self, spark, ct):
        from gdalcubes_spark.operators.stream import reduce_time_udf
        c = self._cube(spark, ct)
        r = reduce_time_udf(c, lambda s: np.nansum(s, axis=1), ["total"])
        a = r.collect_array()
        assert a.shape == (1, 1, 2, 2)
        assert np.allclose(a, 15.0)

    def test_reduce_space_udf(self, spark):
        from gdalcubes_spark.operators.stream import reduce_space_udf
        c = self._cube(spark, 2)
        r = reduce_space_udf(c, lambda plane: np.nanmean(plane, axis=(1, 2)), ["m"])
        a = r.collect_array()
        assert a.shape == (1, 6, 1, 1)
        assert np.allclose(a[0, :, 0, 0], np.arange(6.0))
