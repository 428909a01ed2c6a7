"""Physical-plan assertions: the declarative parts of the engine must let
Catalyst do its job — predicate pushdown to parquet, partition pruning on
chunk coords, broadcast of small join sides."""

import numpy as np
from pyspark.sql import functions as F

from gdalcubes_spark.cube import dummy_cube, read_parquet_cube
from gdalcubes_spark.grid import ChunkGrid, CubeView


def view10():
    return CubeView.create(srs="EPSG:4326", left=0, right=10, bottom=0, top=10,
                           t0="2021-01-01", t1="2021-01-06", dt="P1D", dx=1.0, dy=1.0)


class TestPlans:
    def test_chunk_filter_pushed_to_parquet(self, spark, tmp_path):
        # slice_time on a parquet-backed cube: the ct filter must reach the
        # scan as PushedFilters (partition pruning at the storage layer)
        c = dummy_cube(spark, view10(), 1, 1.0, chunking=ChunkGrid(nt=6, ny=10, nx=10, ct=2, cy=5, cx=5))
        p = str(tmp_path / "cube")
        c.write_parquet(p)
        c2 = read_parquet_cube(spark, p)
        s = c2.slice_time(it=3)
        plan = s.df._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters" in plan
        assert "ct" in plan.split("PushedFilters")[1][:200]

    def test_parquet_column_pruning(self, spark):
        # reading 2 columns of lineitem must not scan all 11 (ReadSchema)
        li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        q = li.select("l_orderkey", "l_quantity").filter(F.col("l_orderkey") % 6 == 0)
        plan = q._jdf.queryExecution().executedPlan().toString()
        read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
        assert "l_orderkey" in read_schema and "l_quantity" in read_schema
        assert "l_comment" not in read_schema and "l_extendedprice" not in read_schema

    def test_extract_geom_semi_join_prunes_chunks(self, spark):
        # the chunk-mask analogue: extract_geom only cogroups chunks that
        # have candidate features (left-semi join visible in the plan)
        from gdalcubes_spark.geom import rect_wkt
        from gdalcubes_spark.operators.extract_geom import extract_geom
        c = dummy_cube(spark, view10(), 1, 1.0, chunking=ChunkGrid(nt=6, ny=10, nx=10, ct=6, cy=2, cx=2))
        feats = spark.createDataFrame([(1, rect_wkt(0, 8, 2, 10))], "fid long, wkt string")
        rows = extract_geom(c, feats)
        plan = rows._jdf.queryExecution().executedPlan().toString()
        assert "LeftSemi" in plan
        # and the result is correct: 4 cells × 6 slices
        assert rows.count() == 24

    def test_whole_stage_codegen_for_text_features(self, spark):
        # text analysis must stay JVM-side: no Python UDF nodes in the plan
        from gdalcubes_spark.pipeline.text import text_features
        d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        plan = text_features(d)._jdf.queryExecution().executedPlan().toString()
        assert plan.lstrip().startswith("*(")  # whole-stage codegen marker
        assert "PythonUDF" not in plan and "ArrowEvalPython" not in plan


class TestBucketedJoin:
    def test_join_bands_of_bucketed_tables_is_shuffle_free(self, spark):
        """Co-located cube⋈cube: two cubes materialized with the SAME bucket
        spec on chunk_id join WITHOUT any Exchange (the bucket distribution
        satisfies the join requirement) — the 100 TB join_bands story."""
        from gdalcubes_spark.cube import read_bucketed_cube
        from gdalcubes_spark.operators.join_bands import join_bands
        g = ChunkGrid(nt=6, ny=10, nx=10, ct=2, cy=5, cx=5)
        a = dummy_cube(spark, view10(), 1, 1.0, chunking=g, band_names=["a"])
        b = dummy_cube(spark, view10(), 1, 2.0, chunking=g, band_names=["b"])
        a.write_bucketed_table("ta_bucketed", buckets=8)
        b.write_bucketed_table("tb_bucketed", buckets=8)
        ca = read_bucketed_cube(spark, "ta_bucketed")
        cb = read_bucketed_cube(spark, "tb_bucketed")
        j = join_bands([ca, cb])
        plan = j.df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        arr = j.collect_array()
        assert arr.shape == (2, 6, 10, 10)
        assert np.allclose(arr[0], 1.0) and np.allclose(arr[1], 2.0)
        assert j.bands == ["a", "b"]


class TestInventoryPartitionPruning:
    def test_partitioned_inventory_prunes_and_scans_correctly(self, spark, tmp_path):
        from gdalcubes_spark.sources.raster_cube import (inventory_partition_columns,
                                                         raster_cube, read_inventory)
        from gdalcubes_spark.synth import ImageLayout, band_names, generate_images
        lay = ImageLayout(left0=0, top0=8, tile_dx=2.0, tile_dy=2.0, gx=4, gy=4,
                          ntime=6, dt_days=31, tile_w=8, tile_h=8, nb=1, fmts=("raw",))
        imgs = inventory_partition_columns(generate_images(spark, 96, lay), cell_deg=2.0)
        path = str(tmp_path / "inventory")
        imgs.write.partitionBy("pt_tb", "pt_gy", "pt_gx", "pt_ext").parquet(path)

        # a view over 2 months and the NW quarter of the space
        v = CubeView.create(srs="EPSG:4326", left=0, right=4, bottom=4, top=8,
                            t0="2021-01-01", t1="2021-02-28", dt="P1M", dx=0.25, dy=0.25,
                            aggregation="first", resampling="near")
        pruned = read_inventory(spark, path, v, cell_deg=2.0)
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan and "pt_tb" in plan.split("PartitionFilters")[1][:300]
        # pruning really cut the input (full table is 96 rows over 6 months/16 tiles)
        assert 0 < pruned.count() < 96

        from gdalcubes_spark.grid import ChunkGrid
        g = ChunkGrid(nt=v.nt, ny=v.ny, nx=v.nx, ct=1, cy=16, cx=16)
        full_scan = raster_cube(spark.read.parquet(path), v, band_names(lay), chunking=g)
        pruned_scan = raster_cube(pruned, v, band_names(lay), chunking=g)
        a, b = full_scan.collect_array(), pruned_scan.collect_array()
        assert np.allclose(np.nan_to_num(a, nan=-1), np.nan_to_num(b, nan=-1))

    def test_oversized_image_survives_pruning(self, spark, tmp_path):
        """VERDICT wrong #2: an image spanning 3+ coarse cells whose CENTER
        sits ≥ 2 cells outside the view must still be found by the pruned
        read (the old fixed one-cell slack dropped it silently)."""
        import pandas as pd
        from gdalcubes_spark import codecs
        from gdalcubes_spark.sources.raster_cube import (inventory_partition_columns,
                                                         raster_cube, read_inventory)
        from gdalcubes_spark.synth import IMAGE_SCHEMA, ImageLayout, band_names, generate_images

        lay = ImageLayout(left0=0, top0=8, tile_dx=2.0, tile_dy=2.0, gx=4, gy=4,
                          ntime=1, tile_w=8, tile_h=8, nb=1, fmts=("raw",))
        small = generate_images(spark, 16, lay)
        # one giant mosaic: [0,16]×[0,8] degrees (8×4 coarse cells at
        # cell_deg=2); its center (8, 4) is 2+ cells away from the view
        big_arr = np.full((1, 16, 32), 200, dtype=np.uint8)
        big = spark.createDataFrame(pd.DataFrame([dict(
            image_id="img_999999999999", bytes=codecs.encode(big_arr, "raw"),
            w=32, h=16, fmt="raw", caption="mosaic", phash=codecs.phash64(big_arr),
            left=0.0, right=16.0, bottom=0.0, top=8.0,
            datetime=pd.Timestamp("2021-01-01"), epsg=4326,
            nleft=0.0, nright=16.0, nbottom=0.0, ntop=8.0)]), IMAGE_SCHEMA)
        inv = inventory_partition_columns(small.unionByName(big), cell_deg=2.0)
        path = str(tmp_path / "inv_big")
        inv.write.partitionBy("pt_tb", "pt_gy", "pt_gx", "pt_ext").parquet(path)

        # view over the far-left 2 cells — center of the mosaic is 3 cells east
        v = CubeView.create(srs="EPSG:4326", left=0, right=4, bottom=4, top=8,
                            t0="2021-01-01", t1="2021-01-31", dt="P1M", dx=0.5, dy=0.5,
                            aggregation="last", resampling="near")
        pruned = read_inventory(spark, path, v, cell_deg=2.0)
        assert pruned.filter("image_id = 'img_999999999999'").count() == 1
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan
        g = ChunkGrid(nt=1, ny=v.ny, nx=v.nx, ct=1, cy=8, cx=8)
        a = raster_cube(pruned, v, band_names(lay), chunking=g).collect_array()
        b = raster_cube(spark.read.parquet(path), v, band_names(lay), chunking=g).collect_array()
        assert np.allclose(np.nan_to_num(a, nan=-1), np.nan_to_num(b, nan=-1))
        # the mosaic's value (200, aggregation=last, it's the highest id)
        assert np.all(a == 200.0)


class TestDriverGatePlans:
    def test_media_meta_oracle_is_shuffle_free(self, spark):
        """The merged GIF/MP3/MP4 gate must stay pure map work: three
        generate->parse mapInPandas branches under a plan-level Union —
        ZERO Exchanges (no shuffle surface at any scale)."""
        import sys
        sys.path.insert(0, "/root/repo")
        import __spark_entry__ as E
        df = E.queries()["media_meta_oracle"](spark, "/root/testdata/sf0.001")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert plan.count("MapInPandas") == 6  # generate+parse x 3 kinds
        assert plan.startswith("Union")
