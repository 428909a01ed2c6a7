"""Capture .explain('formatted') for the bench queries touched in round 6.

Usage: PYTHONPATH=<repo> python tools/capture_plans_r06.py <suffix> <outdir>
  suffix: 'before' (run with PYTHONPATH=round-start worktree) or 'after'.

Writes <outdir>/<query>_<suffix>.txt. Plans are built lazily (no execution)
so this is cheap; the DataFrames are exactly the ones the frozen bench.py
constructs.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

suffix = sys.argv[1]
outdir = sys.argv[2]
os.makedirs(outdir, exist_ok=True)

from pyspark.sql import functions as F  # noqa: E402

from gdalcubes_spark.session import get_spark  # noqa: E402

spark = get_spark("plan_capture", cores=8, shuffle_partitions=16)
spark.sparkContext.setLogLevel("ERROR")

SF_DIR = "/root/testdata/sf0.1"
n_images, grid, ntime = 1920, 8, 12


def dump(name, df):
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    with open(f"{outdir}/{name}_{suffix}.txt", "w") as fh:
        fh.write(buf.getvalue())
    print(name, "ok")


def scan_dfs():
    from gdalcubes_spark.grid import ChunkGrid, CubeView
    from gdalcubes_spark.operators.extract_geom import zonal_stats
    from gdalcubes_spark.geom import rect_wkt
    from gdalcubes_spark.sources.raster_cube import raster_cube
    from gdalcubes_spark.synth import ImageLayout, band_names, generate_images

    lay = ImageLayout(left0=0.0, top0=8.0, tile_dx=1.0, tile_dy=1.0, gx=grid, gy=grid,
                      ntime=ntime, dt_days=31, tile_w=64, tile_h=64, nb=2,
                      fmts=("png", "raw", "jpeg"), hot_every=13, overlap=0.2)
    imgs = generate_images(spark, n_images, lay)
    v = CubeView.create(srs="EPSG:4326", left=0, right=8, bottom=0, top=8,
                        t0="2021-01-01", t1="2021-12-31", dt="P1M", dx=1.0 / 64, dy=1.0 / 64,
                        aggregation="median", resampling="bilinear")
    g = ChunkGrid(nt=v.nt, ny=v.ny, nx=v.nx, ct=1, cy=128, cx=128)
    cube = raster_cube(imgs, v, band_names(lay), chunking=g)
    med = (cube.apply_pixel("(b02 - b01) / (b02 + b01 + 1)", ["ndvi"])
           .reduce_time("median(ndvi)", names=["ndvi"]))
    polys = spark.createDataFrame(
        [(i, rect_wkt((i % 4) * 2 + 0.25, (i // 4) * 2 + 0.25,
                      (i % 4) * 2 + 1.75, (i // 4) * 2 + 1.75)) for i in range(16)],
        "fid long, wkt string")
    zs = zonal_stats(med, polys, ["mean", "count", "median"], by_time=True)
    dump("scan_zonal_med", med.df)
    dump("scan_zonal_zonal", zs)

    lay_png = ImageLayout(left0=0.0, top0=8.0, tile_dx=1.0, tile_dy=1.0, gx=grid, gy=grid,
                          ntime=ntime, dt_days=31, tile_w=64, tile_h=64, nb=2,
                          fmts=("png",), hot_every=0, overlap=0.0)
    v2 = CubeView.create(srs="EPSG:4326", left=0, right=8, bottom=0, top=8,
                         t0="2021-01-01", t1="2021-12-31", dt="P1M", dx=1.0 / 64, dy=1.0 / 64,
                         aggregation="mean", resampling="bilinear")
    g2 = ChunkGrid(nt=v2.nt, ny=v2.ny, nx=v2.nx, ct=1, cy=64, cx=64)
    r = (raster_cube(generate_images(spark, n_images, lay_png), v2, band_names(lay_png), chunking=g2)
         .apply_pixel("sin(b01/255*3.14159) * cos(b02/255*3.14159) + log(1 + b01*b02) + sqrt(b01+1) * tanh(b02/128)", ["idx"])
         .reduce_time("mean(idx)", "max(idx)"))
    dump("scan_scaling", r.df)


def dedup_dfs():
    from gdalcubes_spark.pipeline.components import dedup_clusters as dc, _large_star, _small_star
    from gdalcubes_spark.pipeline.dedup import minhash_lsh_pairs
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    near = d.select((F.col("doc_id") + 10_000_000).alias("doc_id"),
                    F.concat(F.col("text"), F.lit(" zzz")).alias("text"))
    docs = d.unionByName(near)
    pairs = minhash_lsh_pairs(docs, threshold=0.7)
    dump("dedup_lsh", pairs)
    edges = pairs.select(F.col("ida").cast("long").alias("src"),
                         F.col("idb").cast("long").alias("dst")) \
        .filter(F.col("src") != F.col("dst")).distinct()
    dump("cc_one_round", _small_star(_large_star(edges)))


def sem_dfs():
    from gdalcubes_spark.pipeline.similarity import cosine_neardup_pairs_bucketed
    emb = (spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
           .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding")))
    clones = emb.select((F.col("vec_id") + 100000).alias("vec_id"),
                        F.transform("embedding", lambda x: x * F.lit(2.0)).alias("embedding"))
    dump("semantic_pairs", cosine_neardup_pairs_bucketed(emb.unionByName(clones), threshold=0.999))


scan_dfs()
dedup_dfs()
sem_dfs()
spark.stop()
