"""Extra benchmarks for optimization work (guide §1.4): noop-sink isolation
of each stage of the bench queries. NOT used by the driver — bench.py stays
the frozen measurement harness; numbers from here are cited in
OPTIMIZATION_r06.md only.

Usage: python bench_extra.py <probe> [probe ...]
Probes: gen, gen_png, scan, scan_ndvi, scan_med, zonal, cc_pairs, cc,
        sem_pairs, sem_cc, lsh_sig, lsh_cand, pipeline stages...
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CORES = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPEATS = int(os.environ.get("BENCH_EXTRA_REPEATS", "2"))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def make_probes(spark, sf):
    from pyspark.sql import functions as F
    from gdalcubes_spark.grid import ChunkGrid, CubeView
    from gdalcubes_spark.sources.raster_cube import raster_cube
    from gdalcubes_spark.synth import ImageLayout, band_names, generate_images

    n_images = max(192, int(19200 * sf))
    grid, ntime = 8, 12

    lay = ImageLayout(left0=0.0, top0=8.0, tile_dx=1.0, tile_dy=1.0, gx=grid, gy=grid,
                      ntime=ntime, dt_days=31, tile_w=64, tile_h=64, nb=2,
                      fmts=("png", "raw", "jpeg"), hot_every=13, overlap=0.2)
    lay_png = ImageLayout(left0=0.0, top0=8.0, tile_dx=1.0, tile_dy=1.0, gx=grid, gy=grid,
                          ntime=ntime, dt_days=31, tile_w=64, tile_h=64, nb=2,
                          fmts=("png",), hot_every=0, overlap=0.0)

    def view_med():
        return CubeView.create(srs="EPSG:4326", left=0, right=8, bottom=0, top=8,
                               t0="2021-01-01", t1="2021-12-31", dt="P1M", dx=1.0 / 64, dy=1.0 / 64,
                               aggregation="median", resampling="bilinear")

    def probe_gen(spark):
        noop(generate_images(spark, n_images, lay))

    def probe_gen_png(spark):
        noop(generate_images(spark, n_images, lay_png))

    def probe_scan(spark):
        v = view_med()
        g = ChunkGrid(nt=v.nt, ny=v.ny, nx=v.nx, ct=1, cy=128, cx=128)
        imgs = generate_images(spark, n_images, lay)
        noop(raster_cube(imgs, v, band_names(lay), chunking=g).df)

    def probe_scan_ndvi(spark):
        v = view_med()
        g = ChunkGrid(nt=v.nt, ny=v.ny, nx=v.nx, ct=1, cy=128, cx=128)
        imgs = generate_images(spark, n_images, lay)
        cube = raster_cube(imgs, v, band_names(lay), chunking=g)
        noop(cube.apply_pixel("(b02 - b01) / (b02 + b01 + 1)", ["ndvi"]).df)

    def probe_scan_med(spark):
        v = view_med()
        g = ChunkGrid(nt=v.nt, ny=v.ny, nx=v.nx, ct=1, cy=128, cx=128)
        imgs = generate_images(spark, n_images, lay)
        cube = raster_cube(imgs, v, band_names(lay), chunking=g)
        med = cube.apply_pixel("(b02 - b01) / (b02 + b01 + 1)", ["ndvi"]) \
                  .reduce_time("median(ndvi)", names=["ndvi"])
        noop(med.df)

    def probe_scan_scaling_full(spark):
        v = CubeView.create(srs="EPSG:4326", left=0, right=8, bottom=0, top=8,
                            t0="2021-01-01", t1="2021-12-31", dt="P1M", dx=1.0 / 64, dy=1.0 / 64,
                            aggregation="mean", resampling="bilinear")
        g = ChunkGrid(nt=v.nt, ny=v.ny, nx=v.nx, ct=1, cy=64, cx=64)
        imgs = generate_images(spark, n_images, lay_png)
        cube = raster_cube(imgs, v, band_names(lay_png), chunking=g)
        idx = cube.apply_pixel(
            "sin(b01/255*3.14159) * cos(b02/255*3.14159) + log(1 + b01*b02) + sqrt(b01+1) * tanh(b02/128)",
            ["idx"])
        r = idx.reduce_time("mean(idx)", "max(idx)")
        noop(r.df)

    # ---- dedup/cc probes ------------------------------------------------
    def docs(spark):
        d = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
        near = d.select((F.col("doc_id") + 10_000_000).alias("doc_id"),
                        F.concat(F.col("text"), F.lit(" zzz")).alias("text"))
        return d.unionByName(near)

    def probe_lsh_pairs(spark):
        from gdalcubes_spark.pipeline.dedup import minhash_lsh_pairs
        noop(minhash_lsh_pairs(docs(spark), threshold=0.7))

    def probe_cc_only(spark):
        from gdalcubes_spark.pipeline.components import dedup_clusters as dc
        from gdalcubes_spark.pipeline.dedup import minhash_lsh_pairs
        d = docs(spark)
        pairs = minhash_lsh_pairs(d, threshold=0.7).persist()
        pairs.count()
        t0 = time.time()
        noop(dc(d, pairs))
        print(f"  cc_only inner: {time.time()-t0:.3f}s")
        pairs.unpersist()

    def probe_sem_pairs(spark):
        from gdalcubes_spark.pipeline.similarity import cosine_neardup_pairs_bucketed
        emb = (spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
               .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding")))
        clones = emb.select((F.col("vec_id") + 100000).alias("vec_id"),
                            F.transform("embedding", lambda x: x * F.lit(2.0)).alias("embedding"))
        allv = emb.unionByName(clones)
        noop(cosine_neardup_pairs_bucketed(allv, threshold=0.999))

    def probe_sem_cc(spark):
        from gdalcubes_spark.pipeline.components import dedup_clusters
        from gdalcubes_spark.pipeline.similarity import cosine_neardup_pairs_bucketed
        emb = (spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
               .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding")))
        clones = emb.select((F.col("vec_id") + 100000).alias("vec_id"),
                            F.transform("embedding", lambda x: x * F.lit(2.0)).alias("embedding"))
        allv = emb.unionByName(clones)
        pairs = cosine_neardup_pairs_bucketed(allv, threshold=0.999).persist()
        pairs.count()
        t0 = time.time()
        noop(dedup_clusters(allv, pairs, id_col="vec_id"))
        print(f"  sem_cc inner: {time.time()-t0:.3f}s")
        pairs.unpersist()

    return {
        "gen": probe_gen,
        "gen_png": probe_gen_png,
        "scan": probe_scan,
        "scan_ndvi": probe_scan_ndvi,
        "scan_med": probe_scan_med,
        "scan_scaling_full": probe_scan_scaling_full,
        "lsh_pairs": probe_lsh_pairs,
        "cc_only": probe_cc_only,
        "sem_pairs": probe_sem_pairs,
        "sem_cc": probe_sem_cc,
    }


def main():
    from gdalcubes_spark.session import get_spark
    sf = float(SF_DIR.rstrip("/").split("sf")[-1])
    spark = get_spark("bench_extra", cores=CORES, shuffle_partitions=max(CORES, 16))
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def _noop_gen(batches):
        import numpy  # noqa: F401
        for b in batches:
            yield b

    spark.range(0, CORES * 4, numPartitions=CORES * 4).mapInPandas(
        _noop_gen, "id long").selectExpr("count(*)").collect()

    probes = make_probes(spark, sf)
    names = sys.argv[1:] or list(probes)
    out = {}
    for name in names:
        fn = probes[name]
        best = None
        for _ in range(REPEATS):
            spark.catalog.clearCache()
            try:
                from gdalcubes_spark.pipeline.components import release_checkpoints
                from gdalcubes_spark.pipeline.dedup import release_caches
                release_caches()
                release_checkpoints()
                jmap = spark.sparkContext._jsc.getPersistentRDDs()
                for jrdd in jmap.values():
                    jrdd.unpersist()
                spark._jvm.System.gc()
            except Exception:
                pass
            spark.sparkContext.setJobDescription(f"probe:{name}")
            t0 = time.time()
            fn(spark)
            wall = round(time.time() - t0, 3)
            best = wall if best is None else min(best, wall)
            print(f"{name}: {wall}")
        out[name] = best
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()


def _zonal_probes(spark, sf):
    """Appended probes: split scan_zonal into med-fill vs zonal-only."""
    import time as _t
    from pyspark.sql import functions as F
    from gdalcubes_spark.geom import rect_wkt
    from gdalcubes_spark.grid import ChunkGrid, CubeView
    from gdalcubes_spark.operators.extract_geom import zonal_stats
    from gdalcubes_spark.sources.raster_cube import raster_cube
    from gdalcubes_spark.synth import ImageLayout, band_names, generate_images

    n_images = max(192, int(19200 * sf))
    lay = ImageLayout(left0=0.0, top0=8.0, tile_dx=1.0, tile_dy=1.0, gx=8, gy=8,
                      ntime=12, dt_days=31, tile_w=64, tile_h=64, nb=2,
                      fmts=("png", "raw", "jpeg"), hot_every=13, overlap=0.2)
    imgs = generate_images(spark, n_images, lay)
    v = CubeView.create(srs="EPSG:4326", left=0, right=8, bottom=0, top=8,
                        t0="2021-01-01", t1="2021-12-31", dt="P1M", dx=1.0 / 64, dy=1.0 / 64,
                        aggregation="median", resampling="bilinear")
    g = ChunkGrid(nt=v.nt, ny=v.ny, nx=v.nx, ct=1, cy=128, cx=128)
    cube = raster_cube(imgs, v, band_names(lay), chunking=g)
    ndvi = cube.apply_pixel("(b02 - b01) / (b02 + b01 + 1)", ["ndvi"])
    med = ndvi.reduce_time("median(ndvi)", names=["ndvi"])
    polys = spark.createDataFrame(
        [(i, rect_wkt((i % 4) * 2 + 0.25, (i // 4) * 2 + 0.25,
                      (i % 4) * 2 + 1.75, (i // 4) * 2 + 1.75)) for i in range(16)],
        "fid long, wkt string")
    t0 = _t.time()
    med.df.persist()
    n = med.df.count()
    t1 = _t.time()
    print(f"persist_fill: {t1-t0:.3f}  rows={n}")
    for _ in range(3):
        t2 = _t.time()
        zs = zonal_stats(med, polys, ["mean", "count", "median"], by_time=True)
        nz = zs.count()
        t3 = _t.time()
        print(f"zonal_only: {t3-t2:.3f}  rows={nz}")
    t4 = _t.time()
    cells = med.df.select(F.sum(F.col("nb").cast("long") * F.col("nt") * F.col("ny") * F.col("nx")).alias("c")).first()["c"]
    print(f"cells_count: {_t.time()-t4:.3f} cells={cells}")
    med.df.unpersist()


if __name__ == "__main__" and os.environ.get("ZONAL_PROBE"):
    pass
