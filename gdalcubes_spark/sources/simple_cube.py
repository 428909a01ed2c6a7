"""simple_cube (R: stack_cube) — build a cube directly from a list of images
that all share one grid: no warping, each image IS one (or the only) time
slice (simple_cube.cpp, R/cube.R:126).

Spark shape: the image's pixel grid becomes the cube grid (view derived from
the first image's bbox + w/h); placement is the identity mapping, expressed
through the same scan machinery with nearest resampling (nearest on an
aligned grid is exact, pixel-for-pixel) and "none"/chosen aggregation for
duplicate datetimes.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame

from gdalcubes_spark.grid import ChunkGrid, CubeView, default_chunking
from gdalcubes_spark.sources.raster_cube import raster_cube


def stack_cube(images: DataFrame, bands: List[str], dt: str = "P1D",
               aggregation: str = "none", chunking: Optional[ChunkGrid] = None):
    """images: synth.IMAGE_SCHEMA rows sharing one bbox/w/h (checked).
    The time axis spans the images' datetimes at resolution dt."""
    meta = images.selectExpr(
        "min(left) l", "max(left) l2", "min(right) r", "max(right) r2",
        "min(bottom) b", "max(bottom) b2", "min(top) t", "max(top) t2",
        "min(w) w", "max(w) w2", "min(h) h", "max(h) h2",
        "date_format(min(datetime), 'yyyy-MM-dd HH:mm:ss') t0",
        "date_format(max(datetime), 'yyyy-MM-dd HH:mm:ss') t1").first()
    for a, b in (("l", "l2"), ("r", "r2"), ("b", "b2"), ("t", "t2"), ("w", "w2"), ("h", "h2")):
        if meta[a] != meta[b]:
            raise ValueError(f"stack_cube requires identical grids; {a} differs "
                             f"({meta[a]} vs {meta[b]}) — use raster_cube for mosaics")
    view = CubeView.create(srs="EPSG:4326", left=meta["l"], right=meta["r"],
                           bottom=meta["b"], top=meta["t"],
                           t0=meta["t0"], t1=meta["t1"], dt=dt,
                           nx=int(meta["w"]), ny=int(meta["h"]),
                           aggregation=aggregation, resampling="near")
    g = chunking or default_chunking(view)
    return raster_cube(images, view, bands, chunking=g)
