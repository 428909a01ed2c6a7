"""gdalcubes_spark: a PySpark-native data-cube / spatial-join + tiling engine
with the query semantics of gdalcubes (reference: appelmar/gdalcubes 0.7.1),
re-expressed Spark-first over DataFrames of chunk tensors."""

from gdalcubes_spark.grid import ChunkGrid, CubeView, Datetime, Duration, Unit, default_chunking


def __getattr__(name):
    # lazy re-exports so `import gdalcubes_spark` stays cheap on executors
    if name in ("Cube", "dummy_cube", "empty_cube", "cube_from_array", "read_parquet_cube"):
        from gdalcubes_spark import cube as _m
        return getattr(_m, name)
    if name in ("raster_cube", "ImageMask"):
        from gdalcubes_spark.sources import raster_cube as _m
        return getattr(_m, name)
    if name == "stack_cube":
        from gdalcubes_spark.sources.simple_cube import stack_cube
        return stack_cube
    if name in ("extract_geom", "zonal_stats"):
        from gdalcubes_spark.operators import extract_geom as _m
        return getattr(_m, name)
    if name in ("write_checkpoint", "read_checkpoint", "resume"):
        from gdalcubes_spark import checkpoint as _m
        return getattr(_m, name)
    raise AttributeError(name)


__all__ = [
    "ChunkGrid", "CubeView", "Datetime", "Duration", "Unit", "default_chunking",
    "Cube", "dummy_cube", "empty_cube", "cube_from_array", "read_parquet_cube",
    "raster_cube", "ImageMask", "stack_cube", "extract_geom", "zonal_stats",
    "write_checkpoint", "read_checkpoint", "resume",
]
__version__ = "0.1.0"
