"""gdalcubes_spark: a PySpark-native data-cube / spatial-join + tiling engine
with the query semantics of gdalcubes (reference: appelmar/gdalcubes 0.7.1),
re-expressed Spark-first over DataFrames of chunk tensors."""

from gdalcubes_spark.grid import ChunkGrid, CubeView, Datetime, Duration, Unit, default_chunking

__all__ = ["ChunkGrid", "CubeView", "Datetime", "Duration", "Unit", "default_chunking"]
__version__ = "0.1.0"
