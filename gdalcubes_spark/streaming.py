"""Structured Streaming layer — our Spark-native extension beyond the
reference (gdalcubes is a pure batch engine; its "streaming" is an external-
process byte protocol, stream.h:38-120 — see operators/stream.py for that).

Real stream processing for a continuously-arriving image inventory:
- streaming_inventory(spark, dir): file-source readStream of image-metadata
  parquet drops (the shape of a Kafka/Kinesis feed of new scene arrivals);
- streaming_cell_counts: watermarked, windowed per-cube-cell arrival counts —
  the "how much new data landed in each tile this hour" operational metric;
- streaming_events_window: generic windowed aggregation over the events
  table shape (ts, event_type, value) with late-data handling.

All queries are incremental (state kept by Spark's streaming aggregation) and
use the same grid column arithmetic as the batch scan, so a tile id means the
same thing in both planes (the classic lambda-architecture unification).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gdalcubes_spark.grid import ChunkGrid, CubeView
from gdalcubes_spark.sources.raster_cube import _time_index_col
from gdalcubes_spark.synth import IMAGE_SCHEMA


def streaming_inventory(spark: SparkSession, path: str, max_files_per_trigger: int = 16) -> DataFrame:
    """File-source stream of image-inventory parquet drops."""
    return (spark.readStream.schema(IMAGE_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(path))


def streaming_cell_counts(stream: DataFrame, view: CubeView, chunking: ChunkGrid,
                          watermark: str = "1 hour", window: str = "1 hour") -> DataFrame:
    """Watermarked windowed count of arriving images per cube chunk —
    chunk ids computed with the SAME column arithmetic as the batch scan."""
    g = chunking
    m = (stream
         .withColumn("it", _time_index_col(view).cast("long"))
         .filter((F.col("it") >= 0) & (F.col("it") < view.nt))
         .withColumn("x0", F.floor((F.col("left") - view.left) / view.dx))
         .withColumn("y0", F.floor((view.top - F.col("top")) / view.dy))
         .withColumn("kx", F.greatest(F.lit(0), F.least(F.lit(g.ncx - 1), (F.col("x0") / g.cx).cast("long"))))
         .withColumn("ky", F.greatest(F.lit(0), F.least(F.lit(g.ncy - 1), (F.col("y0") / g.cy).cast("long"))))
         .withColumn("chunk_id", (F.col("it") / g.ct).cast("long") * (g.ncy * g.ncx)
                     + F.col("ky") * g.ncx + F.col("kx")))
    m = m.withColumn("datetime", F.col("datetime").cast("timestamp"))
    return (m.withWatermark("datetime", watermark)
            .groupBy(F.window("datetime", window).alias("w"), "chunk_id")
            .agg(F.count("*").alias("n_images"))
            .select(F.col("w.start").alias("window_start"), "chunk_id", "n_images"))


def streaming_events_window(stream: DataFrame, watermark: str = "10 minutes",
                            window: str = "1 hour") -> DataFrame:
    """Windowed per-type aggregation with late-data handling over the events
    shape (ts timestamp, event_type string, value double)."""
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return (stream.withWatermark("ts", watermark)
            .groupBy(F.window("ts", window).alias("w"), "event_type")
            .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
            .select(F.col("w.start").alias("window_start"), "event_type", "n",
                    F.round("sum_value", 6).alias("sum_value")))


def run_to_memory(query_df: DataFrame, name: str, output_mode: str = "complete"):
    """Drive a streaming DataFrame to a memory sink with availableNow (process
    everything currently available, then stop) — the test/backfill trigger.
    Waits for NATURAL termination: a bounded awaitTermination can return
    mid-micro-batch and silently under-report results."""
    q = (query_df.writeStream.format("memory").queryName(name)
         .outputMode(output_mode).trigger(availableNow=True).start())
    q.awaitTermination()
    return q


def streaming_dedup(stream: DataFrame, key_expr: str = "md5(lower(trim(text)))",
                    id_col: str = "doc_id", timeout_minutes: int = 0) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): exactly-once
    streaming deduplication — emit only the FIRST record per content key,
    keeping a per-key seen flag in Spark state. The streaming half of the
    batch exact_dedup (pipeline/dedup.py); state is partitioned by key so it
    scales horizontally with executors."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    keyed = stream.withColumn("_k", F.expr(key_expr))
    out_schema = T.StructType([
        T.StructField("k", T.StringType(), False),
        T.StructField(id_col, T.LongType(), False),
    ])
    state_schema = T.StructType([T.StructField("seen", T.BooleanType(), False)])

    def dedup_fn(key, pdf_iter, state: GroupState):
        if state.exists:
            # already emitted for this key — swallow everything
            for _ in pdf_iter:
                pass
            return iter(())
        first = None
        for pdf in pdf_iter:
            if len(pdf) and first is None:
                first = int(pdf[id_col].min())
            elif len(pdf):
                first = min(first, int(pdf[id_col].min()))
        if first is None:
            return iter(())
        state.update((True,))
        return iter([pd.DataFrame({"k": [key[0]], id_col: [first]})])

    return (keyed.groupBy("_k")
            .applyInPandasWithState(dedup_fn, out_schema, state_schema,
                                    "append", GroupStateTimeout.NoTimeout))
