"""kNN tile lookup (north rule): for query points, find the k nearest image
tiles by tile-center distance.

Scale shape: both sides get a coarse grid cell id (the H3/S2-style cell
encoding for a planar grid); candidates come from an equi-join on the query
cell's ring-R neighborhood (explode 9/25 cells — pure column arithmetic),
then exact distance + windowed top-k. Queries whose ring was too sparse to
yield k results are retried with a wider ring (bounded doubling), so results
equal brute force without ever scanning the full table per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from gdalcubes_spark.pipeline.dedup import _CACHED, release_caches


def _ring_offsets(r: int):
    return [(dy, dx) for dy in range(-r, r + 1) for dx in range(-r, r + 1)]


def knn_tiles(images_meta: DataFrame, points: DataFrame, k: int = 3, cell: float = 1.0,
              max_ring: int = 8) -> DataFrame:
    """images_meta: (image_id, left, right, bottom, top); points: (qid, x, y).
    Returns (qid, image_id, dist) — exact k nearest by center distance."""
    img = (images_meta
           .withColumn("cxm", (F.col("left") + F.col("right")) / 2)
           .withColumn("cym", (F.col("bottom") + F.col("top")) / 2)
           .withColumn("gx", F.floor(F.col("cxm") / cell).cast("long"))
           .withColumn("gy", F.floor(F.col("cym") / cell).cast("long"))
           .select("image_id", "cxm", "cym", "gx", "gy"))
    # cached for reuse across ring iterations; registered in the shared
    # release registry (same hygiene as the LSH shingle cache) so long-lived
    # sessions can free it with release_caches() instead of leaking one
    # persisted table per knn_tiles call
    release_caches()
    img.cache()
    _CACHED.append(img)

    remaining = points.select("qid", "x", "y")
    results = None
    r = 1
    while r <= max_ring and remaining is not None:
        offs = _ring_offsets(r)
        cand = (remaining
                .withColumn("qgx", F.floor(F.col("x") / cell).cast("long"))
                .withColumn("qgy", F.floor(F.col("y") / cell).cast("long"))
                .withColumn("o", F.explode(F.array(*[
                    F.struct(F.lit(dy).alias("dy"), F.lit(dx).alias("dx")) for dy, dx in offs])))
                .withColumn("gy", F.col("qgy") + F.col("o.dy"))
                .withColumn("gx", F.col("qgx") + F.col("o.dx"))
                .join(img, ["gy", "gx"])
                .withColumn("dist", F.sqrt((F.col("x") - F.col("cxm")) ** 2
                                           + (F.col("y") - F.col("cym")) ** 2)))
        w = W.partitionBy("qid").orderBy(F.asc("dist"), F.asc("image_id"))
        topk = (cand.withColumn("rn", F.row_number().over(w))
                .withColumn("nfound", F.count("*").over(W.partitionBy("qid"))))
        # a query is SAFE if it found ≥ k candidates AND its k-th distance is
        # within the ring's guaranteed-complete radius (r*cell — beyond that a
        # closer tile could hide in an unexplored cell)
        safe_radius = (r - 0) * cell  # conservative: ring r guarantees radius r*cell... minus center offset
        safe = (topk.withColumn("kth", F.max(F.when(F.col("rn") == k, F.col("dist"))).over(W.partitionBy("qid")))
                .withColumn("ok", (F.col("nfound") >= k) & (F.col("kth") <= F.lit((r) * cell)))
                )
        got = safe.filter(F.col("ok") & (F.col("rn") <= k)).select("qid", "image_id", F.round("dist", 9).alias("dist"))
        results = got if results is None else results.unionByName(got)
        # unresolved = remaining MINUS resolved (anti-join): deriving it from
        # the candidate join would silently LOSE queries whose ring matched no
        # occupied cell at all (they never reach the join output)
        resolved = safe.filter(F.col("ok")).select("qid").distinct()
        remaining = remaining.join(resolved, "qid", "left_anti").select("qid", "x", "y")
        if remaining.isEmpty():
            remaining = None
        r *= 2
    if remaining is not None:
        # fall back to brute force for stragglers (tiny set by construction)
        cand = (remaining.crossJoin(img)
                .withColumn("dist", F.sqrt((F.col("x") - F.col("cxm")) ** 2
                                           + (F.col("y") - F.col("cym")) ** 2)))
        w = W.partitionBy("qid").orderBy(F.asc("dist"), F.asc("image_id"))
        got = (cand.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
               .select("qid", "image_id", F.round("dist", 9).alias("dist")))
        results = got if results is None else results.unionByName(got)
    return results
