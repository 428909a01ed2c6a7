"""Deterministic synthetic image+caption table (FIXTURES.md §1, BASELINE.json
input_hint): (image_id string, bytes binary, w int, h int, fmt string,
caption string, phash long) plus the companion metadata columns of the
gdalcubes `images` inventory (image_collection.cpp:76): left, top, bottom,
right (bbox, EPSG:4326), datetime, epsg.

Every field is a pure function of (i, layout) — any worker or test oracle can
recompute any image's pixels exactly: v(band, iy, ix) = (a*ix + b*iy + 17*band
+ d) mod 256 with a,b,d derived from i. Generation is distributed
(spark.range → mapInPandas) so sf scales; a hot-cell fraction pins images to
tile (0,0,t0) to exercise skew handling (power-law hot cell).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Iterable, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from gdalcubes_spark import codecs

IMAGE_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType(), False),
    T.StructField("bytes", T.BinaryType(), False),
    T.StructField("w", T.IntegerType(), False),
    T.StructField("h", T.IntegerType(), False),
    T.StructField("fmt", T.StringType(), False),
    T.StructField("caption", T.StringType(), False),
    T.StructField("phash", T.LongType(), False),
    # companion metadata view: bbox always EPSG:4326 (image_collection.cpp:76
    # convention), native SRS in epsg, native-grid bbox in nleft..ntop
    # (== the 4326 bbox when epsg == 4326)
    T.StructField("left", T.DoubleType(), False),
    T.StructField("right", T.DoubleType(), False),
    T.StructField("bottom", T.DoubleType(), False),
    T.StructField("top", T.DoubleType(), False),
    T.StructField("datetime", T.TimestampType(), False),
    T.StructField("epsg", T.IntegerType(), False),
    T.StructField("nleft", T.DoubleType(), False),
    T.StructField("nright", T.DoubleType(), False),
    T.StructField("nbottom", T.DoubleType(), False),
    T.StructField("ntop", T.DoubleType(), False),
])


@dataclass(frozen=True)
class ImageLayout:
    """Deterministic tile-grid sweep: image i covers tile (tx, ty) at time
    step tt, cycling x-fastest; a hot fraction lands on tile (0,0,0)."""

    left0: float = 5.0
    top0: float = 53.0
    tile_dx: float = 1.0
    tile_dy: float = 1.0
    gx: int = 5
    gy: int = 5
    ntime: int = 12
    t0_epoch_day: int = 18628  # 2021-01-01 in days since epoch
    dt_days: int = 1
    tile_w: int = 64
    tile_h: int = 64
    nb: int = 1
    fmts: Tuple[str, ...] = ("png", "raw", "jpeg")
    hot_every: int = 0  # every k-th image pinned to tile (0,0,0); 0 = off
    overlap: float = 0.0  # fractional bbox enlargement → images overlap neighbours
    utm_every: int = 0  # every k-th image stored in native UTM (utm_zone); 0 = all 4326
    utm_zone: int = 32  # northern-hemisphere zone for the UTM subset

    def params(self, i: int):
        hot = self.hot_every > 0 and (i % self.hot_every == 0)
        if hot:
            tx = ty = tt = 0
        else:
            tx = i % self.gx
            ty = (i // self.gx) % self.gy
            tt = (i // (self.gx * self.gy)) % self.ntime
        a = 1 + (i * 7) % 5
        b = 1 + (i * 11) % 5
        d = (i * 13) % 256
        fmt = self.fmts[i % len(self.fmts)]
        ex = self.tile_dx * self.overlap
        ey = self.tile_dy * self.overlap
        left = self.left0 + tx * self.tile_dx - ex
        right = left + self.tile_dx + 2 * ex
        top = self.top0 - ty * self.tile_dy + ey
        bottom = top - self.tile_dy - 2 * ey
        epoch = (self.t0_epoch_day + tt * self.dt_days) * 86400
        return dict(i=i, tx=tx, ty=ty, tt=tt, a=a, b=b, d=d, fmt=fmt,
                    left=left, right=right, bottom=bottom, top=top, epoch=epoch)

    def pixels(self, i: int) -> np.ndarray:
        """uint8 (nb, h, w), exactly recomputable anywhere."""
        p = self.params(i)
        ix = np.arange(self.tile_w)[None, None, :]
        iy = np.arange(self.tile_h)[None, :, None]
        ib = np.arange(self.nb)[:, None, None]
        return ((p["a"] * ix + p["b"] * iy + 17 * ib + p["d"]) % 256).astype(np.uint8)

    def decoded_pixels(self, i: int) -> np.ndarray:
        """Pixels after the encode→decode round trip (identical for lossless
        formats; a REAL DCT+Huffman round trip for jpeg via the in-repo
        baseline codec) — the oracle for placement checks. Deterministic:
        same bytes, same decode, everywhere."""
        p = self.params(i)
        a = self.pixels(i)
        if p["fmt"] == "jpeg":
            return codecs.decode(codecs.encode(a, "jpeg"), "jpeg")
        return a


def band_names(layout: ImageLayout):
    return [f"B{i + 1:02d}" for i in range(layout.nb)]


def native_bbox(layout: ImageLayout, i: int):
    """(epsg, nleft, nright, nbottom, ntop): the pixel grid's bbox in the
    image's native SRS (UTM for the utm_every subset, else the 4326 bbox)."""
    import numpy as np

    from gdalcubes_spark.srs import geodetic_to_utm
    p = layout.params(i)
    if layout.utm_every and i % layout.utm_every == 0 and not (layout.hot_every and i % layout.hot_every == 0):
        xs = np.array([p["left"], p["right"], p["left"], p["right"]])
        ys = np.array([p["bottom"], p["bottom"], p["top"], p["top"]])
        E, N = geodetic_to_utm(xs, ys, zone=layout.utm_zone)
        return 32600 + layout.utm_zone, float(E.min()), float(E.max()), float(N.min()), float(N.max())
    return 4326, p["left"], p["right"], p["bottom"], p["top"]


def make_row(i: int, layout: ImageLayout) -> dict:
    p = layout.params(i)
    a = layout.pixels(i)
    payload = codecs.encode(a, p["fmt"])
    epsg, nl, nr, nb_, nt_ = native_bbox(layout, i)
    return dict(
        image_id=f"img_{i:012d}",
        bytes=payload,
        w=layout.tile_w, h=layout.tile_h, fmt=p["fmt"],
        caption=f"synthetic scene {i} cell {p['tx']}_{p['ty']}_{p['tt']}",
        phash=codecs.phash64(a),
        left=p["left"], right=p["right"], bottom=p["bottom"], top=p["top"],
        datetime=pd.Timestamp(p["epoch"], unit="s"),
        epsg=epsg, nleft=nl, nright=nr, nbottom=nb_, ntop=nt_,
    )


def generate_images(spark: SparkSession, n: int, layout: ImageLayout = ImageLayout(),
                    partitions: int = 0) -> DataFrame:
    # ~64 images per generation task (encode is ~1-3 ms/image CPU): the old
    # 256-image floor left a 1920-image inventory on 8 of 32 cores while the
    # downstream scan waited on the generation stage
    parts = partitions or max(1, min(n // 64 + 1, spark.sparkContext.defaultParallelism * 2))
    base = spark.range(0, n, numPartitions=parts)

    def gen(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            rows = [make_row(int(i), layout) for i in pdf["id"]]
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_SCHEMA.fields]) if rows else \
                pd.DataFrame({f.name: pd.Series(dtype="object") for f in IMAGE_SCHEMA.fields})

    return base.mapInPandas(gen, IMAGE_SCHEMA)
