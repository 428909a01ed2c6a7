"""raster_cube — THE core scan: image inventory ⋈ chunk grid → decoded,
warped, per-cell-aggregated chunk tensors.

Reference: image_collection_cube.cpp:315-682 (per chunk: SQLite range query →
VRT band-select → gdalwarp → RasterIO → mask → aggregation) with the range
predicate at image_collection.cpp:1373-1383 and aggregation states at
image_collection_cube.cpp:58-306.

Spark-first design — the theta range join is turned into an EQUI join:
because the cube grid is regular, an image's bbox + datetime map to an exact
rectangle of chunk ids by pure column arithmetic. We explode each image row
to its covering chunk ids (F.sequence + explode, all JVM-side, no UDF) and
shuffle image payloads once, directly to their chunks:

    images ──[column exprs: it, cx0..cx1, cy0..cy1]──▶ explode(chunk_id)
           ──▶ groupBy(chunk_id).applyInPandas(decode → warp → aggregate)

At 10^12-image scale this is one shuffle whose keys are chunk ids; hot cells
(power-law image density) are handled by the two-phase salted variant
(salt > 0): partial aggregation per (chunk_id, salt) bounds any single task's
image count, then a cheap merge per chunk_id — only for decomposable
aggregation methods; median/none need all values and fall back with a log.

Time-slice assignment replicates cube_coords (view.cpp:416-422) with the
duration-unit rules of datetime.h: linear epoch arithmetic for second..week
units, calendar month/year arithmetic otherwise — all as Catalyst column
expressions so the join side never runs Python.
"""

from __future__ import annotations

from typing import Iterable, List, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gdalcubes_spark import codecs
from gdalcubes_spark.cube import CHUNK_SCHEMA, Cube, pack_tensor, pin_group_partitions
from gdalcubes_spark.sources import resample as RS
from gdalcubes_spark.grid import ChunkGrid, CubeView, Unit, default_chunking
from gdalcubes_spark.srs import Transformer, parse_epsg

_EPS = 1e-9

DECOMPOSABLE = ("min", "max", "mean", "sum", "first", "last", "count_images", "count_values")


class ImageMask:
    """value/range mask over one band (image_collection_cube.h:34-140):
    pixels of every band become NaN where the mask band matches (or doesn't,
    when inverted)."""

    def __init__(self, band: str, values=None, vmin=None, vmax=None, invert: bool = False):
        self.band, self.values, self.vmin, self.vmax, self.invert = band, values, vmin, vmax, invert

    def apply(self, mask_vals: np.ndarray) -> np.ndarray:
        """Returns boolean array: True where pixel must be NaN'd."""
        if self.values is not None:
            m = np.isin(mask_vals, list(self.values))
        else:
            m = (mask_vals >= self.vmin) & (mask_vals <= self.vmax)
        return ~m if self.invert else m


def _time_index_col(view: CubeView):
    """it as a Catalyst column expression from the `datetime` column."""
    u, n = view.dt.unit, view.dt.n
    t0 = view.t0
    if u in (Unit.SECOND, Unit.MINUTE, Unit.HOUR, Unit.DAY, Unit.WEEK):
        secs = {Unit.SECOND: 1, Unit.MINUTE: 60, Unit.HOUR: 3600, Unit.DAY: 86400, Unit.WEEK: 604800}[u] * n
        if u in (Unit.DAY, Unit.WEEK):
            # day difference counts calendar days of the date part (datetime.h DAY diff)
            return F.floor(F.datediff(F.to_date("datetime"), F.lit(t0.to_string())) / (secs // 86400))
        return F.floor((F.unix_timestamp("datetime") - F.lit(t0.epoch())) / secs)
    if u == Unit.MONTH:
        months = (F.year("datetime") * 12 + F.month("datetime")) - F.lit(t0.year * 12 + t0.month)
        return F.floor(months / n)
    if u == Unit.YEAR:
        return F.floor((F.year("datetime") - F.lit(t0.year)) / n)
    raise ValueError(f"unsupported dt unit {u}")


def _bbox_in_view_srs(images: DataFrame, view: CubeView) -> DataFrame:
    """Add vleft/vright/vbottom/vtop: image bbox (stored EPSG:4326) expressed
    in the view SRS. Identity → pure column aliasing; UTM views transform the
    4 corners in a vectorized Arrow UDF (the warp-transformer-cache analogue)."""
    code = parse_epsg(view.srs)
    if code == 4326:
        return (images.withColumn("vleft", F.col("left")).withColumn("vright", F.col("right"))
                .withColumn("vbottom", F.col("bottom")).withColumn("vtop", F.col("top")))
    tr = Transformer(4326, code)

    @F.pandas_udf("left double, right double, bottom double, top double")
    def corners(l: pd.Series, r: pd.Series, b: pd.Series, t: pd.Series) -> pd.DataFrame:
        xs = np.stack([l, r, l, r])  # 4 corners
        ys = np.stack([b, b, t, t])
        X, Y = tr.transform(xs, ys)
        return pd.DataFrame(dict(left=X.min(axis=0), right=X.max(axis=0),
                                 bottom=Y.min(axis=0), top=Y.max(axis=0)))

    return (images.withColumn("_v", corners("left", "right", "bottom", "top"))
            .withColumn("vleft", F.col("_v.left")).withColumn("vright", F.col("_v.right"))
            .withColumn("vbottom", F.col("_v.bottom")).withColumn("vtop", F.col("_v.top"))
            .drop("_v"))


def _choose_overview_level(levels, native_bbox, dxv, dyv) -> int:
    """COG overview selection (what gdalwarp does against a COG): pick the
    deepest pyramid level whose pixel size stays at least 2× FINER than the
    target cell size, so near/bilinear sampling keeps full quality while the
    decode touches 4^level fewer pixels. levels = [(h, w), ...] full-res
    first; returns 0 when no overview qualifies."""
    il, ir, ib_, it_ = native_bbox
    h0, w0 = levels[0]
    pdx0 = (ir - il) / w0
    pdy0 = (it_ - ib_) / h0
    # how many times coarser the target grid is than the full-res pixels
    ratio = min(dxv / pdx0, dyv / pdy0)
    k = 0
    while k + 1 < len(levels) and 2.0 ** (k + 1) * 2.0 <= ratio:
        k += 1
    return k


def _sample_image(payload, fmt, native_bbox, img_epsg, xs, ys, view_epsg, resampling,
                  nb_expected, vbbox, band_idx=None, dxv=None, dyv=None,
                  use_overviews=False):
    """Decode one image and sample it at cube cell centers — but ONLY over the
    sub-window of the chunk the image's bbox covers (vbbox = bbox in view
    SRS). Cost is O(covered cells), not O(chunk cells): at scale most images
    cover a small fraction of a chunk.

    Returns (vals (nb, hy, wx) float64 with NaN where outside the image,
    y_off, x_off) or None when the image misses the chunk entirely.
    All 12 gdalwarp algorithms of the reference (warp.cpp:178-196,
    view.h:66-79) are supported: near/bilinear inline here, cubic/
    cubicspline/lanczos and the footprint reductions (average/mode/min/max/
    med/q1/q3) in sources/resample.py. The identity-SRS path uses separable
    1-D pixel indexing (no meshgrid) and EXACT footprints; the reprojection
    path supersamples footprints (see resample.py docstring)."""
    vl, vr, vb, vt = vbbox
    if dxv is None:
        dxv = float(xs[1] - xs[0]) if len(xs) > 1 else (vr - vl)
    if dyv is None:
        dyv = float(ys[0] - ys[1]) if len(ys) > 1 else (vt - vb)
    # sub-window of chunk cells whose centers can fall inside the image bbox
    xi = np.nonzero((xs >= vl) & (xs <= vr))[0]
    yi = np.nonzero((ys >= vb) & (ys <= vt))[0]
    if len(xi) == 0 or len(yi) == 0:
        return None
    x_off, y_off = int(xi[0]), int(yi[0])
    sxs, sys_ = xs[xi[0]: xi[-1] + 1], ys[yi[0]: yi[-1] + 1]

    if use_overviews and fmt == "tif":
        # COG fast path: pick a pyramid level from metadata alone, decode
        # only that level's tiles — 4^level fewer pixels through zlib and
        # the resampler. pdx/pdy below derive from the DECODED shape, so
        # every sampling path downstream is level-agnostic.
        from gdalcubes_spark.tiffcodec import decode_geotiff, peek_levels
        levels = peek_levels(bytes(payload))
        lv = _choose_overview_level(levels, native_bbox, dxv, dyv)
        arr = decode_geotiff(bytes(payload), level=lv)[0]
    elif fmt in ("webp", "gif", "bmp"):
        # these containers are band-ambiguous (VP8L/palette collapse
        # rules; VP8 luma vs RGB) — pin the inventory-declared band
        # count into the decode
        arr = codecs.decode(bytes(payload), fmt, nb=nb_expected)
    else:
        arr = codecs.decode(bytes(payload), fmt)  # (nb, h, w) uint8
    nb, h, w = arr.shape
    if nb != nb_expected:
        raise ValueError(f"image has {nb} bands, collection declares {nb_expected}")
    if band_idx is not None:  # scan-level band pushdown
        arr = arr[band_idx]
        nb = len(band_idx)
    il, ir, ib_, it_ = native_bbox  # image pixel grid lives in its NATIVE srs
    pdx = (ir - il) / w
    pdy = (it_ - ib_) / h
    tr = Transformer(view_epsg, img_epsg)
    separable = tr.src == tr.dst
    if separable:
        fx = (sxs - il) / pdx          # (wx,) continuous pixel coords
        fy = (it_ - sys_) / pdy        # (hy,)
        in_x = (fx >= 0) & (fx < w)
        in_y = (fy >= 0) & (fy < h)
        if resampling in ("near", "nearest"):
            px = np.clip(fx.astype(np.int64), 0, w - 1)
            py = np.clip(fy.astype(np.int64), 0, h - 1)
            vals = arr[:, py[:, None], px[None, :]].astype("float64")
            vals[:, ~in_y, :] = np.nan
            vals[:, :, ~in_x] = np.nan
            return vals, y_off, x_off
        if resampling == "bilinear":
            u, v = fx - 0.5, fy - 0.5
            x0 = np.clip(np.floor(u).astype(np.int64), 0, w - 1)
            y0 = np.clip(np.floor(v).astype(np.int64), 0, h - 1)
            x1 = np.clip(x0 + 1, 0, w - 1)
            y1 = np.clip(y0 + 1, 0, h - 1)
            wx = np.clip(u - np.floor(u), 0.0, 1.0)[None, None, :]
            wy = np.clip(v - np.floor(v), 0.0, 1.0)[None, :, None]
            # NOTE: the explicit astype is FASTER than uint8 gathers feeding
            # mixed-dtype ufuncs (measured 0.68 vs 0.81 s / 2000 windows —
            # numpy's buffered casting in u8*f64 products loses to one
            # conversion); keep the float64 gathers
            a00 = arr[:, y0[:, None], x0[None, :]].astype("float64")
            a01 = arr[:, y0[:, None], x1[None, :]].astype("float64")
            a10 = arr[:, y1[:, None], x0[None, :]].astype("float64")
            a11 = arr[:, y1[:, None], x1[None, :]].astype("float64")
            vals = (a00 * (1 - wx) * (1 - wy) + a01 * wx * (1 - wy)
                    + a10 * (1 - wx) * wy + a11 * wx * wy)
            vals[:, ~in_y, :] = np.nan
            vals[:, :, ~in_x] = np.nan
            return vals, y_off, x_off
        if resampling in RS.KERNEL_RESAMPLING:
            vals = RS.kernel_separable(arr, fx, fy, resampling)
            vals[:, ~in_y, :] = np.nan
            vals[:, :, ~in_x] = np.nan
            return vals, y_off, x_off
        if resampling in RS.FOOTPRINT_RESAMPLING:
            vals = RS.footprint_separable(arr, sxs, sys_, il, it_, pdx, pdy,
                                          dxv, dyv, resampling)
            return vals, y_off, x_off
        raise ValueError(f"unsupported resampling {resampling!r}")
    # reprojection path: transform the sub-window's cell centers (2-D)
    X, Y = np.meshgrid(sxs, sys_)
    Xi, Yi = tr.transform(X, Y)
    fx = (Xi - il) / pdx
    fy = (it_ - Yi) / pdy
    out = np.full((nb, len(sys_), len(sxs)), np.nan)
    inside = (fx >= 0) & (fx < w) & (fy >= 0) & (fy < h)
    if not inside.any():
        return None
    if resampling in ("near", "nearest"):
        px = np.clip(fx.astype(np.int64), 0, w - 1)
        py = np.clip(fy.astype(np.int64), 0, h - 1)
        vals = arr[:, py, px].astype("float64")
        out[:, inside] = vals[:, inside]
    elif resampling == "bilinear":
        u, v = fx - 0.5, fy - 0.5
        x0 = np.clip(np.floor(u).astype(np.int64), 0, w - 1)
        y0 = np.clip(np.floor(v).astype(np.int64), 0, h - 1)
        x1 = np.clip(x0 + 1, 0, w - 1)
        y1 = np.clip(y0 + 1, 0, h - 1)
        wx = np.clip(u - np.floor(u), 0.0, 1.0)
        wy = np.clip(v - np.floor(v), 0.0, 1.0)
        a00 = arr[:, y0, x0].astype("float64")
        a01 = arr[:, y0, x1].astype("float64")
        a10 = arr[:, y1, x0].astype("float64")
        a11 = arr[:, y1, x1].astype("float64")
        vals = (a00 * (1 - wx) * (1 - wy) + a01 * wx * (1 - wy)
                + a10 * (1 - wx) * wy + a11 * wx * wy)
        out[:, inside] = vals[:, inside]
    elif resampling in RS.KERNEL_RESAMPLING:
        vals = RS.kernel_projected(arr, fx, fy, resampling)
        out[:, inside] = vals[:, inside]
    elif resampling in RS.FOOTPRINT_RESAMPLING:
        # supersampled footprint: n×n sub-cell centers per target cell,
        # nearest-gathered, then reduced (deterministic approximation of the
        # true footprint under reprojection)
        spxv = max((vr - vl) / w, 1e-12)  # source pixel size in view units
        spyv = max((vt - vb) / h, 1e-12)
        sub_x, sub_y, nss = RS.supersample_grid(sxs, sys_, dxv, dyv, spxv, spyv)
        X2, Y2 = np.meshgrid(sub_x, sub_y)
        X2i, Y2i = tr.transform(X2, Y2)
        fx2 = (X2i - il) / pdx
        fy2 = (it_ - Y2i) / pdy
        ins2 = (fx2 >= 0) & (fx2 < w) & (fy2 >= 0) & (fy2 < h)
        px2 = np.clip(fx2.astype(np.int64), 0, w - 1)
        py2 = np.clip(fy2.astype(np.int64), 0, h - 1)
        sv = arr[:, py2, px2].astype("float64")
        sv[:, ~ins2] = np.nan
        v4 = (sv.reshape(nb, len(sys_), nss, len(sxs), nss)
              .transpose(0, 1, 3, 2, 4).reshape(nb, len(sys_), len(sxs), nss * nss))
        return RS.reduce_lastaxis(v4, resampling), y_off, x_off
    else:
        raise ValueError(f"unsupported resampling {resampling!r}")
    return out, y_off, x_off


class _AggState:
    """Vectorized per-cell aggregation over images, in image_id order
    (image_collection_cube.cpp:58-306)."""

    def __init__(self, method: str, shape):
        self.method = method
        self.acc = np.full(shape, np.nan)
        if method == "mean":
            self.count = np.zeros(shape)
        elif method == "median":
            self.buckets = {}  # lt -> list of (nb, ny, nx) arrays
        elif method in ("count_images", "count_values"):
            self.acc = np.full(shape, np.nan)

    def update(self, vals: np.ndarray, lt: int, y0: int = 0, x0: int = 0):
        """vals: (nb, hy, wx) sub-window at (y0, x0); NaN where uncovered."""
        hy, wx = vals.shape[1], vals.shape[2]
        a = self.acc[:, lt, y0 : y0 + hy, x0 : x0 + wx]
        ok = ~np.isnan(vals)
        m = self.method
        if m == "none":
            a[ok] = vals[ok]
        elif m == "first":
            w = ok & np.isnan(a)
            a[w] = vals[w]
        elif m == "last":
            a[ok] = vals[ok]
        elif m == "min":
            a[...] = np.fmin(a, vals)
        elif m == "max":
            a[...] = np.fmax(a, vals)
        elif m == "sum":
            first = ok & np.isnan(a)
            a[first] = 0.0
            a[ok] += vals[ok]
        elif m == "mean":
            first = ok & np.isnan(a)
            a[first] = 0.0
            a[ok] += vals[ok]
            self.count[:, lt, y0 : y0 + hy, x0 : x0 + wx][ok] += 1
        elif m == "median":
            # keep (vals, window) — stacked once per slice at finalize into a
            # single bounding-box buffer (per-image full-plane np.full() was a
            # memory-bandwidth killer that destroyed multi-core scaling)
            self.buckets.setdefault(lt, []).append((vals, y0, x0))
        elif m == "count_images":
            # reference counts every image touching the slice, all cells
            s = self.acc[:, lt]
            s[np.isnan(s)] = 0.0
            s += 1.0
        elif m == "count_values":
            # like the reference: any image touching the slice zeroes ALL
            # NaN cells of the slice; only covered non-NaN cells increment
            s = self.acc[:, lt]
            s[np.isnan(s)] = 0.0
            a[ok] += 1.0
        else:
            raise ValueError(f"unknown aggregation {m!r}")

    # dense-stack budget for the median finalize: K images × slice cells ×
    # 8 B. 256 MB bounds ~8 GB across 32 concurrent tasks — beyond it the
    # pair-sort path (memory ∝ real samples, not K × cells) takes over.
    _MEDIAN_DENSE_BYTES = 256 * 1024 * 1024

    def finalize(self) -> np.ndarray:
        if self.method == "mean":
            with np.errstate(invalid="ignore"):
                return self.acc / np.maximum(self.count, 1)
        if self.method == "median":
            nb, _, ny, nx = self.acc.shape
            plane = ny * nx
            for lt, items in self.buckets.items():
                K = len(items)
                if K * nb * plane * 8 <= self._MEDIAN_DENSE_BYTES:
                    # dense path: stack each image's sub-window into one
                    # (K, nb, ny, nx) buffer, ONE column-wise sort along K
                    # (NaN sorts last), gather the (cnt-1)//2 and cnt//2
                    # order statistics per cell. Same even-count tie rule
                    # ((lo + hi) / 2, reduce_time.cpp:376-394), identical
                    # float64 results — measured ~17x faster than the pair
                    # lexsort on a 174-image hot chunk, which was the scan's
                    # straggler task.
                    buf = np.full((K, nb, ny, nx), np.nan)
                    for k, (vals, y0, x0) in enumerate(items):
                        hy, wx = vals.shape[1], vals.shape[2]
                        buf[k, :, y0:y0 + hy, x0:x0 + wx] = vals
                    flat = buf.reshape(K, nb * plane)
                    flat.sort(axis=0)  # in place — no second K x cells copy
                    cnt = K - np.isnan(flat).sum(axis=0)
                    has = cnt > 0
                    if not has.any():
                        continue
                    lo = (cnt[has] - 1) // 2
                    hi = cnt[has] // 2
                    cols = np.nonzero(has)[0]
                    med = (flat[lo, cols] + flat[hi, cols]) / 2.0
                    self.acc[:, lt].reshape(nb * plane)[cols] = med
                    continue
                # sparse fallback (huge K × cells): gather only real samples
                # as (cell_id, value) pairs, one lexsort, segmented median —
                # memory/traffic ∝ samples.
                idx_parts, val_parts = [], []
                for vals, y0, x0 in items:
                    ok = ~np.isnan(vals)
                    if not ok.any():
                        continue
                    b, yy, xx = np.nonzero(ok)
                    idx_parts.append(b * plane + (yy + y0) * nx + (xx + x0))
                    val_parts.append(vals[ok])
                if not idx_parts:
                    continue
                idx = np.concatenate(idx_parts)
                val = np.concatenate(val_parts)
                order = np.lexsort((val, idx))
                idx, val = idx[order], val[order]
                starts = np.nonzero(np.diff(idx, prepend=-1))[0]
                counts = np.diff(np.append(starts, len(idx)))
                lo = starts + (counts - 1) // 2
                hi = starts + counts // 2
                med = (val[lo] + val[hi]) / 2.0
                self.acc[:, lt].reshape(nb * plane)[idx[starts]] = med
        return self.acc


def _attach_scan_fusion(cube: Cube, make_df, chain: tuple) -> None:
    """Wire Cube.map_chunks' scan-fusion hook onto a scan-produced cube.

    make_df(chain) wraps the ALREADY-ANALYZED pre-groupBy DataFrame with a
    build/merge UDF applying `chain` in-UDF — reusing the analyzed subtree
    keeps each fused rebuild to one cheap applyInPandas wrap (a from-scratch
    raster_cube rebuild cost ~0.3-0.6 s of driver-side analysis per narrow
    op, eating the executor-side win). The bare-scan stream base is a THUNK:
    only chunk_stream consumers (reduce partials, aggregate cut, window
    emits) pay for building it, and they get the chain fused into their own
    UDF with no packed intermediate; direct cube.df consumers get the
    in-build fusion."""
    def hook(fn, fview, fbands, fchunking):
        new_chain = chain + (fn,)
        fused = Cube(make_df(new_chain), fview, list(fbands), fchunking)
        fused._fuse_chain = new_chain
        fused._fuse_base_thunk = lambda: make_df(())
        _attach_scan_fusion(fused, make_df, new_chain)
        return fused
    cube._fuse_into_scan = hook


def raster_cube(images: DataFrame, view: CubeView, bands: List[str],
                chunking: Optional[ChunkGrid] = None, mask: Optional[ImageMask] = None,
                salt: int = 0, band_sel: Optional[List[str]] = None,
                use_overviews: bool = False) -> Cube:
    """Build a cube from the image inventory DataFrame (synth.IMAGE_SCHEMA).

    bands: names for the nb payload bands (the collection band dictionary).
    salt: >0 enables two-phase salted aggregation for hot chunks (only for
    decomposable aggregation methods).
    band_sel: scan-level band pushdown (select_bands on a raster_cube calls
    back into this, mirroring select_bands.h:50-90 / the SQL band filter at
    image_collection.cpp:1385-1392): only the selected bands (plus the mask
    band, if any) are sampled/aggregated/shuffled.
    use_overviews: COG fast path for fmt='tif' payloads — decode the pyramid
    level matched to the view resolution (kept ≥2× finer than the target
    cells) instead of full res; what gdalwarp does against a COG. Off by
    default because overview pixels are block means, so values differ from
    a full-res warp at the last ulp — enable when the view is much coarser
    than the sources and the decode dominates (the usual 100 TB case).

    The returned cube carries the scan-fusion hook (_attach_scan_fusion):
    narrow ops chained onto it run inside the build/merge UDF after
    aggregation — zero extra Arrow round trips (see Cube.map_chunks)."""
    g = chunking or default_chunking(view)
    view_epsg = parse_epsg(view.srs)
    full_bands = list(bands)
    if band_sel is not None:
        missing = [b for b in band_sel if b not in bands]
        if missing:
            raise ValueError(f"unknown bands {missing}; collection has {bands}")
        compute = list(band_sel)
        if mask is not None and mask.band not in compute:
            compute.append(mask.band)
        band_idx = [bands.index(b) for b in compute]
        out_idx = [compute.index(b) for b in band_sel]
        bands = compute
    else:
        band_idx = None
        out_idx = None
    nb = len(bands)
    nb_payload = len(full_bands)  # payload band count (validation pre-pushdown)
    agg = view.aggregation
    resampling = view.resampling
    if mask is not None and mask.band not in bands:
        raise ValueError(f"mask band {mask.band!r} not in {bands}")
    mask_idx = bands.index(mask.band) if mask is not None else -1

    m = _bbox_in_view_srs(images, view)
    m = m.withColumn("it", _time_index_col(view).cast("long"))
    m = m.filter((F.col("it") >= 0) & (F.col("it") < view.nt))
    dx, dy = view.dx, view.dy
    # covering cell ranges (inclusive) → covering chunk ranges
    m = (m.withColumn("x0", F.greatest(F.lit(0), F.floor((F.col("vleft") - view.left) / dx)).cast("long"))
         .withColumn("x1", F.least(F.lit(view.nx - 1), F.ceil((F.col("vright") - view.left) / dx - _EPS) - 1).cast("long"))
         .withColumn("y0", F.greatest(F.lit(0), F.floor((view.top - F.col("vtop")) / dy)).cast("long"))
         .withColumn("y1", F.least(F.lit(view.ny - 1), F.ceil((view.top - F.col("vbottom")) / dy - _EPS) - 1).cast("long"))
         .filter((F.col("x0") <= F.col("x1")) & (F.col("y0") <= F.col("y1"))))
    exploded = (m.withColumn("kx", F.explode(F.sequence((F.col("x0") / g.cx).cast("long"),
                                                        (F.col("x1") / g.cx).cast("long"))))
                .withColumn("ky", F.explode(F.sequence((F.col("y0") / g.cy).cast("long"),
                                                       (F.col("y1") / g.cy).cast("long"))))
                .withColumn("kt", (F.col("it") / g.ct).cast("long"))
                .withColumn("chunk_id",
                            F.col("kt") * (g.ncy * g.ncx) + F.col("ky").cast("long") * g.ncx + F.col("kx"))
                .select("chunk_id", "it", "image_id", "bytes", "fmt", "nleft", "nright", "nbottom", "ntop",
                        "epsg", "vleft", "vright", "vbottom", "vtop"))

    vleft, vtop = view.left, view.top

    def mk_build(chain: tuple):
        def build(key, pdf: pd.DataFrame) -> pd.DataFrame:
            cid = int(key[0])
            kt, ky, kx = g.chunk_coords(cid)
            (t0c, t1c), (yy0, yy1), (xx0, xx1) = g.chunk_cell_range(kt, ky, kx)
            nyc, nxc = yy1 - yy0, xx1 - xx0
            xs = vleft + (np.arange(xx0, xx1) + 0.5) * dx
            ys = vtop - (np.arange(yy0, yy1) + 0.5) * dy
            st = _AggState(agg, (nb, t1c - t0c, nyc, nxc))
            pdf = pdf.sort_values("image_id")
            c = {k: pdf[k].to_numpy() for k in ("it", "bytes", "fmt", "nleft", "nright", "nbottom",
                                                "ntop", "epsg", "vleft", "vright", "vbottom", "vtop")}
            for i in range(len(pdf)):  # plain array indexing — iterrows is ~10× slower
                lt = int(c["it"][i]) - t0c
                if not (0 <= lt < t1c - t0c):
                    continue
                res = _sample_image(c["bytes"][i], c["fmt"][i],
                                    (c["nleft"][i], c["nright"][i], c["nbottom"][i], c["ntop"][i]),
                                    int(c["epsg"][i]), xs, ys, view_epsg, resampling, nb_payload,
                                    (c["vleft"][i], c["vright"][i], c["vbottom"][i], c["vtop"][i]),
                                    band_idx, dxv=dx, dyv=dy, use_overviews=use_overviews)
                if res is None:
                    continue
                vals, oy, ox = res
                if mask is not None:
                    bad = mask.apply(vals[mask_idx])
                    vals = np.where(bad[None, ...], np.nan, vals)
                st.update(vals, lt, oy, ox)
            t = st.finalize()
            if out_idx is not None and len(out_idx) != t.shape[0]:
                t = t[out_idx]  # drop the mask-only band from the output
            if np.all(np.isnan(t)):
                return pd.DataFrame(columns=[f.name for f in CHUNK_SCHEMA.fields])
            for f in chain:  # fused narrow chain (map_chunks elision contract)
                t = f(t, (kt, ky, kx))
                if t is None or (isinstance(t, np.ndarray) and np.all(np.isnan(t))):
                    return pd.DataFrame(columns=[f.name for f in CHUNK_SCHEMA.fields])
            return pd.DataFrame([dict(chunk_id=cid, ct=kt, cy=ky, cx=kx, nb=t.shape[0], nt=t.shape[1],
                                      ny=t.shape[2], nx=t.shape[3], data=pack_tensor(t))])
        return build

    out_bands = list(band_sel) if band_sel is not None else list(bands)
    if salt > 0 and agg in DECOMPOSABLE:
        cube, make_df = _salted_scan(exploded, view, out_bands, g, mask, salt,
                                     build_ctx=(vleft, vtop, dx, dy, view_epsg, resampling, nb, agg,
                                                mask_idx, nb_payload, band_idx, out_idx,
                                                use_overviews))
    else:
        # Pin the decode shuffle's task count: AQE coalesces by POST-SHUFFLE
        # BYTES, but this stage's rows are compressed image refs whose decode/
        # warp cost is orders of magnitude larger per byte than columnar work —
        # byte-based coalescing was observed collapsing 32 cores' worth of
        # decode into 5 tasks. An explicit repartition(n, chunk_id) satisfies
        # the groupBy's clustering (no second exchange) and AQE leaves
        # user-numbered repartitions alone. n = 4x parallelism oversubscription
        # (scheduler slack for per-chunk cost variance), capped by chunk count.
        pinned = pin_group_partitions(exploded, "chunk_id", g.n_chunks)

        def make_df(chain: tuple):
            return pinned.groupBy("chunk_id").applyInPandas(mk_build(chain), CHUNK_SCHEMA)

        cube = Cube(make_df(()), view, out_bands, g)
    # select_bands pushdown hook: rebuilding the scan with fewer bands
    cube._scan_rebuild = lambda names: raster_cube(images, view, full_bands, chunking=g,
                                                   mask=mask, salt=salt, band_sel=list(names))
    _attach_scan_fusion(cube, make_df, ())
    return cube


def _salted_scan(exploded: DataFrame, view: CubeView, bands: List[str], g: ChunkGrid,
                 mask: Optional[ImageMask], salt: int, build_ctx):
    """Two-phase skew-proof scan: partial aggregation per (chunk_id, salt
    bucket of image_id), then merge per chunk_id. Bounds any single task to
    ~|images_in_chunk|/salt decodes (north-rule skew handling)."""
    (vleft, vtop, dx, dy, view_epsg, resampling, nb, agg, mask_idx,
     nb_payload, band_idx, out_idx, use_overviews) = build_ctx

    from pyspark.sql import types as T

    part_schema = T.StructType([
        T.StructField("chunk_id", T.LongType(), False),
        T.StructField("state", T.BinaryType(), False),
        # aux = per-cell count (mean) or per-cell winning image order (first/last)
        T.StructField("aux", T.BinaryType(), True),
    ])

    def _img_order(image_id: str) -> int:
        # numeric image order for cross-bucket first/last merging; input_hint
        # ids are "img_%012d" so the digit suffix is a total order matching
        # the reference's ORDER BY image_id
        digits = "".join(ch for ch in image_id if ch.isdigit())
        if not digits:
            raise ValueError("salted first/last needs numeric image ids; use salt=0")
        return int(digits)

    def partial(key, pdf: pd.DataFrame) -> pd.DataFrame:
        cid = int(key[0])
        kt, ky, kx = g.chunk_coords(cid)
        (t0c, t1c), (yy0, yy1), (xx0, xx1) = g.chunk_cell_range(kt, ky, kx)
        shape = (nb, t1c - t0c, yy1 - yy0, xx1 - xx0)
        xs = vleft + (np.arange(xx0, xx1) + 0.5) * dx
        ys = vtop - (np.arange(yy0, yy1) + 0.5) * dy
        st = _AggState(agg, shape)
        ordarr = np.full(shape, np.nan) if agg in ("first", "last") else None
        pdf = pdf.sort_values("image_id")
        c = {k: pdf[k].to_numpy() for k in ("it", "image_id", "bytes", "fmt", "nleft", "nright",
                                            "nbottom", "ntop", "epsg", "vleft", "vright",
                                            "vbottom", "vtop")}
        for i in range(len(pdf)):
            lt = int(c["it"][i]) - t0c
            if not (0 <= lt < t1c - t0c):
                continue
            res = _sample_image(c["bytes"][i], c["fmt"][i],
                                (c["nleft"][i], c["nright"][i], c["nbottom"][i], c["ntop"][i]),
                                int(c["epsg"][i]), xs, ys, view_epsg, resampling, nb_payload,
                                (c["vleft"][i], c["vright"][i], c["vbottom"][i], c["vtop"][i]),
                                band_idx, dxv=dx, dyv=dy, use_overviews=use_overviews)
            if res is None:
                continue
            vals, oy, ox = res
            if mask is not None:
                bad = mask.apply(vals[mask_idx])
                vals = np.where(bad[None, ...], np.nan, vals)
            if agg in ("first", "last"):
                o = float(_img_order(str(c["image_id"][i])))
                ok = ~np.isnan(vals)
                hy, wx = vals.shape[1], vals.shape[2]
                a = st.acc[:, lt, oy : oy + hy, ox : ox + wx]
                oa = ordarr[:, lt, oy : oy + hy, ox : ox + wx]
                w = ok & (np.isnan(oa) if agg == "first" else np.ones_like(ok))
                a[w] = vals[w]
                oa[w] = o
            else:
                st.update(vals, lt, oy, ox)
        aux = None
        if agg == "mean":
            aux = pack_tensor(st.count)
        elif agg in ("first", "last"):
            aux = pack_tensor(ordarr)
        return pd.DataFrame([dict(chunk_id=cid, state=pack_tensor(st.acc), aux=aux)])

    def mk_merge(chain: tuple):
        def merge(key, pdf: pd.DataFrame) -> pd.DataFrame:
            cid = int(key[0])
            kt, ky, kx = g.chunk_coords(cid)
            (t0c, t1c), (yy0, yy1), (xx0, xx1) = g.chunk_cell_range(kt, ky, kx)
            shape = (nb, t1c - t0c, yy1 - yy0, xx1 - xx0)
            acc = np.full(shape, np.nan)
            cnt = np.zeros(shape) if agg == "mean" else None
            acc_ord = np.full(shape, np.nan) if agg in ("first", "last") else None
            for _, row in pdf.iterrows():
                s = np.frombuffer(row["state"], dtype="<f8").reshape(shape)
                ok = ~np.isnan(s)
                if agg == "min":
                    acc = np.fmin(acc, s)
                elif agg == "max":
                    acc = np.fmax(acc, s)
                elif agg in ("sum", "count_images", "count_values"):
                    first = ok & np.isnan(acc)
                    acc[first] = 0.0
                    acc[ok] += s[ok]
                elif agg == "mean":
                    c = np.frombuffer(row["aux"], dtype="<f8").reshape(shape)
                    first = ok & np.isnan(acc)
                    acc[first] = 0.0
                    acc[ok] += s[ok]
                    cnt += c
                elif agg in ("first", "last"):
                    o = np.frombuffer(row["aux"], dtype="<f8").reshape(shape)
                    if agg == "first":
                        take = ok & (np.isnan(acc_ord) | (o < acc_ord))
                    else:
                        take = ok & (np.isnan(acc_ord) | (o > acc_ord))
                    acc[take] = s[take]
                    acc_ord[take] = o[take]
            if agg == "mean":
                with np.errstate(invalid="ignore"):
                    acc = acc / np.maximum(cnt, 1)
            if out_idx is not None and len(out_idx) != acc.shape[0]:
                acc = acc[out_idx]
            if np.all(np.isnan(acc)):
                return pd.DataFrame(columns=[f.name for f in CHUNK_SCHEMA.fields])
            for f in chain:  # fused narrow chain (map_chunks elision contract)
                acc = f(acc, (kt, ky, kx))
                if acc is None or (isinstance(acc, np.ndarray) and np.all(np.isnan(acc))):
                    return pd.DataFrame(columns=[f.name for f in CHUNK_SCHEMA.fields])
            return pd.DataFrame([dict(chunk_id=cid, ct=kt, cy=ky, cx=kx, nb=acc.shape[0], nt=acc.shape[1],
                                      ny=acc.shape[2], nx=acc.shape[3], data=pack_tensor(acc))])
        return merge

    salted = exploded.withColumn("_salt", F.pmod(F.xxhash64("image_id"), F.lit(salt)))
    part = (pin_group_partitions(salted, ["chunk_id", "_salt"], g.n_chunks * salt)
            .groupBy("chunk_id", "_salt").applyInPandas(partial, part_schema))

    def make_df(chain: tuple):
        return part.groupBy("chunk_id").applyInPandas(mk_merge(chain), CHUNK_SCHEMA)

    return Cube(make_df(()), view, list(bands), g), make_df


def inventory_partition_columns(images: DataFrame, time_bucket: str = "month",
                                cell_deg: float = 2.0) -> DataFrame:
    """Assign the storage-partition columns for a planet-scale inventory:
    pt_tb (time bucket) and pt_gy/pt_gx (coarse spatial cell of the bbox
    center). Writing the inventory partitioned by these (parquet here,
    Iceberg partition spec on a cluster) lets the scan's datetime/bbox
    predicates prune at the METADATA level — the analogue of the reference's
    per-chunk SQLite WHERE (image_collection.cpp:1373-1383), but evaluated
    against file statistics instead of rows. At 10^12 images this is the
    difference between touching TBs of metadata and touching only the
    partitions a cube view overlaps."""
    tb = {"month": F.date_format("datetime", "yyyy-MM"),
          "day": F.date_format("datetime", "yyyy-MM-dd"),
          "year": F.date_format("datetime", "yyyy")}[time_bucket]
    # pt_ext: extent bucket e = ceil(log2(extent_cells)), clamped ≥ 0. An
    # image in bucket e spans ≤ 2^e cells per axis, so its CENTER cell is at
    # most 2^(e-1)+1 cells away from any view it overlaps — the read-side
    # prune derives its slack per bucket instead of assuming one fixed cell
    # (a fixed slack silently dropped oversized scenes: mosaics, full-swath
    # granules).
    ext = F.greatest((F.col("right") - F.col("left")) / cell_deg,
                     (F.col("top") - F.col("bottom")) / cell_deg)
    return (images
            .withColumn("pt_tb", tb)
            .withColumn("pt_gy", F.floor(((F.col("bottom") + F.col("top")) / 2) / cell_deg).cast("int"))
            .withColumn("pt_gx", F.floor(((F.col("left") + F.col("right")) / 2) / cell_deg).cast("int"))
            .withColumn("pt_ext", F.greatest(F.lit(0), F.ceil(F.log2(F.greatest(ext, F.lit(1e-9))))).cast("int")))


def read_inventory(spark, path: str, view: CubeView, cell_deg: float = 2.0,
                   time_bucket: str = "month") -> DataFrame:
    """Open a partitioned inventory pruned to the view's spatiotemporal
    window: the filters hit the PARTITION columns, so Spark prunes whole
    directories/files before any row is read."""
    df = spark.read.parquet(path)
    tbs = set()
    for i in range(view.nt):
        d = view.datetime_at_index(i)
        tbs.add(d.to_string()[:7] if time_bucket == "month"
                else d.to_string()[:10] if time_bucket == "day" else d.to_string()[:4])
    # COVER-based bbox prune: slack per extent bucket (see
    # inventory_partition_columns). A bucket-e image spans ≤ 2^e cells per
    # axis → its center sits ≤ 2^(e-1)+1 cells outside any view it overlaps.
    # The OR-of-buckets predicate is static (no data read to build it) and
    # made entirely of partition columns, so Spark still prunes whole
    # directories; legacy inventories without pt_ext fall back to the old
    # one-cell slack.
    gy0 = int(np.floor(view.bottom / cell_deg))
    gy1 = int(np.floor(view.top / cell_deg))
    gx0 = int(np.floor(view.left / cell_deg))
    gx1 = int(np.floor(view.right / cell_deg))
    time_pred = F.col("pt_tb").isin(sorted(tbs))
    if "pt_ext" not in df.columns:
        return df.filter(time_pred
                         & F.col("pt_gy").between(gy0 - 1, gy1 + 1)
                         & F.col("pt_gx").between(gx0 - 1, gx1 + 1))
    MAX_EXT_BUCKET = 24  # 2^24 cells ≈ the whole planet at any sane cell_deg
    pred = None
    for e in range(MAX_EXT_BUCKET + 1):
        s = (1 << max(e - 1, 0)) + 1
        p = ((F.col("pt_ext") == e)
             & F.col("pt_gy").between(gy0 - s, gy1 + s)
             & F.col("pt_gx").between(gx0 - s, gx1 + s))
        pred = p if pred is None else (pred | p)
    return df.filter(time_pred & pred)
