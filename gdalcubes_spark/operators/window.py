"""window_time / window_space / fill_time: moving-window and gap-fill ops.

Reference semantics:
- window_time (window_time.h:49-73, .cpp:28-249): window = (l, r) cells
  around center along t; named reducers (mean, sum, count, prod, min, max,
  median — NaN-skipping) as (reducer, band) pairs, OR a convolution kernel of
  length l+1+r applied to every band (any NaN in the window → NaN,
  .cpp:104-119). Values beyond the cube's time range are NaN.
- window_space (window_space.h:47-185, .cpp:24-721): odd ny×nx focal window
  per band and time slice; reducer pairs or 2-D kernel; padding modes
  none/constant/replicate/reflect/reflect_pixel applied at CUBE boundaries
  (openEO apply_kernel semantics); chunk boundaries use real neighbor data
  (halo exchange — correctness must be chunking-invariant,
  test_window_space.R:44-49).
- fill_time (fill_time.h:20-47, .cpp:24-229): near (tie → previous), linear
  (one-sided → copy), locf, nocb; scans across chunk boundaries arbitrarily
  far.

Spark shapes:
- window_time / fill_time: if nct == 1 → NARROW mapInPandas (no shuffle).
  Else: halo slab exchange along t (window) or full-column gather (fill) —
  one bounded shuffle keyed by the spatial chunk.
- window_space: halo exchange — every chunk ships ≤ 8 boundary strips of
  width = window radius to its neighbors (tiny vs the tensor), groupBy
  assembles the padded plane. This is the canonical Spark stencil pattern.
"""

from __future__ import annotations

from typing import Iterable, List, Optional, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gdalcubes_spark.cube import CHUNK_SCHEMA, Cube, chunk_stream, pack_tensor, pin_group_partitions, tensor_of
from gdalcubes_spark.operators.reduce import parse_pairs

_WINDOW_REDUCERS = {
    "mean": np.nanmean, "sum": np.nansum, "count": lambda a, axis: np.sum(~np.isnan(a), axis=axis),
    "prod": np.nanprod, "min": np.nanmin, "max": np.nanmax, "median": np.nanmedian,
}


def _nanreduce_window(name: str, w: np.ndarray) -> np.ndarray:
    """Reduce the last axis of a sliding-window view with NaN-skip semantics;
    all-NaN windows → NaN (count → 0)."""
    allnan = np.all(np.isnan(w), axis=-1)
    with np.errstate(all="ignore"):
        if name == "count":
            return np.sum(~np.isnan(w), axis=-1).astype("float64")
        filled = np.where(allnan[..., None], 0.0, w)
        r = _WINDOW_REDUCERS[name](filled, axis=-1)
    return np.where(allnan, np.nan, r)


def window_time(cube: Cube, window: Sequence[int], reducer=None, kernel=None) -> Cube:
    l, r = int(window[0]), int(window[1])
    view, g = cube.view, cube.chunking
    if kernel is not None:
        kernel = np.asarray(kernel, dtype="float64")
        if kernel.size != l + 1 + r:
            raise ValueError("kernel length must be l+1+r (window_time.cpp:104-106)")
        out_bands = list(cube.bands)
        bidx = list(range(len(cube.bands)))
        rnames = None
    else:
        pairs = parse_pairs([reducer] if isinstance(reducer, str) else list(reducer), cube.bands)
        for name, _ in pairs:
            if name not in _WINDOW_REDUCERS:
                raise ValueError(f"window_time reducer {name!r} not supported")
        out_bands = [f"{b}_{n}" for n, b in pairs]
        bidx = [cube.bands.index(b) for _, b in pairs]
        rnames = [n for n, _ in pairs]

    def compute(padded: np.ndarray, ntc: int) -> np.ndarray:
        """padded: (nb, l + ntc + r, ny, nx) → (nb_out, ntc, ny, nx)."""
        sw = np.lib.stride_tricks.sliding_window_view(padded, l + 1 + r, axis=1)  # (nb, ntc, ny, nx, W)
        if kernel is not None:
            out = np.einsum("btyxw,w->btyx", sw[bidx], kernel)  # NaN propagates
        else:
            out = np.stack([_nanreduce_window(n, sw[bi]) for n, bi in zip(rnames, bidx)], axis=0)
        return out

    if g.nct == 1:
        def fn(t: np.ndarray, coords):
            nb, ntc, ny, nx = t.shape
            padded = np.concatenate([np.full((nb, l, ny, nx), np.nan), t,
                                     np.full((nb, r, ny, nx), np.nan)], axis=1)
            return compute(padded, ntc)
        return cube.map_chunks(fn, out_bands=out_bands)

    # halo slab exchange along t: chunk k needs [k*ct - l, (k+1)*ct + r)
    halo_schema = T.StructType([
        T.StructField("tkey", T.LongType(), False),   # target chunk id
        T.StructField("off", T.IntegerType(), False),  # dest offset in padded buffer
        T.StructField("nb", T.IntegerType(), False),
        T.StructField("nt", T.IntegerType(), False),
        T.StructField("ny", T.IntegerType(), False),
        T.StructField("nx", T.IntegerType(), False),
        T.StructField("is_core", T.IntegerType(), False),
        T.StructField("data", T.BinaryType(), False),
    ])

    base_df, _xf = chunk_stream(cube)  # fuse any pending narrow chain in here

    def emit(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                ict, icy, icx = int(row["ct"]), int(row["cy"]), int(row["cx"])
                t_ = _xf(tensor_of(row), (ict, icy, icx))
                if t_ is None:
                    continue
                (t0, t1), _, _ = g.chunk_cell_range(ict, icy, icx)
                for kt in range(max(0, (t0 - r) // g.ct), min(g.nct - 1, (t1 - 1 + l) // g.ct) + 1):
                    (kt0, kt1), _, _ = g.chunk_cell_range(kt, icy, icx)
                    lo, hi = max(t0, kt0 - l), min(t1, kt1 + r)
                    if lo >= hi:
                        continue
                    piece = t_[:, lo - t0 : hi - t0]
                    rows.append(dict(tkey=g.chunk_id(kt, icy, icx), off=lo - (kt0 - l),
                                     nb=piece.shape[0], nt=piece.shape[1], ny=piece.shape[2],
                                     nx=piece.shape[3], is_core=int(kt == ict),
                                     data=pack_tensor(piece)))
            yield pd.DataFrame(rows, columns=[f.name for f in halo_schema.fields]) if rows else \
                pd.DataFrame({f.name: pd.Series(dtype="object") for f in halo_schema.fields})

    nb_in = len(cube.bands)

    def assemble(key, pdf: pd.DataFrame) -> pd.DataFrame:
        cid = int(key[0])
        kt, ky, kx = g.chunk_coords(cid)
        (kt0, kt1), (y0, y1), (x0, x1) = g.chunk_cell_range(kt, ky, kx)
        ntc, ny, nx = kt1 - kt0, y1 - y0, x1 - x0
        # NOTE: no is_core guard — an elided (all-NaN) core chunk still gets a
        # window computed from neighbor halo data (window_time.cpp:160-251);
        # the all-NaN output check below keeps the missing-chunk invariant.
        padded = np.full((nb_in, l + ntc + r, ny, nx), np.nan)
        for _, row in pdf.iterrows():
            p = tensor_of(row)
            padded[:, int(row["off"]) : int(row["off"]) + p.shape[1]] = p
        out = compute(padded, ntc)
        if np.all(np.isnan(out)):
            return pd.DataFrame(columns=[f.name for f in CHUNK_SCHEMA.fields])
        return pd.DataFrame([dict(chunk_id=cid, ct=kt, cy=ky, cx=kx, nb=out.shape[0], nt=ntc,
                                  ny=ny, nx=nx, data=pack_tensor(out))])

    df = (pin_group_partitions(base_df.mapInPandas(emit, halo_schema), "tkey", g.n_chunks)
          .groupBy("tkey").applyInPandas(assemble, CHUNK_SCHEMA))
    return Cube(df, view, out_bands, g)


# ---------------------------------------------------------------------------


def _pad_plane(p: np.ndarray, hy: int, hx: int, mode: str, value: float,
               at_top: bool, at_bottom: bool, at_left: bool, at_right: bool) -> np.ndarray:
    """Apply cube-boundary padding to the outer border of an already-haloed
    plane p (..., ny+2hy, nx+2hx). Interior (chunk-boundary) halo cells were
    filled from real neighbors; only cube edges get synthetic padding."""
    if mode == "none":
        return p
    def fill_axis(arr, axis, lo, hi, h):
        idx = [slice(None)] * arr.ndim
        n = arr.shape[axis]
        if lo:
            src_sl, dst_sl = list(idx), list(idx)
            if mode == "constant":
                dst_sl[axis] = slice(0, h)
                arr[tuple(dst_sl)] = value
            elif mode == "replicate":
                src_sl[axis] = slice(h, h + 1)
                dst_sl[axis] = slice(0, h)
                arr[tuple(dst_sl)] = np.repeat(arr[tuple(src_sl)], h, axis=axis)
            elif mode in ("reflect", "reflect_pixel"):
                o = 0 if mode == "reflect" else 1
                for k in range(h):
                    s, d = list(idx), list(idx)
                    d[axis] = slice(h - 1 - k, h - k)
                    s[axis] = slice(h + k + o, h + k + o + 1)
                    arr[tuple(d)] = arr[tuple(s)]
        if hi:
            if mode == "constant":
                d = list(idx); d[axis] = slice(n - h, n)
                arr[tuple(d)] = value
            elif mode == "replicate":
                s, d = list(idx), list(idx)
                s[axis] = slice(n - h - 1, n - h)
                d[axis] = slice(n - h, n)
                arr[tuple(d)] = np.repeat(arr[tuple(s)], h, axis=axis)
            elif mode in ("reflect", "reflect_pixel"):
                o = 0 if mode == "reflect" else 1
                for k in range(h):
                    s, d = list(idx), list(idx)
                    d[axis] = slice(n - h + k, n - h + k + 1)
                    s[axis] = slice(n - h - 1 - k - o, n - h - k - o)
                    arr[tuple(d)] = arr[tuple(s)]
        return arr
    p = fill_axis(p, p.ndim - 2, at_top, at_bottom, hy)
    p = fill_axis(p, p.ndim - 1, at_left, at_right, hx)
    return p


def window_space(cube: Cube, reducer=None, kernel=None, window: Optional[Sequence[int]] = None,
                 pad: str = "none", pad_value: float = 0.0) -> Cube:
    view, g = cube.view, cube.chunking
    if kernel is not None:
        kernel = np.asarray(kernel, dtype="float64")
        if kernel.ndim != 2 or kernel.shape[0] % 2 == 0 or kernel.shape[1] % 2 == 0:
            raise ValueError("kernel must be 2-D with odd dimensions")
        wy, wx = kernel.shape
        out_bands = list(cube.bands)
        bidx = list(range(len(cube.bands)))
        rnames = None
    else:
        if window is None:
            raise ValueError("need window=(ny, nx) with a reducer")
        wy, wx = int(window[0]), int(window[1])
        if wy % 2 == 0 or wx % 2 == 0:
            raise ValueError("window dimensions must be odd")
        pairs = parse_pairs([reducer] if isinstance(reducer, str) else list(reducer), cube.bands)
        for name, _ in pairs:
            if name not in _WINDOW_REDUCERS:
                raise ValueError(f"window_space reducer {name!r} not supported")
        out_bands = [f"{b}_{n}" for n, b in pairs]
        bidx = [cube.bands.index(b) for _, b in pairs]
        rnames = [n for n, _ in pairs]
    hy, hx = wy // 2, wx // 2
    if pad not in ("none", "constant", "replicate", "reflect", "reflect_pixel"):
        raise ValueError(f"unknown pad mode {pad!r}")

    halo_schema = T.StructType([
        T.StructField("tkey", T.LongType(), False),
        T.StructField("offy", T.IntegerType(), False),
        T.StructField("offx", T.IntegerType(), False),
        T.StructField("nb", T.IntegerType(), False),
        T.StructField("nt", T.IntegerType(), False),
        T.StructField("ny", T.IntegerType(), False),
        T.StructField("nx", T.IntegerType(), False),
        T.StructField("is_core", T.IntegerType(), False),
        T.StructField("data", T.BinaryType(), False),
    ])

    base_df, _xf = chunk_stream(cube)  # fuse any pending narrow chain in here

    def emit(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                ict, icy, icx = int(row["ct"]), int(row["cy"]), int(row["cx"])
                t_ = _xf(tensor_of(row), (ict, icy, icx))
                if t_ is None:
                    continue
                _, (y0, y1), (x0, x1) = g.chunk_cell_range(ict, icy, icx)
                for ky in range(max(0, (y0 - hy) // g.cy), min(g.ncy - 1, (y1 - 1 + hy) // g.cy) + 1):
                    for kx in range(max(0, (x0 - hx) // g.cx), min(g.ncx - 1, (x1 - 1 + hx) // g.cx) + 1):
                        _, (ky0, ky1), (kx0, kx1) = g.chunk_cell_range(ict, ky, kx)
                        ylo, yhi = max(y0, ky0 - hy), min(y1, ky1 + hy)
                        xlo, xhi = max(x0, kx0 - hx), min(x1, kx1 + hx)
                        if ylo >= yhi or xlo >= xhi:
                            continue
                        piece = t_[:, :, ylo - y0 : yhi - y0, xlo - x0 : xhi - x0]
                        rows.append(dict(tkey=g.chunk_id(ict, ky, kx),
                                         offy=ylo - (ky0 - hy), offx=xlo - (kx0 - hx),
                                         nb=piece.shape[0], nt=piece.shape[1],
                                         ny=piece.shape[2], nx=piece.shape[3],
                                         is_core=int(ky == icy and kx == icx),
                                         data=pack_tensor(piece)))
            yield pd.DataFrame(rows, columns=[f.name for f in halo_schema.fields]) if rows else \
                pd.DataFrame({f.name: pd.Series(dtype="object") for f in halo_schema.fields})

    nb_in = len(cube.bands)

    def assemble(key, pdf: pd.DataFrame) -> pd.DataFrame:
        cid = int(key[0])
        kt, ky, kx = g.chunk_coords(cid)
        (t0, t1), (y0, y1), (x0, x1) = g.chunk_cell_range(kt, ky, kx)
        ntc, ny, nx = t1 - t0, y1 - y0, x1 - x0
        # NOTE: no is_core guard — see window_time.assemble; an all-NaN core
        # with live neighbor halos must still produce windowed values.
        padded = np.full((nb_in, ntc, ny + 2 * hy, nx + 2 * hx), np.nan)
        for _, row in pdf.iterrows():
            p = tensor_of(row)
            padded[:, :, int(row["offy"]) : int(row["offy"]) + p.shape[2],
                   int(row["offx"]) : int(row["offx"]) + p.shape[3]] = p
        padded = _pad_plane(padded, hy, hx, pad, pad_value,
                            at_top=(y0 == 0), at_bottom=(y1 == g.ny),
                            at_left=(x0 == 0), at_right=(x1 == g.nx))
        swy = np.lib.stride_tricks.sliding_window_view(padded, wy, axis=2)
        sw = np.lib.stride_tricks.sliding_window_view(swy, wx, axis=3)  # (nb,ntc,ny,nx,wy,wx)
        if kernel is not None:
            out = np.einsum("btyxuv,uv->btyx", sw[bidx], kernel)
        else:
            flat = sw.reshape(sw.shape[:4] + (wy * wx,))
            out = np.stack([_nanreduce_window(n, flat[bi]) for n, bi in zip(rnames, bidx)], axis=0)
        if np.all(np.isnan(out)):
            return pd.DataFrame(columns=[f.name for f in CHUNK_SCHEMA.fields])
        return pd.DataFrame([dict(chunk_id=cid, ct=kt, cy=ky, cx=kx, nb=out.shape[0], nt=ntc,
                                  ny=ny, nx=nx, data=pack_tensor(out))])

    df = (pin_group_partitions(base_df.mapInPandas(emit, halo_schema), "tkey", g.n_chunks)
          .groupBy("tkey").applyInPandas(assemble, CHUNK_SCHEMA))
    return Cube(df, view, out_bands, g)


# ---------------------------------------------------------------------------


def _fill_series(v: np.ndarray, method: str) -> np.ndarray:
    """Vectorized fill along axis 0 of v (T, ...) per fill_time.cpp:140-185."""
    Tn = v.shape[0]
    idx = np.arange(Tn).reshape((Tn,) + (1,) * (v.ndim - 1))
    valid = ~np.isnan(v)
    # previous valid index at each t (or -1)
    prev_idx = np.where(valid, idx, -1)
    prev_idx = np.maximum.accumulate(prev_idx, axis=0)
    # next valid index at each t (or T)
    next_idx = np.where(valid, idx, Tn)
    next_idx = np.minimum.accumulate(next_idx[::-1], axis=0)[::-1]
    take_prev = np.clip(prev_idx, 0, Tn - 1)
    take_next = np.clip(next_idx, 0, Tn - 1)
    v0 = np.take_along_axis(v, take_prev, axis=0)
    v0 = np.where(prev_idx >= 0, v0, np.nan)
    v1 = np.take_along_axis(v, take_next, axis=0)
    v1 = np.where(next_idx < Tn, v1, np.nan)
    pd_ = (idx - prev_idx).astype("float64")
    nd_ = (next_idx - idx).astype("float64")
    with np.errstate(all="ignore"):
        if method == "locf":
            filled = v0
        elif method == "nocb":
            filled = v1
        elif method == "near":
            filled = np.where(np.isnan(v0), v1,
                              np.where(np.isnan(v1), v0,
                                       np.where(pd_ <= nd_, v0, v1)))
        elif method == "linear":
            interp = v0 * (nd_ / (pd_ + nd_)) + v1 * (pd_ / (pd_ + nd_))
            filled = np.where(np.isnan(v0), v1, np.where(np.isnan(v1), v0, interp))
        else:
            raise ValueError(f"unknown fill method {method!r}")
    return np.where(valid, v, filled)


def fill_time(cube: Cube, method: str = "linear") -> Cube:
    if method not in ("near", "linear", "locf", "nocb"):
        raise ValueError(f"unknown fill method {method!r} (fill_time.h:20-47)")
    view, g = cube.view, cube.chunking
    if g.nct == 1:
        def fn(t: np.ndarray, coords):
            return _fill_series(np.moveaxis(t, 1, 0), method).transpose(1, 0, 2, 3)
        return cube.map_chunks(fn)

    # gather the full time column per spatial chunk (fill scans arbitrarily far)
    def gather(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ct")
        icy, icx = int(pdf.iloc[0]["cy"]), int(pdf.iloc[0]["cx"])
        ny, nx = int(pdf.iloc[0]["ny"]), int(pdf.iloc[0]["nx"])
        nb = int(pdf.iloc[0]["nb"])
        full = np.full((nb, g.nt, ny, nx), np.nan)
        for _, row in pdf.iterrows():
            (t0, t1), _, _ = g.chunk_cell_range(int(row["ct"]), icy, icx)
            full[:, t0:t1] = tensor_of(row)
        filled = _fill_series(np.moveaxis(full, 1, 0), method).transpose(1, 0, 2, 3)
        rows = []
        for kt in range(g.nct):
            (t0, t1), _, _ = g.chunk_cell_range(kt, icy, icx)
            piece = filled[:, t0:t1]
            if np.all(np.isnan(piece)):
                continue
            rows.append(dict(chunk_id=g.chunk_id(kt, icy, icx), ct=kt, cy=icy, cx=icx,
                             nb=nb, nt=t1 - t0, ny=ny, nx=nx, data=pack_tensor(piece)))
        return pd.DataFrame(rows, columns=[f.name for f in CHUNK_SCHEMA.fields]) if rows else \
            pd.DataFrame(columns=[f.name for f in CHUNK_SCHEMA.fields])

    keyed = cube.df.withColumn("skey", F.col("cy").cast("long") * g.ncx + F.col("cx"))
    df = (pin_group_partitions(keyed, "skey", g.ncy * g.ncx)
          .groupBy("skey").applyInPandas(gather, CHUNK_SCHEMA))
    return Cube(df, view, list(cube.bands), g)
