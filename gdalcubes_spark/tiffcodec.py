"""Pure-numpy GeoTIFF writer/reader (TIFF 6.0 + GeoTIFF 1.1 tags), COG layout.

Closes the reference's `write_tif`/COG export surface (cube.cpp:292-615:
`write_tif_collection`, `write_tif_COG`) with REAL GeoTIFF bytes — no GDAL
in this container, so the format is implemented from the public TIFF 6.0
specification and the OGC GeoTIFF 1.1 standard:

- classic little-endian TIFF, TILED layout (tile dims multiple of 16),
  pixel-interleaved (PlanarConfiguration=1),
- sample types uint8/16/32, int16/32, float32/64 (BitsPerSample +
  SampleFormat per band),
- Compression 8 (zlib/Deflate — the "Adobe deflate" every GDAL/QGIS reads)
  or 1 (none); horizontal-differencing Predictor 2 for integers and the
  TechNote-3 floating-point Predictor 3 (byte-plane split + diff) for
  float samples,
- georeferencing via ModelPixelScaleTag (33550), ModelTiepointTag (33922)
  and GeoKeyDirectoryTag (34735) carrying the EPSG code
  (GeographicTypeGeoKey for 4xxx codes, ProjectedCSTypeGeoKey otherwise),
- nodata via the GDAL_NODATA ASCII tag (42113) — the de-facto standard,
- Cloud-Optimized layout: ALL IFDs (full resolution + the factor-2 overview
  pyramid, NewSubfileType=1) at the head of the file, tile data after,
  lowest-resolution tiles first — a range-GET of the first kilobytes yields
  every IFD plus a preview, exactly the property COG exists for.

Classic TIFF offsets are u32 (4 GiB cap); `encode_geotiff` auto-upgrades to
**BigTIFF** (version 43: 64-bit offsets, 20-byte IFD entries, LONG8 tile
offsets) when the layout would overflow, or on request (`bigtiff=True`) —
so arbitrarily large slices encode, and the reader handles both versions.

The reader handles both byte orders, tiled and stripped layouts,
Deflate(8/32946)/none, Predictor 1/2/3, and multiple IFDs, so the writer's
output round-trips and external baseline GeoTIFFs (e.g. gdal_translate
output) decode too.
"""

from __future__ import annotations

import struct
import zlib
from typing import List, Optional, Tuple

import numpy as np

# TIFF value types we emit/understand
_TY_BYTE, _TY_ASCII, _TY_SHORT, _TY_LONG, _TY_RATIONAL, _TY_DOUBLE = 1, 2, 3, 4, 5, 12
_TY_LONG8 = 16  # BigTIFF 64-bit unsigned
_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8, 11: 4, 12: 8,
              16: 8, 17: 8, 18: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i", 11: "f", 12: "d",
             16: "Q", 17: "q", 18: "Q"}

# numpy dtype → (bits, SampleFormat): 1=unsigned int, 2=signed int, 3=IEEE float
_DTYPES = {
    np.dtype("uint8"): (8, 1), np.dtype("uint16"): (16, 1), np.dtype("uint32"): (32, 1),
    np.dtype("int16"): (16, 2), np.dtype("int32"): (32, 2),
    np.dtype("float32"): (32, 3), np.dtype("float64"): (64, 3),
}
_DTYPES_REV = {v: k for k, v in _DTYPES.items()}


def _pack_values(ty: int, values) -> bytes:
    if ty == _TY_ASCII:
        return bytes(values)  # caller includes the NUL
    fmt = _TYPE_FMT[ty]
    return struct.pack(f"<{len(values)}{fmt}", *values)


class _IfdBuilder:
    """One IFD: entries + out-of-line value area, rendered at a known offset.
    `big=True` emits the BigTIFF layout (u64 entry count, 20-byte entries,
    8-byte inline values, u64 next pointer)."""

    def __init__(self, big: bool = False):
        self.tags: List[Tuple[int, int, int, object]] = []  # (tag, type, count, values)
        self.big = big

    @property
    def _entry(self):  # (entry bytes, inline capacity, count/offset fmt)
        return (20, 8, "Q") if self.big else (12, 4, "I")

    def add(self, tag: int, ty: int, values) -> None:
        if ty == _TY_ASCII:
            values = values if isinstance(values, bytes) else str(values).encode()
            if not values.endswith(b"\x00"):
                values += b"\x00"
            self.tags.append((tag, ty, len(values), values))
        else:
            values = list(values) if hasattr(values, "__len__") else [values]
            self.tags.append((tag, ty, len(values), values))

    def size(self) -> int:
        esz, inline, _ = self._entry
        n = (8 if self.big else 2) + esz * len(self.tags) + (8 if self.big else 4)
        for _, ty, count, _ in self.tags:
            sz = _TYPE_SIZE[ty] * count
            if sz > inline:
                n += sz + (sz & 1)  # keep value offsets even
        return n

    def render(self, at: int, next_ifd: int) -> bytes:
        esz, inline, ofmt = self._entry
        tags = sorted(self.tags)  # TIFF requires ascending tag order
        head = struct.pack("<Q", len(tags)) if self.big else struct.pack("<H", len(tags))
        body, extra = b"", b""
        voff = at + len(head) + esz * len(tags) + (8 if self.big else 4)
        for tag, ty, count, values in tags:
            payload = _pack_values(ty, values)
            if len(payload) <= inline:
                body += struct.pack(f"<HH{ofmt}", tag, ty, count) + payload.ljust(inline, b"\x00")
            else:
                body += struct.pack(f"<HH{ofmt}{ofmt}", tag, ty, count, voff + len(extra))
                extra += payload + (b"\x00" if len(payload) & 1 else b"")
        return head + body + struct.pack(f"<{ofmt}", next_ifd) + extra


def _tile_grid(h: int, w: int, tile: int) -> Tuple[int, int]:
    return -(-h // tile), -(-w // tile)  # tiles down, tiles across


def _split_tiles(a: np.ndarray, tile: int) -> List[np.ndarray]:
    """(h, w, nb) → padded (tile, tile, nb) tiles, row-major."""
    h, w, nb = a.shape
    td, ta = _tile_grid(h, w, tile)
    out = []
    for ty in range(td):
        for tx in range(ta):
            t = a[ty * tile:(ty + 1) * tile, tx * tile:(tx + 1) * tile]
            if t.shape[0] != tile or t.shape[1] != tile:
                p = np.zeros((tile, tile, nb), dtype=a.dtype)
                p[: t.shape[0], : t.shape[1]] = t
                t = p
            out.append(np.ascontiguousarray(t))
    return out


def _downsample2(a: np.ndarray, nodata: Optional[float]) -> np.ndarray:
    """Factor-2 nodata/NaN-aware block mean, (nb, h, w) → (nb, ceil/2, ceil/2)."""
    nb, h, w = a.shape
    H, W = -(-h // 2) * 2, -(-w // 2) * 2
    f = a.astype(np.float64)
    if nodata is not None and not np.isnan(nodata):
        f = np.where(f == nodata, np.nan, f)
    pad = np.full((nb, H, W), np.nan)
    pad[:, :h, :w] = f
    blocks = pad.reshape(nb, H // 2, 2, W // 2, 2)
    import warnings as _warnings
    with np.errstate(invalid="ignore"), _warnings.catch_warnings():
        _warnings.simplefilter("ignore", RuntimeWarning)  # all-nodata blocks
        m = np.nanmean(blocks, axis=(2, 4))
    if np.issubdtype(a.dtype, np.integer):
        fill = nodata if nodata is not None else 0
        m = np.where(np.isnan(m), fill, np.rint(m))
        return m.astype(a.dtype)
    if nodata is not None and not np.isnan(nodata):
        m = np.where(np.isnan(m), nodata, m)
    return m.astype(a.dtype)


# Geocentric / 3D CRS codes inside the 4xxx range that must NOT be labeled
# as 2D geographic (GTModelType=2 + GeographicTypeGeoKey). This is a
# deny-set of the realizations users actually hit (WGS84, ETRS89, the ITRF
# yearly realizations); a complete classification needs an EPSG database —
# see the docstring caveat in encode_geotiff.
_NON_2D_4XXX = frozenset(
    [4978, 4979,            # WGS84 geocentric / 3D
     4936, 4937,            # ETRS89 geocentric / 3D
     4896, 4897, 4919, 4920]  # ITRF2005/ITRF2008-family geocentric
    + list(range(4910, 4919)))  # ITRF88..ITRF2000 geocentric


def _geokeys(epsg: int) -> List[int]:
    # 2-D geographic CRS live in 4000-4999, but that range also holds
    # geocentric/3D codes — refuse the known ones outright (the writer
    # cannot express a geocentric CRS in these two GeoKeys)
    if epsg in _NON_2D_4XXX:
        raise ValueError(f"EPSG:{epsg} is a geocentric/3D CRS; encode_geotiff "
                         "supports 2D geographic (4xxx) and projected codes only")
    geographic = 4000 <= epsg < 5000
    keys = [
        (1024, 0, 1, 2 if geographic else 1),  # GTModelType: 2 geographic, 1 projected
        (1025, 0, 1, 1),                       # GTRasterType: PixelIsArea
        (2048 if geographic else 3072, 0, 1, epsg),
    ]
    flat = [1, 1, 0, len(keys)]
    for k in keys:
        flat.extend(k)
    return flat


def encode_geotiff(
    a: np.ndarray,
    *,
    tile: int = 256,
    compress: str = "deflate",
    predictor: Optional[int] = None,
    nodata: Optional[float] = None,
    left: Optional[float] = None,
    top: Optional[float] = None,
    dx: Optional[float] = None,
    dy: Optional[float] = None,
    epsg: Optional[int] = None,
    overviews: bool = True,
    zlevel: int = 6,
    bigtiff: Optional[bool] = None,
) -> bytes:
    """(nb, h, w) ndarray → Cloud-Optimized GeoTIFF bytes.

    `predictor=2` (horizontal differencing) is auto-enabled for integer
    dtypes under deflate unless explicitly passed; floats always use
    predictor 1. Overviews are factor-2 block means down to one tile.
    `bigtiff`: True forces the BigTIFF (version 43, 64-bit offset) layout;
    None (default) auto-upgrades when the classic u32 layout would overflow
    4 GiB — so arbitrarily large slices always encode.

    CRS caveat: `epsg` in 4000-4999 is labeled 2D geographic except the
    known geocentric/3D realizations in _NON_2D_4XXX (rejected). Exotic
    4xxx codes outside that deny-set cannot be auto-classified without an
    EPSG database — pass 2D geographic or projected codes only.
    """
    a = np.asarray(a)
    if a.ndim == 2:
        a = a[None]
    nb, h, w = a.shape
    if a.dtype not in _DTYPES:
        raise ValueError(f"unsupported dtype {a.dtype}; one of {sorted(str(k) for k in _DTYPES)}")
    if tile % 16 or tile <= 0:
        raise ValueError("TIFF tile dims must be positive multiples of 16")
    bits, sfmt = _DTYPES[a.dtype]
    comp = {"none": 1, "deflate": 8}[compress]
    if predictor is None:
        predictor = 2 if (comp == 8 and sfmt != 3) else 1
    if predictor == 2 and sfmt == 3:
        raise ValueError("predictor 2 is integer-only")
    if predictor == 3 and sfmt != 3:
        raise ValueError("predictor 3 (floating-point) is float-only")

    # pyramid: full res first, then factor-2 overviews down to a single tile
    levels = [a]
    while overviews and max(levels[-1].shape[1], levels[-1].shape[2]) > tile:
        levels.append(_downsample2(levels[-1], nodata))

    # compress every tile of every level
    def tile_bytes(lv: np.ndarray) -> List[bytes]:
        inter = np.moveaxis(lv, 0, -1)  # (h, w, nb) pixel-interleaved
        out = []
        for t in _split_tiles(inter, tile):
            if predictor == 2:
                # horizontal differencing per channel; wraps in-dtype per spec
                t = np.concatenate([t[:, :1, :], t[:, 1:, :] - t[:, :-1, :]], axis=1)
                raw = t.tobytes()
            elif predictor == 3:
                # TIFF TechNote 3 floating-point predictor: per row, floats
                # become big-endian, bytes split into planes (all MSBs first),
                # then the reorganized row is byte-differenced
                th_, tw_, nbc = t.shape
                K = t.dtype.itemsize
                be = np.ascontiguousarray(t.reshape(th_, tw_ * nbc)
                                          .astype(t.dtype.newbyteorder(">")))
                rows = be.view(np.uint8).reshape(th_, tw_ * nbc, K)
                planes = rows.transpose(0, 2, 1).reshape(th_, tw_ * nbc * K)
                diff = planes.copy()
                diff[:, 1:] -= planes[:, :-1]
                raw = diff.tobytes()
            else:
                raw = t.tobytes()
            out.append(zlib.compress(raw, zlevel) if comp == 8 else raw)
        return out

    level_tiles = [tile_bytes(lv) for lv in levels]

    # build IFDs (tile offsets patched in a second pass)
    ifds = []
    for li, lv in enumerate(levels):
        _, lh, lw = lv.shape
        ntiles = int(np.prod(_tile_grid(lh, lw, tile)))
        b = _IfdBuilder()
        if li > 0:
            b.add(254, _TY_LONG, 1)  # NewSubfileType: reduced-resolution image
        b.add(256, _TY_LONG, lw)
        b.add(257, _TY_LONG, lh)
        b.add(258, _TY_SHORT, [bits] * nb)
        b.add(259, _TY_SHORT, comp)
        b.add(262, _TY_SHORT, 2 if (nb == 3 and a.dtype == np.uint8) else 1)
        b.add(277, _TY_SHORT, nb)
        b.add(284, _TY_SHORT, 1)
        if nb > 1 and not (nb == 3 and a.dtype == np.uint8):
            b.add(338, _TY_SHORT, [0] * (nb - 1))  # extra samples: unspecified
        if predictor in (2, 3):
            b.add(317, _TY_SHORT, predictor)
        b.add(322, _TY_SHORT, tile)
        b.add(323, _TY_SHORT, tile)
        b.add(324, _TY_LONG, [0] * ntiles)  # patched below
        b.add(325, _TY_LONG, [len(t) for t in level_tiles[li]])
        b.add(339, _TY_SHORT, [sfmt] * nb)
        if li == 0:
            if dx is not None:
                b.add(33550, _TY_DOUBLE, [float(dx), float(abs(dy)), 0.0])
                b.add(33922, _TY_DOUBLE, [0.0, 0.0, 0.0, float(left), float(top), 0.0])
            if epsg is not None:
                b.add(34735, _TY_SHORT, _geokeys(int(epsg)))
            if nodata is not None:
                b.add(42113, _TY_ASCII, repr(float(nodata)))
        ifds.append(b)

    # layout: header | IFD blocks | tile data (smallest overview first = COG)
    def layout(big: bool):
        for b in ifds:
            b.big = big
        cursor = 16 if big else 8
        at = []
        for b in ifds:
            at.append(cursor)
            cursor += b.size()
        t_at: List[List[int]] = [[] for _ in levels]
        for li in range(len(levels) - 1, -1, -1):
            for t in level_tiles[li]:
                t_at[li].append(cursor)
                cursor += len(t) + (len(t) & 1)
        return at, t_at, cursor

    big = bool(bigtiff)
    ifd_at, tile_at, end = layout(big)
    if not big and end > 0xFFFFFFFF:
        if bigtiff is False:
            raise ValueError("classic TIFF is capped at 4 GiB; pass bigtiff=True/None")
        big = True  # auto-upgrade to BigTIFF
        ifd_at, tile_at, end = layout(True)

    off_ty = _TY_LONG8 if big else _TY_LONG
    for li, b in enumerate(ifds):
        for i, (tag, ty, count, values) in enumerate(b.tags):
            if tag == 324:
                b.tags[i] = (tag, off_ty, count, tile_at[li])
            elif tag == 325 and big:
                b.tags[i] = (tag, off_ty, count, values)
    if big:  # type upgrade changes value-area sizes → recompute offsets
        ifd_at, tile_at, end = layout(True)
        for li, b in enumerate(ifds):
            for i, (tag, ty, count, values) in enumerate(b.tags):
                if tag == 324:
                    b.tags[i] = (tag, off_ty, count, tile_at[li])

    if big:
        out = bytearray(b"II+\x00" + struct.pack("<HHQ", 8, 0, ifd_at[0]))
    else:
        out = bytearray(b"II*\x00" + struct.pack("<I", ifd_at[0]))
    for li, b in enumerate(ifds):
        nxt = ifd_at[li + 1] if li + 1 < len(ifds) else 0
        out += b.render(ifd_at[li], nxt)
    for li in range(len(levels) - 1, -1, -1):
        for t in level_tiles[li]:
            out += t + (b"\x00" if len(t) & 1 else b"")
    return bytes(out)


# ----------------------------------------------------------------- reader

def _parse_header(b: bytes) -> Tuple[str, int, bool]:
    """→ (endian char, first IFD offset, is_bigtiff)."""
    if b[:2] == b"II":
        e = "<"
    elif b[:2] == b"MM":
        e = ">"
    else:
        raise ValueError("not a TIFF")
    (version,) = struct.unpack_from(f"{e}H", b, 2)
    if version == 42:
        (at,) = struct.unpack_from(f"{e}I", b, 4)
        return e, at, False
    if version == 43:  # BigTIFF
        osz, zero = struct.unpack_from(f"{e}HH", b, 4)
        if osz != 8 or zero != 0:
            raise ValueError("malformed BigTIFF header")
        (at,) = struct.unpack_from(f"{e}Q", b, 8)
        return e, at, True
    raise ValueError(f"unknown TIFF version {version}")


def _read_ifd(b: bytes, at: int, e: str, big: bool = False) -> Tuple[dict, int]:
    if big:
        (n,) = struct.unpack_from(f"{e}Q", b, at)
        head, esz, inline, ofmt = 8, 20, 8, "Q"
    else:
        (n,) = struct.unpack_from(f"{e}H", b, at)
        head, esz, inline, ofmt = 2, 12, 4, "I"
    tags = {}
    for i in range(n):
        ent = at + head + esz * i
        tag, ty = struct.unpack_from(f"{e}HH", b, ent)
        (count,) = struct.unpack_from(f"{e}{ofmt}", b, ent + 4)
        count = int(count)
        val_at = ent + (12 if big else 8)
        sz = _TYPE_SIZE.get(ty, 1) * count
        voff = val_at
        if sz > inline:
            (voff,) = struct.unpack_from(f"{e}{ofmt}", b, val_at)
            voff = int(voff)
        if ty == _TY_ASCII:
            tags[tag] = b[voff: voff + count].split(b"\x00")[0].decode("latin-1")
        elif ty == _TY_RATIONAL:
            vals = struct.unpack_from(f"{e}{2 * count}I", b, voff)
            tags[tag] = [vals[2 * j] / max(vals[2 * j + 1], 1) for j in range(count)]
        elif ty in _TYPE_FMT:
            tags[tag] = list(struct.unpack_from(f"{e}{count}{_TYPE_FMT[ty]}", b, voff))
        else:
            tags[tag] = None
    (nxt,) = struct.unpack_from(f"{e}{ofmt}", b, at + head + esz * n)
    return tags, int(nxt)


def _scalar(tags: dict, tag: int, default=None):
    v = tags.get(tag, default)
    return v[0] if isinstance(v, list) else v


def _undo_predictor2(t: np.ndarray) -> np.ndarray:
    return np.add.accumulate(t, axis=1, dtype=t.dtype)


def _undo_predictor3(raw: np.ndarray, rows: int, cols: int, nb: int, dtype) -> np.ndarray:
    """Inverse of the TechNote-3 float predictor: per-row byte cumsum, then
    re-interleave the byte planes and byteswap big-endian → native."""
    K = np.dtype(dtype).itemsize
    b = raw.view(np.uint8).reshape(rows, cols * nb * K)
    acc = np.add.accumulate(b, axis=1, dtype=np.uint8)
    planes = acc.reshape(rows, K, cols * nb).transpose(0, 2, 1)
    be = np.ascontiguousarray(planes).reshape(rows, cols * nb, K)
    flat = be.reshape(rows, -1).view(np.dtype(dtype).newbyteorder(">"))
    return flat.astype(np.dtype(dtype).newbyteorder("=")).reshape(rows, cols, nb)


def _decode_level(b: bytes, tags: dict, e: str) -> np.ndarray:
    w, h = int(_scalar(tags, 256)), int(_scalar(tags, 257))
    nb = int(_scalar(tags, 277, 1))
    bits = int(tags.get(258, [8])[0])
    sfmt = int(tags.get(339, [1])[0])
    dtype = _DTYPES_REV[(bits, sfmt)]
    if e == ">":
        dtype = dtype.newbyteorder(">")
    comp = int(_scalar(tags, 259, 1))
    pred = int(_scalar(tags, 317, 1))
    if int(_scalar(tags, 284, 1)) != 1:
        raise ValueError("only PlanarConfiguration=1 supported")
    if comp not in (1, 8, 32946):
        raise ValueError(f"unsupported TIFF compression {comp}")

    def blob_raw(off: int, cnt: int) -> np.ndarray:
        raw = b[off: off + cnt]
        if comp in (8, 32946):
            raw = zlib.decompress(raw)
        return np.frombuffer(raw, dtype=np.uint8)

    def blob(off: int, cnt: int) -> np.ndarray:
        raw = b[off: off + cnt]
        if comp in (8, 32946):
            raw = zlib.decompress(raw)
        return np.frombuffer(raw, dtype=dtype)

    out = np.zeros((h, w, nb), dtype=dtype.newbyteorder("="))
    if 322 in tags:  # tiled
        tw, th = int(_scalar(tags, 322)), int(_scalar(tags, 323))
        td, ta = _tile_grid(h, w, th)[0], _tile_grid(h, w, tw)[1]
        offs, cnts = tags[324], tags[325]
        for i in range(td * ta):
            if pred == 3:
                t = _undo_predictor3(blob_raw(int(offs[i]), int(cnts[i])), th, tw, nb, dtype)
            else:
                t = blob(int(offs[i]), int(cnts[i])).reshape(th, tw, nb)
                if pred == 2:
                    t = _undo_predictor2(t)
            ty, tx = divmod(i, ta)
            y0, x0 = ty * th, tx * tw
            out[y0: y0 + th, x0: x0 + tw] = t[: min(th, h - y0), : min(tw, w - x0)]
    else:  # stripped
        rps = int(_scalar(tags, 278, h))
        offs, cnts = tags[273], tags[279]
        for i in range(len(offs)):
            y0 = i * rps
            rows = min(rps, h - y0)
            if pred == 3:
                s = _undo_predictor3(blob_raw(int(offs[i]), int(cnts[i]))[: rows * w * nb * dtype.itemsize],
                                     rows, w, nb, dtype)
            else:
                s = blob(int(offs[i]), int(cnts[i]))[: rows * w * nb].reshape(rows, w, nb)
                if pred == 2:
                    s = _undo_predictor2(s)
            out[y0: y0 + rows] = s
    return np.moveaxis(out, -1, 0)


def decode_geotiff(b: bytes, level: int = 0) -> Tuple[np.ndarray, dict]:
    """GeoTIFF bytes → ((nb, h, w) array at `level`, metadata dict).

    level 0 is full resolution; levels 1.. are the overview pyramid. The
    metadata dict carries left/top/dx/dy/epsg/nodata (None when absent) and
    the (h, w) of every level.
    """
    e, at, big = _parse_header(b)
    all_tags = []
    while at:
        tags, at = _read_ifd(b, at, e, big)
        all_tags.append(tags)
    meta = {"levels": [(int(_scalar(t, 257)), int(_scalar(t, 256))) for t in all_tags],
            "left": None, "top": None, "dx": None, "dy": None, "epsg": None, "nodata": None}
    t0 = all_tags[0]
    if 33550 in t0 and 33922 in t0:
        # ModelPixelScale stores |dy|; return the north-up geotransform
        # convention (negative dy) so meta slots directly into a GDAL-style
        # (left, dx, 0, top, 0, dy) transform without a sign flip
        meta["dx"], meta["dy"] = float(t0[33550][0]), -abs(float(t0[33550][1]))
        meta["left"], meta["top"] = float(t0[33922][3]), float(t0[33922][4])
    if 34735 in t0:
        kd = t0[34735]
        for j in range(4, len(kd), 4):
            if kd[j] in (2048, 3072) and kd[j + 1] == 0:
                meta["epsg"] = int(kd[j + 3])
    if 42113 in t0:
        meta["nodata"] = float(t0[42113])
    return _decode_level(b, all_tags[level], e), meta


def peek_levels(b: bytes) -> list:
    """Parse ONLY the IFD chain (no tile decode) and return [(h, w), ...]
    per pyramid level — the cheap metadata read a COG range-GET would do.
    For the in-memory codec path this costs microseconds; the point is that
    overview selection never touches pixel data of levels it skips."""
    e, at, big = _parse_header(b)
    out = []
    while at:
        tags, at = _read_ifd(b, at, e, big)
        out.append((int(_scalar(tags, 257)), int(_scalar(tags, 256))))
    return out


def cog_layout_report(b: bytes) -> dict:
    """Structural audit used by tests: are all IFDs before all tile data,
    and is tile data ordered lowest-resolution-first (the COG property)?"""
    e, at, big = _parse_header(b)
    head, esz, inline, ofmt = (8, 20, 8, "Q") if big else (2, 12, 4, "I")
    ifd_ends, level_first_tile = [], []
    while at:
        tags, nxt = _read_ifd(b, at, e, big)
        if big:
            (n,) = struct.unpack_from(f"{e}Q", b, at)
        else:
            (n,) = struct.unpack_from(f"{e}H", b, at)
        n = int(n)
        end = at + head + esz * n + (8 if big else 4)
        for i in range(n):  # extend past every out-of-line value block
            ent = at + head + esz * i
            _tag, ty = struct.unpack_from(f"{e}HH", b, ent)
            (count,) = struct.unpack_from(f"{e}{ofmt}", b, ent + 4)
            sz = _TYPE_SIZE.get(ty, 1) * int(count)
            if sz > inline:
                (voff,) = struct.unpack_from(f"{e}{ofmt}", b, ent + (12 if big else 8))
                end = max(end, int(voff) + sz)
        ifd_ends.append(end)
        level_first_tile.append(int(tags[324][0]) if 324 in tags else None)
        at = nxt
    first_tile = min(v for v in level_first_tile if v is not None)
    return {
        "n_ifds": len(ifd_ends),
        "ifds_before_data": max(ifd_ends) <= first_tile,
        "overview_tiles_first": level_first_tile == sorted(level_first_tile, reverse=True),
        "first_tile_offset": first_tile,
    }
