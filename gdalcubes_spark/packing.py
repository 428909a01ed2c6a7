"""Typed export packing — the reference's packed_export (cube.h:52-96) and
ncdf auto_unpack, re-expressed for the chunk-table sink.

value → packed:   p = round((v - offset) / scale), NaN → nodata, clipped to
                  the dtype's value range (nodata value excluded from it)
packed → value:   v = p * scale + offset, p == nodata → NaN

At 100 TB this is the difference between shipping 8 bytes and 1-4 bytes per
cell: a uint8-packed reflectance cube is 8× smaller on the wire and on disk
than the raw float64 tensors, and parquet's byte-level encodings compress the
small integer payloads far better than float64 mantissas.
"""

from __future__ import annotations

import json
from dataclasses import dataclass

import numpy as np

_DTYPES = {
    "uint8": np.uint8, "uint16": np.uint16, "int16": np.int16,
    "int32": np.int32, "float32": np.float32,
}

# default nodata mirrors the reference's choice: the extreme value of the type
_DEFAULT_NODATA = {
    "uint8": 255.0, "uint16": 65535.0, "int16": -32768.0,
    "int32": -2147483648.0, "float32": float("nan"),
}


@dataclass(frozen=True)
class Packing:
    """type + scale/offset/nodata (cube.h packed_export)."""

    type: str = "none"
    scale: float = 1.0
    offset: float = 0.0
    nodata: float = None  # type: ignore[assignment]

    def __post_init__(self):
        if self.type != "none" and self.type not in _DTYPES:
            raise ValueError(f"unknown packing type {self.type!r}; have {sorted(_DTYPES)} or 'none'")
        if self.nodata is None and self.type != "none":
            object.__setattr__(self, "nodata", _DEFAULT_NODATA[self.type])

    @property
    def dtype(self):
        return _DTYPES[self.type]

    @property
    def itemsize(self) -> int:
        return np.dtype(_DTYPES[self.type]).itemsize if self.type != "none" else 8

    def to_json(self) -> str:
        return json.dumps(dict(type=self.type, scale=self.scale, offset=self.offset,
                               nodata=None if self.nodata is None or np.isnan(self.nodata)
                               else self.nodata))

    @staticmethod
    def from_json(s: str) -> "Packing":
        d = json.loads(s)
        nod = d.get("nodata")
        return Packing(type=d["type"], scale=d["scale"], offset=d["offset"],
                       nodata=float("nan") if nod is None and d["type"] == "float32"
                       else (float(nod) if nod is not None else None))

    # ------------------------------------------------------------- transforms
    def pack(self, v: np.ndarray) -> bytes:
        """float64 tensor → little-endian packed bytes."""
        if self.type == "none":
            return np.ascontiguousarray(v, dtype="<f8").tobytes()
        dt = np.dtype(self.dtype).newbyteorder("<")
        if self.type == "float32":
            return np.ascontiguousarray((v - self.offset) / self.scale, dtype=dt).tobytes()
        info = np.iinfo(self.dtype)
        lo, hi = float(info.min), float(info.max)
        # keep the nodata code out of the value range
        if self.nodata == hi:
            hi -= 1
        elif self.nodata == lo:
            lo += 1
        with np.errstate(invalid="ignore"):
            p = np.rint((v - self.offset) / self.scale)
            p = np.clip(p, lo, hi)
        p = np.where(np.isnan(v), self.nodata, p)
        return np.ascontiguousarray(p, dtype=dt).tobytes()

    def unpack(self, b: bytes, shape) -> np.ndarray:
        """packed bytes → float64 tensor with NaN nodata."""
        if self.type == "none":
            return np.frombuffer(b, dtype="<f8").reshape(shape)
        dt = np.dtype(self.dtype).newbyteorder("<")
        p = np.frombuffer(b, dtype=dt).reshape(shape).astype("float64")
        v = p * self.scale + self.offset
        if self.type == "float32" or (self.nodata is not None and np.isnan(self.nodata)):
            return np.where(np.isnan(p), np.nan, v)
        return np.where(p == self.nodata, np.nan, v)
