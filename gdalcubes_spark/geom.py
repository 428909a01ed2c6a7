"""Vector geometry kernel: WKT polygons, vectorized point-in-polygon,
rectangle predicates. Pure numpy — used inside Arrow UDFs (never per-row
Python over cells).

PIP is the classic even-odd ray-casting test evaluated for all query points
against all rings at once (numpy broadcast). Holes work naturally: a point
inside the shell and inside a hole crosses an even number of edges.
"""

from __future__ import annotations

import re
from typing import List, Tuple

import numpy as np

Ring = np.ndarray  # (k, 2) closed or open ring


class Geometry:
    """A (multi)polygon: list of rings (shells and holes together — even-odd
    semantics make the distinction irrelevant for PIP)."""

    def __init__(self, rings: List[Ring]):
        self.rings = [np.asarray(r, dtype="float64") for r in rings]
        allpts = np.concatenate(self.rings, axis=0)
        self.bbox = (allpts[:, 0].min(), allpts[:, 1].min(), allpts[:, 0].max(), allpts[:, 1].max())
        # flattened edge arrays for vectorized PIP
        x1s, y1s, x2s, y2s = [], [], [], []
        for r in self.rings:
            a = r
            b = np.roll(r, -1, axis=0)
            x1s.append(a[:, 0]); y1s.append(a[:, 1]); x2s.append(b[:, 0]); y2s.append(b[:, 1])
        self._x1 = np.concatenate(x1s); self._y1 = np.concatenate(y1s)
        self._x2 = np.concatenate(x2s); self._y2 = np.concatenate(y2s)

    def contains(self, px: np.ndarray, py: np.ndarray) -> np.ndarray:
        """Even-odd PIP for flat point arrays; returns bool array."""
        px = np.asarray(px, dtype="float64").ravel()
        py = np.asarray(py, dtype="float64").ravel()
        x1, y1, x2, y2 = self._x1, self._y1, self._x2, self._y2
        # edges crossing the horizontal ray to +inf from each point
        # chunked over edges to bound memory: (npts, nedges) mask
        inside = np.zeros(px.shape[0], dtype=bool)
        step = max(1, int(4e6 // max(len(x1), 1)))
        for s in range(0, px.shape[0], step):
            X = px[s : s + step, None]
            Y = py[s : s + step, None]
            cond = ((y1[None, :] > Y) != (y2[None, :] > Y))
            with np.errstate(divide="ignore", invalid="ignore"):
                xint = x1[None, :] + (Y - y1[None, :]) * (x2[None, :] - x1[None, :]) / (y2[None, :] - y1[None, :])
            crossings = np.sum(cond & (X < xint), axis=1)
            inside[s : s + step] = (crossings % 2) == 1
        return inside

    def disjoint_bbox(self, left, bottom, right, top) -> bool:
        bl, bb, br, bt = self.bbox
        return br < left or bl > right or bt < bottom or bb > top

    def contains_rect(self, left, bottom, right, top) -> bool:
        """True if the rectangle is entirely inside the polygon (conservative,
        exact): all 4 corners inside AND no edge intersects the rectangle."""
        cx = np.array([left, right, left, right])
        cy = np.array([bottom, bottom, top, top])
        if not self.contains(cx, cy).all():
            return False
        # any polygon edge intersecting the rectangle?
        x1, y1, x2, y2 = self._x1, self._y1, self._x2, self._y2
        # quick reject: edge bbox vs rect
        exl = np.minimum(x1, x2); exr = np.maximum(x1, x2)
        eyb = np.minimum(y1, y2); eyt = np.maximum(y1, y2)
        cand = ~((exr < left) | (exl > right) | (eyt < bottom) | (eyb > top))
        if not cand.any():
            return True
        # exact segment-rectangle intersection for candidates
        for i in np.nonzero(cand)[0]:
            if _seg_intersects_rect(x1[i], y1[i], x2[i], y2[i], left, bottom, right, top):
                return False
        return True


def _seg_intersects_rect(x1, y1, x2, y2, left, bottom, right, top) -> bool:
    # Liang-Barsky clip test
    dx, dy = x2 - x1, y2 - y1
    p = [-dx, dx, -dy, dy]
    q = [x1 - left, right - x1, y1 - bottom, top - y1]
    u1, u2 = 0.0, 1.0
    for pi, qi in zip(p, q):
        if pi == 0:
            if qi < 0:
                return False
            continue
        t = qi / pi
        if pi < 0:
            u1 = max(u1, t)
        else:
            u2 = min(u2, t)
        if u1 > u2:
            return False
    return True


_NUM = r"[-+0-9.eE]+"


def parse_wkt(wkt: str) -> Geometry:
    """Minimal WKT parser: POLYGON ((...)) and MULTIPOLYGON (((...)))."""
    s = wkt.strip()
    u = s.upper()
    if u.startswith("MULTIPOLYGON"):
        body = s[s.index("(") :]
        rings = []
        # polygons separated at top level; rings inside each
        for poly in _split_level(body[1:-1]):
            for ring in _split_level(poly.strip()[1:-1]):
                rings.append(_parse_ring(ring))
        return Geometry(rings)
    if u.startswith("POLYGON"):
        body = s[s.index("(") :]
        rings = [_parse_ring(r) for r in _split_level(body[1:-1])]
        return Geometry(rings)
    raise ValueError(f"unsupported WKT {wkt[:40]!r}")


def _split_level(s: str) -> List[str]:
    """Split a parenthesized list at depth 0 commas."""
    out, depth, start = [], 0, 0
    for i, c in enumerate(s):
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == "," and depth == 0:
            out.append(s[start:i])
            start = i + 1
    out.append(s[start:])
    return [x.strip() for x in out if x.strip()]


def _parse_ring(s: str) -> Ring:
    s = s.strip()
    if s.startswith("("):
        s = s[1:-1]
    pts = []
    for pair in s.split(","):
        xy = re.findall(_NUM, pair)
        pts.append((float(xy[0]), float(xy[1])))
    return np.array(pts, dtype="float64")


def rect_wkt(left, bottom, right, top) -> str:
    return (f"POLYGON (({left} {bottom}, {right} {bottom}, {right} {top}, "
            f"{left} {top}, {left} {bottom}))")
