"""Grid kernel: datetime/duration arithmetic, cube_view axis snapping, chunk math.

Pure Python/numpy — no Spark dependency. This is the bit-exact core the whole
engine builds on: tile/cell assignment must match the reference semantics
(gdalcubes: src/gdalcubes/src/view.cpp:187-422, datetime.h:49-366,
cube.h:463-512, cube.cpp:139-285). Implemented from observed behavior, not
translated code; golden-tested against inst/tinytest/test_cube_view.R values.
"""

from __future__ import annotations

import calendar
import datetime as _dt
import json
import math
from dataclasses import dataclass, field, replace
from enum import IntEnum
from typing import Optional, Tuple


class Unit(IntEnum):
    """Datetime granularity, ordered fine→coarse (matches reference ordering)."""

    SECOND = 0
    MINUTE = 1
    HOUR = 2
    DAY = 3
    WEEK = 4
    MONTH = 5
    YEAR = 6
    NONE = 255


_UNIT_SUFFIX_DATE = {"Y": Unit.YEAR, "M": Unit.MONTH, "W": Unit.WEEK, "D": Unit.DAY}
_UNIT_SUFFIX_TIME = {"H": Unit.HOUR, "M": Unit.MINUTE, "S": Unit.SECOND}


@dataclass(frozen=True)
class Duration:
    """Single-unit ISO8601-like duration (P1M, P16D, PT1H); integer arithmetic
    per unit. Mixed-unit division is an error (datetime.h:90-99)."""

    n: int
    unit: Unit

    @staticmethod
    def parse(s: str) -> "Duration":
        s = s.strip().upper()
        if not s.startswith("P"):
            raise ValueError(f"cannot parse duration {s!r}")
        i = 1
        is_time = False
        if i < len(s) and s[i] == "T":
            is_time = True
            i += 1
        j = i
        while j < len(s) and s[j].isdigit():
            j += 1
        if j == i or j >= len(s):
            raise ValueError(f"cannot parse duration {s!r}")
        n = int(s[i:j])
        suffix = s[j]
        table = _UNIT_SUFFIX_TIME if is_time else _UNIT_SUFFIX_DATE
        if suffix not in table:
            raise ValueError(f"invalid duration unit in {s!r}")
        return Duration(n, table[suffix])

    def __str__(self) -> str:
        if self.unit in (Unit.HOUR, Unit.MINUTE, Unit.SECOND):
            c = {Unit.HOUR: "H", Unit.MINUTE: "M", Unit.SECOND: "S"}[self.unit]
            return f"PT{self.n}{c}"
        c = {Unit.YEAR: "Y", Unit.MONTH: "M", Unit.WEEK: "W", Unit.DAY: "D"}[self.unit]
        return f"P{self.n}{c}"

    def __mul__(self, k: int) -> "Duration":
        return Duration(self.n * k, self.unit)

    def __add__(self, k: int) -> "Duration":
        return Duration(self.n + k, self.unit)

    def __floordiv__(self, other: "Duration") -> int:
        if self.unit != other.unit:
            raise ValueError("incompatible duration units")
        return int(self.n / other.n) if (self.n < 0) != (other.n < 0) else self.n // other.n

    def __mod__(self, other: "Duration") -> int:
        if self.unit != other.unit:
            raise ValueError("incompatible duration units")
        # C++ % semantics (truncation toward zero)
        return int(math.fmod(self.n, other.n))


def _last_dom(y: int, m: int) -> int:
    return calendar.monthrange(y, m)[1]


@dataclass(frozen=True)
class Datetime:
    """Datetime with a granularity unit, seconds precision.

    Unit is inferred from string digit count exactly like the reference
    parser (datetime.cpp:276-339): YYYY→year, YYYYMM→month, YYYYMMDD→day,
    +HH→hour, +MM→minute, +SS→second. Separators/timezones skipped.
    """

    p: _dt.datetime  # naive, second resolution
    unit: Unit = Unit.DAY

    @staticmethod
    def parse(s: str) -> "Datetime":
        digits = [c for c in s if c.isdigit()]
        nd = len(digits)

        def take(i, k):
            return int("".join(digits[i : i + k]))

        if nd >= 14:
            return Datetime(
                _dt.datetime(take(0, 4), take(4, 2), take(6, 2), take(8, 2), take(10, 2), take(12, 2)),
                Unit.SECOND,
            )
        if nd >= 12:
            return Datetime(
                _dt.datetime(take(0, 4), take(4, 2), take(6, 2), take(8, 2), take(10, 2)), Unit.MINUTE
            )
        if nd >= 10:
            return Datetime(_dt.datetime(take(0, 4), take(4, 2), take(6, 2), take(8, 2)), Unit.HOUR)
        if nd >= 8:
            return Datetime(_dt.datetime(take(0, 4), take(4, 2), take(6, 2)), Unit.DAY)
        if nd >= 6:
            return Datetime(_dt.datetime(take(0, 4), take(4, 2), 1), Unit.MONTH)
        if nd >= 4:
            return Datetime(_dt.datetime(take(0, 4), 1, 1), Unit.YEAR)
        raise ValueError(f"cannot parse datetime {s!r}")

    # -- accessors ---------------------------------------------------------
    @property
    def year(self) -> int:
        return self.p.year

    @property
    def month(self) -> int:
        return self.p.month

    @property
    def day(self) -> int:
        return self.p.day

    def with_unit(self, u: Unit) -> "Datetime":
        """Truncate finer components per the unit (datetime.h unit setter)."""
        p = self.p
        if u == Unit.YEAR:
            p = _dt.datetime(p.year, 1, 1)
        elif u == Unit.MONTH:
            p = _dt.datetime(p.year, p.month, 1)
        elif u in (Unit.DAY, Unit.WEEK):
            p = _dt.datetime(p.year, p.month, p.day)
        elif u == Unit.HOUR:
            p = _dt.datetime(p.year, p.month, p.day, p.hour)
        elif u == Unit.MINUTE:
            p = _dt.datetime(p.year, p.month, p.day, p.hour, p.minute)
        return Datetime(p, u)

    # -- arithmetic --------------------------------------------------------
    def __sub__(self, other: "Datetime") -> Duration:
        u = Unit(max(self.unit, other.unit))
        a, b = self.p, other.p
        if u == Unit.SECOND:
            n = int((a - b).total_seconds())
        elif u == Unit.MINUTE:
            n = int((a - b).total_seconds()) // 60 if a >= b else -(int((b - a).total_seconds()) // 60)
        elif u == Unit.HOUR:
            n = int((a - b).total_seconds()) // 3600 if a >= b else -(int((b - a).total_seconds()) // 3600)
        elif u in (Unit.DAY, Unit.WEEK):
            n = (a.date() - b.date()).days
            if u == Unit.WEEK:
                n = int(n / 7) if n < 0 else n // 7
        elif u == Unit.MONTH:
            n = (a.year * 12 + a.month) - (b.year * 12 + b.month)
        elif u == Unit.YEAR:
            n = a.year - b.year
        else:
            n = 0
        return Duration(n, u)

    def add(self, d: Duration) -> "Datetime":
        p = self.p
        if d.unit == Unit.SECOND:
            p = p + _dt.timedelta(seconds=d.n)
        elif d.unit == Unit.MINUTE:
            p = p + _dt.timedelta(minutes=d.n)
        elif d.unit == Unit.HOUR:
            p = p + _dt.timedelta(hours=d.n)
        elif d.unit == Unit.DAY:
            p = p + _dt.timedelta(days=d.n)
        elif d.unit == Unit.WEEK:
            p = p + _dt.timedelta(days=7 * d.n)
        elif d.unit == Unit.MONTH:
            tm = p.year * 12 + (p.month - 1) + d.n
            y, m = tm // 12, tm % 12 + 1
            day = min(p.day, _last_dom(y, m))
            p = p.replace(year=y, month=m, day=day)
        elif d.unit == Unit.YEAR:
            y = p.year + d.n
            day = min(p.day, _last_dom(y, p.month))
            p = p.replace(year=y, day=day)
        return Datetime(p, d.unit)

    def to_string(self) -> str:
        if self.unit in (Unit.SECOND, Unit.MINUTE, Unit.HOUR, Unit.NONE):
            return self.p.strftime("%Y-%m-%dT%H:%M:%S")
        return self.p.strftime("%Y-%m-%d")

    def to_double(self) -> float:
        """Numeric datetime like 20180401123059 (datetime.h:143-148)."""
        p = self.p
        return float(
            p.second
            + p.minute * 100
            + p.hour * 10000
            + p.day * 1000000
            + p.month * 100000000
            + p.year * 10000000000
        )

    def epoch(self) -> int:
        return int(self.p.replace(tzinfo=_dt.timezone.utc).timestamp())


def _snap_t_bounds(t0: Datetime, t1: Datetime, u: Unit) -> Tuple[Datetime, Datetime]:
    """Snap t0 down / t1 up to calendar boundaries of unit u (view.cpp:306-360)."""
    p0, p1 = t0.p, t1.p
    if u == Unit.YEAR:
        p0 = _dt.datetime(p0.year, 1, 1)
        p1 = _dt.datetime(p1.year, 12, 31, 23, 59, 59)
    elif u == Unit.MONTH:
        p0 = _dt.datetime(p0.year, p0.month, 1)
        p1 = _dt.datetime(p1.year, p1.month, _last_dom(p1.year, p1.month), 23, 59, 59)
    elif u == Unit.DAY:
        p0 = _dt.datetime(p0.year, p0.month, p0.day)
        p1 = _dt.datetime(p1.year, p1.month, p1.day, 23, 59, 59)
    elif u == Unit.HOUR:
        p0 = _dt.datetime(p0.year, p0.month, p0.day, p0.hour)
        p1 = _dt.datetime(p1.year, p1.month, p1.day, p1.hour, 59, 59)
    elif u == Unit.MINUTE:
        p0 = _dt.datetime(p0.year, p0.month, p0.day, p0.hour, p0.minute)
        p1 = _dt.datetime(p1.year, p1.month, p1.day, p1.hour, p1.minute, 59)
    # WEEK / SECOND: no calendar snapping beyond what already happened
    return Datetime(p0, u), Datetime(p1, u)


AGG_METHODS = (
    "none", "min", "max", "mean", "median", "first", "last", "count_images", "count_values", "sum",
)
# full gdalwarp algorithm set of the reference (view.h:66-79)
RESAMPLING_METHODS = ("near", "nearest", "bilinear", "cubic", "cubicspline", "lanczos",
                      "average", "mode", "min", "max", "med", "q1", "q3")


@dataclass
class CubeView:
    """cube_view: spatial window + SRS + regular time axis + per-read
    aggregation/resampling (view.h:286-332). Axis setters replicate the
    snapping semantics of view.cpp:187-392.
    """

    srs: str = "EPSG:4326"
    left: float = 0.0
    right: float = 1.0
    bottom: float = 0.0
    top: float = 1.0
    nx: int = 1
    ny: int = 1
    t0: Datetime = field(default_factory=lambda: Datetime.parse("2000-01-01"))
    t1: Datetime = field(default_factory=lambda: Datetime.parse("2000-01-01"))
    dt: Duration = field(default_factory=lambda: Duration(1, Unit.DAY))
    aggregation: str = "first"
    resampling: str = "near"
    # labeled (irregular) time axis, mirrors cube_stref_labeled_time
    # (view.h:334-404): when set, nt == len(labels) and index lookups go
    # through the label list instead of regular dt arithmetic.
    labels: Optional[tuple] = None

    # ------------------------------------------------------------------ ctor
    @staticmethod
    def create(
        srs: str,
        left: float,
        right: float,
        bottom: float,
        top: float,
        t0: str,
        t1: str,
        dt: Optional[str] = None,
        dx: Optional[float] = None,
        dy: Optional[float] = None,
        nx: Optional[int] = None,
        ny: Optional[int] = None,
        nt: Optional[int] = None,
        aggregation: str = "first",
        resampling: str = "near",
    ) -> "CubeView":
        v = CubeView(srs=srs, aggregation=aggregation, resampling=resampling)
        if dx is not None:
            v.set_x_axis(left, right, delta=dx)
        elif nx is not None:
            v.set_x_axis(left, right, n=nx)
        else:
            raise ValueError("need dx or nx")
        if dy is not None:
            v.set_y_axis(bottom, top, delta=dy)
        elif ny is not None:
            v.set_y_axis(bottom, top, n=ny)
        else:
            raise ValueError("need dy or ny")
        d0, d1 = Datetime.parse(t0), Datetime.parse(t1)
        if dt is not None:
            v.set_t_axis(d0, d1, delta=Duration.parse(dt))
        elif nt is not None:
            v.set_t_axis_n(d0, d1, nt)
        else:
            raise ValueError("need dt or nt")
        if aggregation not in AGG_METHODS:
            raise ValueError(f"unknown aggregation {aggregation!r}")
        if resampling not in RESAMPLING_METHODS:
            raise ValueError(f"unknown resampling {resampling!r}")
        return v

    # ----------------------------------------------------------- axis setters
    def set_x_axis(self, vmin: float, vmax: float, delta: Optional[float] = None, n: Optional[int] = None):
        if delta is not None:
            self.nx = int(math.ceil((vmax - vmin) / delta))
            exp = self.nx * delta - (vmax - vmin)
            self.left = vmin - exp / 2
            self.right = vmax + exp / 2
        else:
            self.left, self.right, self.nx = vmin, vmax, int(n)

    def set_y_axis(self, vmin: float, vmax: float, delta: Optional[float] = None, n: Optional[int] = None):
        if delta is not None:
            self.ny = int(math.ceil((vmax - vmin) / delta))
            exp = self.ny * delta - (vmax - vmin)
            self.bottom = vmin - exp / 2
            self.top = vmax + exp / 2
        else:
            self.bottom, self.top, self.ny = vmin, vmax, int(n)

    def set_t_axis(self, tmin: Datetime, tmax: Datetime, delta: Duration):
        if tmin.unit != tmax.unit:
            coarse = Unit(max(tmin.unit, tmax.unit))
            tmin, tmax = tmin.with_unit(coarse), tmax.with_unit(coarse)
        tu, u = tmin.unit, delta.unit
        if tu > u:
            # t0/t1 coarser than dt: expand to period boundaries (view.cpp:259-287)
            p = tmin.p
            p0 = _dt.datetime(
                p.year,
                p.month if tu <= Unit.MONTH else 1,
                p.day if tu <= Unit.DAY else 1,
                p.hour if tu <= Unit.HOUR else 0,
                p.minute if tu <= Unit.MINUTE else 0,
                p.second if tu <= Unit.SECOND else 0,
            )
            q = tmax.p
            if tu > Unit.DAY:
                m = q.month if tu <= Unit.MONTH else 12
                p1 = _dt.datetime(q.year, m, _last_dom(q.year, m), 23, 59, 59)
            else:
                p1 = _dt.datetime(
                    q.year, q.month, q.day,
                    q.hour if tu <= Unit.HOUR else 23,
                    q.minute if tu <= Unit.MINUTE else 59,
                    q.second if tu <= Unit.SECOND else 59,
                )
            t0n, t1n = Datetime(p0, u), Datetime(p1, u)
        else:
            t0n, t1n = tmin.with_unit(u), tmax.with_unit(u)
        dtotal = (t1n - t0n) + 1
        if dtotal % delta != 0:
            # extend t1 to t0 + dt*floor(total/dt) + (dt-1)  (view.cpp:296-303)
            t1n = t0n.add(delta * (dtotal // delta)).add(Duration(delta.n - 1, u))
        self.dt = delta
        self.t0, self.t1 = _snap_t_bounds(t0n, t1n, u)

    def set_t_axis_n(self, tmin: Datetime, tmax: Datetime, n: int):
        if tmin.unit != tmax.unit:
            coarse = Unit(max(tmin.unit, tmax.unit))
            tmin, tmax = tmin.with_unit(coarse), tmax.with_unit(coarse)
        self.t0, self.t1 = tmin, tmax
        d = (tmax - tmin) + 1
        dn = Duration(int(math.ceil(d.n / n)), d.unit)
        self.dt = dn
        if d.n % n != 0:
            self.t1 = self.t0.add(dn * (n - 1))

    # -------------------------------------------------------------- derived
    @property
    def dx(self) -> float:
        return (self.right - self.left) / self.nx

    @property
    def dy(self) -> float:
        return (self.top - self.bottom) / self.ny

    @property
    def nt(self) -> int:
        if self.labels is not None:
            return len(self.labels)
        if (self.t1 - self.t0).n == 0:
            return 1
        d = (self.t1 - self.t0) + 1
        return d // self.dt if d % self.dt == 0 else 1 + d // self.dt

    def datetime_at_index(self, it: int) -> Datetime:
        if self.labels is not None:
            return self.labels[int(it)]
        return self.t0.add(self.dt * int(it))

    def index_at_datetime(self, t: Datetime) -> int:
        if self.labels is not None:
            for i, lbl in enumerate(self.labels):
                if (lbl - t).n == 0:
                    return i
            raise ValueError(f"datetime {t.to_string()} not in labeled axis")
        return (t - self.t0) // self.dt

    def cell_coords(self, x: float, y: float, t: Datetime) -> Tuple[int, int, int]:
        """(it, iy, ix); y counts downward from top (view.cpp:416-422)."""
        ix = int((x - self.left) / self.dx)
        iy = int((self.top - y) / self.dy)
        it = self.index_at_datetime(t)
        return it, iy, ix

    def map_coords(self, it: int, iy: int, ix: int) -> Tuple[float, float, Datetime]:
        return (self.left + ix * self.dx, self.top - iy * self.dy, self.datetime_at_index(it))

    def time_labels(self):
        """List of per-slice datetimes (length nt)."""
        return [self.datetime_at_index(i) for i in range(self.nt)]

    def time_epochs(self):
        """Per-slice [start, end) epoch seconds; end = start of next slice.

        Labeled axes have no index nt, so the final slice end is the last
        label advanced by the view's dt (a label is a point; its slice gets
        one dt of width — mirrors cube_stref_labeled_time semantics).
        """
        if self.labels is not None:
            out = [l.epoch() for l in self.labels]
            out.append(self.labels[-1].add(self.dt).epoch())
            return out
        out = []
        for i in range(self.nt + 1):
            out.append(self.datetime_at_index(i).epoch())
        return out

    # ------------------------------------------------------------- serialize
    def to_json(self) -> str:
        d = dict(
            srs=self.srs, left=self.left, right=self.right, bottom=self.bottom, top=self.top,
            nx=self.nx, ny=self.ny, t0=self.t0.to_string(), t1=self.t1.to_string(),
            t0_unit=int(self.t0.unit), t1_unit=int(self.t1.unit), dt=str(self.dt),
            aggregation=self.aggregation, resampling=self.resampling,
        )
        if self.labels is not None:
            d["labels"] = [l.to_string() for l in self.labels]
            d["labels_unit"] = int(self.labels[0].unit)
        return json.dumps(d)

    @staticmethod
    def from_json(s: str) -> "CubeView":
        d = json.loads(s)
        labels = None
        if d.get("labels"):
            u = Unit(d["labels_unit"])
            labels = tuple(Datetime.parse(x).with_unit(u) for x in d["labels"])
        v = CubeView(
            srs=d["srs"], left=d["left"], right=d["right"], bottom=d["bottom"], top=d["top"],
            nx=d["nx"], ny=d["ny"],
            t0=Datetime.parse(d["t0"]).with_unit(Unit(d["t0_unit"])),
            t1=Datetime.parse(d["t1"]).with_unit(Unit(d["t1_unit"])),
            dt=Duration.parse(d["dt"]),
            aggregation=d["aggregation"], resampling=d["resampling"],
            labels=labels,
        )
        return v

    def copy(self, **kw) -> "CubeView":
        return replace(self, **kw)


@dataclass(frozen=True)
class ChunkGrid:
    """Chunking of a cube: (ct, cy, cx) cells per chunk; id linearization
    id = ct*(ncy*ncx) + cy*ncx + cx (cube.h:495-497); boundary chunks clamp.
    """

    nt: int
    ny: int
    nx: int
    ct: int = 1
    cy: int = 256
    cx: int = 256

    @property
    def nct(self) -> int:
        return (self.nt + self.ct - 1) // self.ct

    @property
    def ncy(self) -> int:
        return (self.ny + self.cy - 1) // self.cy

    @property
    def ncx(self) -> int:
        return (self.nx + self.cx - 1) // self.cx

    @property
    def n_chunks(self) -> int:
        return self.nct * self.ncy * self.ncx

    def chunk_id(self, ict: int, icy: int, icx: int) -> int:
        return ict * (self.ncy * self.ncx) + icy * self.ncx + icx

    def chunk_coords(self, cid: int) -> Tuple[int, int, int]:
        per_t = self.ncy * self.ncx
        ict = cid // per_t
        r = cid % per_t
        return ict, r // self.ncx, r % self.ncx

    def chunk_cell_range(self, ict: int, icy: int, icx: int):
        """((t0,t1),(y0,y1),(x0,x1)) half-open cell index ranges, clamped."""
        t0, y0, x0 = ict * self.ct, icy * self.cy, icx * self.cx
        return (
            (t0, min(t0 + self.ct, self.nt)),
            (y0, min(y0 + self.cy, self.ny)),
            (x0, min(x0 + self.cx, self.nx)),
        )

    def chunk_shape(self, ict: int, icy: int, icx: int) -> Tuple[int, int, int]:
        (a, b), (c, d), (e, f) = self.chunk_cell_range(ict, icy, icx)
        return (b - a, d - c, f - e)

    def find_chunk_containing(self, it: int, iy: int, ix: int) -> int:
        return self.chunk_id(it // self.ct, iy // self.cy, ix // self.cx)


def default_chunking(view: CubeView, parallelism: int = 32) -> ChunkGrid:
    """Adaptive default chunking mirroring R/config.R:224-240: ct=1, cy=cx
    sized so space splits into ~2× parallelism chunks, multiples of 64,
    clamped to [64, 1024]. On a real cluster parallelism = executors*cores;
    this is exactly Spark's 'partitions ≈ 2-3× total cores' guidance.
    """
    npix = view.nx * view.ny
    c = math.sqrt(npix / (2.0 * parallelism))
    c = max(64, min(1024, int(round(c / 64.0)) * 64 if c >= 64 else 64))
    return ChunkGrid(nt=view.nt, ny=view.ny, nx=view.nx, ct=1, cy=c, cx=c)
