"""ISO-BMFF (MP4/MOV) container demux — box walker, track metadata,
sample tables, keyframe index.  Pure parsing from the public ISO/IEC
14496-12 box structure: NO codec decode (h264/h265 frame decode is the
documented external-library seam in multimodal.sample_frames).

Why this is the right boundary at 100 TB: a distributed frame-extraction
job plans its work from exactly these tables — which byte ranges are
keyframes, at what timestamps, in which tracks — and that planning is a
few KB of moov bytes per file.  The expensive part (decode) then reads
only the sampled ranges.  video_keyframe_index exposes that plan as a
DataFrame.

Also covers AVIF/HEIF probing (avif is ISO-BMFF: ftyp brand + meta/ispe),
so still-AVIF inventories can at least be triaged without libavif.
"""
from __future__ import annotations

import struct

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts",
               b"mvex", b"moof", b"traf", b"udta", b"meta", b"iprp",
               b"ipco"}


def walk_boxes(b: bytes, start: int = 0, end: int | None = None):
    """Yield (fourcc, payload_start, payload_end) for each box in
    [start, end).  Handles 64-bit largesize and size-0 (to end)."""
    pos = start
    end = len(b) if end is None else end
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", b[pos:pos + 4])
        typ = b[pos + 4:pos + 8]
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("truncated largesize box")
            (size,) = struct.unpack(">Q", b[pos + 8:pos + 16])
            hdr = 16
        elif size == 0:
            size = end - pos
        if size < hdr:
            raise ValueError(f"corrupt box {typ!r} (size {size})")
        yield typ, pos + hdr, min(pos + size, end)
        pos += size


def _find(b, start, end, path):
    """First box at nested path (e.g. [b'moov', b'mvhd'])."""
    for typ, s, e in walk_boxes(b, start, end):
        if typ == path[0]:
            if len(path) == 1:
                return s, e
            # 'meta' is a FullBox: 4 bytes version/flags before children
            return _find(b, s + (4 if typ == b"meta" else 0), e, path[1:])
    return None


def _full(b, s):
    """(version, flags) of a FullBox payload."""
    return b[s], int.from_bytes(b[s + 1:s + 4], "big")


def parse_mp4(b: bytes) -> dict:
    """→ {brand, timescale, duration_s, tracks: [track dicts]}.

    Each track: {track_id, handler, codec, width, height, timescale,
    duration_s, n_samples, n_keyframes, sample_table-ready raw tables}."""
    ftyp = _find(b, 0, len(b), [b"ftyp"])
    brand = b[ftyp[0]:ftyp[0] + 4].decode("latin1") if ftyp else "????"
    moov = _find(b, 0, len(b), [b"moov"])
    if moov is None:
        raise ValueError("no moov box (not a finalized MP4)")
    out = dict(brand=brand, timescale=0, duration_s=0.0, tracks=[])
    mvhd = _find(b, moov[0], moov[1], [b"mvhd"])
    if mvhd:
        v, _ = _full(b, mvhd[0])
        if v == 1:
            ts, dur = struct.unpack(">IQ", b[mvhd[0] + 20:mvhd[0] + 32])
        else:
            ts, dur = struct.unpack(">II", b[mvhd[0] + 12:mvhd[0] + 20])
        out["timescale"] = ts
        out["duration_s"] = dur / ts if ts else 0.0
    for typ, s, e in walk_boxes(b, moov[0], moov[1]):
        if typ == b"trak":
            out["tracks"].append(_parse_trak(b, s, e))
    return out


def _parse_trak(b: bytes, s: int, e: int) -> dict:
    t: dict = dict(track_id=0, handler="", codec="", width=0, height=0,
                   timescale=0, duration_s=0.0, n_samples=0,
                   n_keyframes=0)
    tkhd = _find(b, s, e, [b"tkhd"])
    if tkhd:
        v, _ = _full(b, tkhd[0])
        off = tkhd[0] + (12 if v == 0 else 20)
        (t["track_id"],) = struct.unpack(">I", b[off:off + 4])
        wh = tkhd[1] - 8
        w, h = struct.unpack(">II", b[wh:wh + 8])
        t["width"], t["height"] = w >> 16, h >> 16  # 16.16 fixed
    mdhd = _find(b, s, e, [b"mdia", b"mdhd"])
    if mdhd:
        v, _ = _full(b, mdhd[0])
        if v == 1:
            ts, dur = struct.unpack(">IQ", b[mdhd[0] + 20:mdhd[0] + 32])
        else:
            ts, dur = struct.unpack(">II", b[mdhd[0] + 12:mdhd[0] + 20])
        t["timescale"] = ts
        t["duration_s"] = dur / ts if ts else 0.0
    hdlr = _find(b, s, e, [b"mdia", b"hdlr"])
    if hdlr:
        t["handler"] = b[hdlr[0] + 8:hdlr[0] + 12].decode("latin1")
    stbl = _find(b, s, e, [b"mdia", b"minf", b"stbl"])
    if stbl is None:
        return t
    stsd = _find(b, stbl[0], stbl[1], [b"stsd"])
    if stsd:
        for typ2, s2, e2 in walk_boxes(b, stsd[0] + 8, stsd[1]):
            t["codec"] = typ2.decode("latin1")
            if t["handler"] == "vide" and e2 - s2 >= 78:
                # VisualSampleEntry: 6+2 reserved/idx, 16 predefined,
                # then width/height uint16
                t["width"], t["height"] = struct.unpack(
                    ">HH", b[s2 + 24:s2 + 28])
            break
    for name in (b"stts", b"stss", b"stsz", b"stsc", b"stco", b"co64"):
        box = _find(b, stbl[0], stbl[1], [name])
        t["_" + name.decode()] = box
    stsz = t.pop("_stsz")
    if stsz:
        fixed, count = struct.unpack(">II", b[stsz[0] + 4:stsz[0] + 12])
        t["n_samples"] = count
        t["_stsz_fixed"], t["_stsz_off"] = fixed, stsz[0] + 12
    stss = t.pop("_stss")
    if stss:
        (cnt,) = struct.unpack(">I", b[stss[0] + 4:stss[0] + 8])
        t["n_keyframes"] = cnt
        t["_stss_off"], t["_stss_cnt"] = stss[0] + 8, cnt
    else:
        t["n_keyframes"] = t["n_samples"]  # absent stss = all sync
    return t


def sample_table(b: bytes, trak: dict):
    """Expand the stsc x stco x stsz x stts tables of a parsed track →
    list of (sample_idx, offset, size, t_s, keyframe) — the byte-range
    plan a distributed extractor shards on."""
    import numpy as np

    n = trak["n_samples"]
    if n == 0:
        return []
    # sizes
    if trak.get("_stsz_fixed"):
        sizes = np.full(n, trak["_stsz_fixed"], np.int64)
    else:
        off = trak["_stsz_off"]
        sizes = np.frombuffer(b, ">u4", count=n, offset=off).astype(np.int64)
    # chunk offsets
    stco, co64 = trak.get("_stco"), trak.get("_co64")
    if stco:
        (nch,) = struct.unpack(">I", b[stco[0] + 4:stco[0] + 8])
        chunk_off = np.frombuffer(b, ">u4", count=nch,
                                  offset=stco[0] + 8).astype(np.int64)
    elif co64:
        (nch,) = struct.unpack(">I", b[co64[0] + 4:co64[0] + 8])
        chunk_off = np.frombuffer(b, ">u8", count=nch,
                                  offset=co64[0] + 8).astype(np.int64)
    else:
        raise ValueError("track without stco/co64")
    # samples-per-chunk runs
    stsc = trak["_stsc"]
    (nruns,) = struct.unpack(">I", b[stsc[0] + 4:stsc[0] + 8])
    runs = np.frombuffer(b, ">u4", count=nruns * 3,
                         offset=stsc[0] + 8).reshape(nruns, 3)
    if nruns == 0 or int(runs[0][0]) != 1:
        # a valid stsc must start at chunk 1; anything else would leave
        # uninitialized samples-per-chunk entries and silently garble the
        # byte-range plan — fail like walk_boxes does on corrupt boxes
        raise ValueError("corrupt stsc: first run must cover chunk 1")
    spc = np.zeros(nch, np.int64)
    for i in range(nruns):
        first = int(runs[i][0]) - 1
        last = int(runs[i + 1][0]) - 1 if i + 1 < nruns else nch
        spc[first:last] = int(runs[i][1])
    # decode times from stts runs
    stts = trak["_stts"]
    (ntts,) = struct.unpack(">I", b[stts[0] + 4:stts[0] + 8])
    tts = np.frombuffer(b, ">u4", count=ntts * 2,
                        offset=stts[0] + 8).reshape(ntts, 2)
    deltas = np.repeat(tts[:, 1].astype(np.int64), tts[:, 0])[:n]
    t_start = np.concatenate([[0], np.cumsum(deltas)[:-1]])
    ts = trak["timescale"] or 1
    # keyframes
    key = np.zeros(n, bool)
    if "_stss_off" in trak:
        idx = np.frombuffer(b, ">u4", count=trak["_stss_cnt"],
                            offset=trak["_stss_off"]).astype(np.int64) - 1
        key[idx[idx < n]] = True
    else:
        key[:] = True
    # offsets: cumsum of sizes within each chunk
    out = []
    si = 0
    for ci in range(nch):
        off = int(chunk_off[ci])
        for _ in range(int(spc[ci])):
            if si >= n:
                break
            out.append((si, off, int(sizes[si]),
                        float(t_start[si] / ts), bool(key[si])))
            off += int(sizes[si])
            si += 1
    return out


def probe_avif(b: bytes) -> dict:
    """AVIF/HEIF still probe: brand + primary-image dimensions from the
    meta/iprp/ipco/ispe property (ISO 23008-12) — inventory triage
    without libavif; pixel decode is the AV1 external-library seam."""
    ftyp = _find(b, 0, len(b), [b"ftyp"])
    if ftyp is None:
        raise ValueError("no ftyp box")
    brand = b[ftyp[0]:ftyp[0] + 4].decode("latin1")
    w = h = 0
    ispe = _find(b, 0, len(b), [b"meta", b"iprp", b"ipco", b"ispe"])
    if ispe:
        w, h = struct.unpack(">II", b[ispe[0] + 4:ispe[0] + 12])
    n_items = 0
    iinf = _find(b, 0, len(b), [b"meta", b"iinf"])
    if iinf:
        v, _ = _full(b, iinf[0])
        if v == 0:
            (n_items,) = struct.unpack(">H", b[iinf[0] + 4:iinf[0] + 6])
        else:
            (n_items,) = struct.unpack(">I", b[iinf[0] + 4:iinf[0] + 8])
    return dict(brand=brand, width=w, height=h, n_items=n_items)
