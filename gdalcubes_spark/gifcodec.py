"""Pure-Python GIF87a/GIF89a codec (decode + encode, incl. animation).

Implemented from the public GIF89a specification (CompuServe, 1990) —
LZW with variable code width and deferred clear, global/local color
tables, the 4-pass interlace layout, Graphic Control Extension
transparency/delay/disposal, and multi-frame compositing (disposal
methods 0-3).  The reference engine's scan contract is "decode anything
GDAL reads" (reference image_collection_cube.cpp:446-552); GIF is the
one classic web-crawl format GDAL reads that the codec layer still
lacked after webp/jpeg/png/tiff.

Parity: the system giflib (via the gdk-pixbuf gif loader) is the
executed third-party oracle in tests/test_gifcodec.py — it must decode
our LZW output bit-exact, and we must decode crafted interlaced /
local-palette / multi-frame streams to the same composited pixels as
GdkPixbufAnimation.

Like the other codecs this is the honest pure-Python path; decode cost
is one Python iteration per LZW *code* (not per pixel), the same
CPU class as the PNG/VP8L paths.
"""
from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------- LZW core


def _lzw_decode(data: bytes, min_code_size: int, npixels: int) -> np.ndarray:
    """Concatenated image-data bytes → uint8 index array of npixels.

    Dictionary entries are (prefix_code, suffix_byte) pairs; each decoded
    code walks its chain into the output via a reversal stack — one Python
    loop iteration per code, not per pixel."""
    clear = 1 << min_code_size
    end = clear + 1
    # prefix/suffix chains; 4096 is the spec's hard code-space ceiling
    prefix = np.zeros(4096, np.int32)
    suffix = np.zeros(4096, np.uint8)
    length = np.zeros(4096, np.int32)
    for i in range(clear):
        suffix[i] = i
        length[i] = 1
        prefix[i] = -1
    out = np.empty(npixels, np.uint8)
    pos = 0

    bitbuf = 0
    bitcnt = 0
    width = min_code_size + 1
    next_code = end + 1
    prev = -1
    stack = bytearray(4096)

    i = 0
    n = len(data)
    while pos < npixels and (i < n or bitcnt >= width):
        while bitcnt < width and i < n:
            bitbuf |= data[i] << bitcnt
            bitcnt += 8
            i += 1
        if bitcnt < width:
            break  # truncated stream: emit what we have
        code = bitbuf & ((1 << width) - 1)
        bitbuf >>= width
        bitcnt -= width

        if code == clear:
            next_code = end + 1
            width = min_code_size + 1
            prev = -1
            continue
        if code == end:
            break
        if prev < 0:
            out[pos] = suffix[code]
            pos += 1
            prev = code
            continue
        if code < next_code:
            entry = code
        elif code == next_code:
            entry = prev  # KwKwK case: entry = prev chain + its first byte
        else:
            raise ValueError("corrupt GIF LZW stream (code out of range)")

        # materialize the chain (reversed walk)
        ln = length[entry] + (1 if code == next_code else 0)
        sp = ln
        if code == next_code:
            sp -= 1  # last byte filled below from the chain head
        c = entry
        while c >= 0:
            sp -= 1
            stack[sp] = suffix[c]
            c = prefix[c]
        if code == next_code:
            stack[ln - 1] = stack[0]
        take = min(ln, npixels - pos)
        out[pos:pos + take] = np.frombuffer(stack[:take], np.uint8)
        pos += take

        if next_code < 4096:
            prefix[next_code] = prev
            suffix[next_code] = stack[0]
            length[next_code] = length[prev] + 1
            next_code += 1
            # giflib's width schedule counts READS (= adds + 1, since
            # the first code after a clear adds nothing): it widens after
            # read t with 258+t > 2^w, which in post-add entry terms is
            # next_code == 2^w.  At 4096 the dictionary freezes until a
            # clear code.
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = code
    if pos < npixels:
        out[pos:] = 0  # tolerate truncation like giflib does
    return out


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """uint8 index array → GIF LZW bytes (without sub-block framing).

    Emits a leading clear code, resets the dictionary when the code space
    fills (the interoperable choice — giflib and every browser accept it),
    and the end code last."""
    clear = 1 << min_code_size
    end = clear + 1
    table: dict = {}
    next_code = end + 1
    width = min_code_size + 1

    out = bytearray()
    bitbuf = 0
    bitcnt = 0

    def emit(code: int):
        nonlocal bitbuf, bitcnt
        bitbuf |= code << bitcnt
        bitcnt += width
        while bitcnt >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            bitcnt -= 8

    emit(clear)
    data = indices.tobytes()
    if not data:
        raise ValueError("empty index stream")
    # prev holds a CODE; single bytes are their own codes
    prev = data[0]
    for b in data[1:]:
        key = (prev, b)
        nxt = table.get(key)
        if nxt is not None:
            prev = nxt
            continue
        emit(prev)
        if next_code < 4096:
            table[key] = next_code
            next_code += 1
            # the encoder adds one entry per EMISSION (the decoder one
            # per read minus one), so the matching post-add condition is
            # strictly-greater: giflib widens after emitting the code
            # whose add makes next_code exceed the span
            if next_code > (1 << width) and width < 12:
                width += 1
        else:
            emit(clear)
            table.clear()
            next_code = end + 1
            width = min_code_size + 1
        prev = b
    emit(prev)
    emit(end)
    if bitcnt:
        out.append(bitbuf & 0xFF)
    return bytes(out)


def _subblocks(b: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(b), 255):
        chunk = b[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    out = np.empty_like(rows)
    src = 0
    for start, step in _INTERLACE:
        cnt = len(range(start, h, step))
        out[start::step] = rows[src:src + cnt]
        src += cnt
    return out


def _interlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    parts = [rows[start::step] for start, step in _INTERLACE]
    return np.concatenate(parts, axis=0)


# ----------------------------------------------------------------- decode


def count_gif_frames(b: bytes) -> int:
    """Number of image descriptors — a pure block walk (sub-block lengths
    only, no LZW decode), so counting a 1000-frame GIF costs microseconds."""
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    packed = b[10]
    pos = 13
    if packed & 0x80:
        pos += 3 * (2 << (packed & 7))
    n = 0
    while pos < len(b):
        blk = b[pos]
        pos += 1
        if blk == 0x3B:
            break
        if blk == 0x21:  # extension: label + sub-blocks
            pos += 1
            while b[pos]:
                pos += 1 + b[pos]
            pos += 1
            continue
        if blk != 0x2C:
            raise ValueError(f"unknown GIF block 0x{blk:02x}")
        n += 1
        fpacked = b[pos + 8]
        pos += 9
        if fpacked & 0x80:
            pos += 3 * (2 << (fpacked & 7))
        pos += 1  # LZW minimum code size
        while b[pos]:
            pos += 1 + b[pos]
        pos += 1
    return n


def decode_gif_frames(b: bytes, max_frames: int = 10_000):
    """GIF bytes → (frames, delays_cs) where frames is a list of composited
    (4, H, W) uint8 ARGB canvases (one per image descriptor) and delays_cs
    the per-frame delay in centiseconds.

    Compositing follows the GIF89a disposal model: method 2 restores the
    frame's rect to transparent-or-background, method 3 restores the
    previous canvas; the transparent index leaves underlying pixels."""
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    W, H = struct.unpack("<HH", b[6:10])
    packed = b[10]
    gct = None
    pos = 13
    if packed & 0x80:
        n = 2 << (packed & 7)
        gct = np.frombuffer(b[pos:pos + 3 * n], np.uint8).reshape(n, 3)
        pos += 3 * n

    canvas = np.zeros((4, H, W), np.uint8)  # transparent ARGB
    frames: list = []
    delays: list = []
    transparent = -1
    delay_cs = 0
    disposal = 0

    while pos < len(b):
        blk = b[pos]
        pos += 1
        if blk == 0x3B:  # trailer
            break
        if blk == 0x21:  # extension
            label = b[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                sz = b[pos]
                flags = b[pos + 1]
                delay_cs = struct.unpack("<H", b[pos + 2:pos + 4])[0]
                tidx = b[pos + 4]
                transparent = tidx if flags & 1 else -1
                disposal = (flags >> 2) & 7
                pos += 1 + sz
                pos += 1  # block terminator
            else:  # skip sub-blocks of any other extension
                while b[pos]:
                    pos += 1 + b[pos]
                pos += 1
            continue
        if blk != 0x2C:
            raise ValueError(f"unknown GIF block 0x{blk:02x}")
        x0, y0, fw, fh = struct.unpack("<HHHH", b[pos:pos + 8])
        fpacked = b[pos + 8]
        pos += 9
        ct = gct
        if fpacked & 0x80:
            n = 2 << (fpacked & 7)
            ct = np.frombuffer(b[pos:pos + 3 * n], np.uint8).reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("GIF frame without any color table")
        interlaced = bool(fpacked & 0x40)
        mcs = b[pos]
        pos += 1
        data = bytearray()
        while b[pos]:
            ln = b[pos]
            data += b[pos + 1:pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = _lzw_decode(bytes(data), mcs, fw * fh).reshape(fh, fw)
        if interlaced:
            idx = _deinterlace(idx)

        before = canvas.copy() if disposal == 3 else None
        rgb = ct[np.clip(idx, 0, len(ct) - 1)]  # (fh, fw, 3)
        region = canvas[:, y0:y0 + fh, x0:x0 + fw]
        if transparent >= 0:
            opaque = idx != transparent
            region[0][opaque] = 255
            for c in range(3):
                region[c + 1][opaque] = rgb[:, :, c][opaque]
        else:
            region[0] = 255
            for c in range(3):
                region[c + 1] = rgb[:, :, c]
        frames.append(canvas.copy())
        delays.append(delay_cs)
        if len(frames) >= max_frames:
            break

        if disposal == 2:
            # "restore to background" — every modern decoder (giflib,
            # gdk-pixbuf, browsers) clears the rect to TRANSPARENT rather
            # than the declared background color; match that consensus
            canvas[:, y0:y0 + fh, x0:x0 + fw] = 0
        elif disposal == 3 and before is not None:
            canvas = before
        transparent = -1
        delay_cs = 0
        disposal = 0

    if not frames:
        raise ValueError("GIF contains no image data")
    return frames, delays


def decode_gif(b: bytes, nb: int | None = None) -> np.ndarray:
    """GIF bytes → (nb, h, w) uint8 — the FIRST composited frame (the
    codec-layer contract for still inventories; animation goes through
    decode_gif_frames / the multimodal frame_sample op).

    Band collapse mirrors the webp codec: fully-opaque alpha drops to RGB,
    grey r=g=b folds to 1 band; `nb` pins (4=ARGB, 3=RGB, 1=grey)."""
    from gdalcubes_spark.codecs import _pin_bands
    frames, _ = decode_gif_frames(b, max_frames=1)
    return _pin_bands(frames[0], nb, "gif")


# ----------------------------------------------------------------- encode


def _median_cut(pixels: np.ndarray, n_colors: int) -> np.ndarray:
    """(n, 3) uint8 → (<=n_colors, 3) palette by median-cut."""
    boxes = [pixels.astype(np.int32)]
    while len(boxes) < n_colors:
        # split the box with the largest channel range
        spans = [(b.max(0) - b.min(0)).max() if len(b) > 1 else -1
                 for b in boxes]
        bi = int(np.argmax(spans))
        if spans[bi] <= 0:
            break
        box = boxes[bi]
        ch = int(np.argmax(box.max(0) - box.min(0)))
        order = np.argsort(box[:, ch], kind="stable")
        half = len(box) // 2
        boxes[bi] = box[order[:half]]
        boxes.append(box[order[half:]])
    return np.array([np.round(b.mean(0)) for b in boxes], np.uint8)


def _palettize(a: np.ndarray, max_colors: int):
    """(3, h, w) → (palette (n,3) uint8, indices (h,w) uint8). Exact when
    the image has <= max_colors unique colors, median-cut quantized
    otherwise."""
    h, w = a.shape[1:]
    flat = np.moveaxis(a, 0, -1).reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) <= max_colors:
        return colors.astype(np.uint8), \
            inverse.reshape(h, w).astype(np.uint8)
    pal = _median_cut(flat, max_colors)
    # nearest palette entry per unique color (unique keeps this bounded)
    d = ((colors[:, None, :].astype(np.int32)
          - pal[None, :, :].astype(np.int32)) ** 2).sum(-1)
    remap = d.argmin(1).astype(np.uint8)
    return pal, remap[inverse].reshape(h, w)


def _color_table_block(pal: np.ndarray):
    """Palette → (packed_size_bits, padded table bytes)."""
    n = len(pal)
    bits = max(1, int(np.ceil(np.log2(max(n, 2)))))
    full = 1 << bits
    table = np.zeros((full, 3), np.uint8)
    table[:n] = pal
    return bits - 1, table.tobytes()


def encode_gif(a: np.ndarray, interlace: bool = False) -> bytes:
    """uint8 (1|3|4, h, w) → single-frame GIF89a.

    1 band → grey palette; 3 bands → exact palette when <=256 unique
    colors else median-cut; 4 bands (ARGB) → 1-bit alpha via a reserved
    transparent index (alpha >= 128 is opaque — GIF has no partial
    alpha)."""
    frames = [(a, 0)]
    return encode_gif_animation(frames, interlace=interlace, loop=None)


def encode_gif_animation(frames, interlace: bool = False,
                         loop: int | None = 0) -> bytes:
    """[(planes, delay_cs), ...] → GIF89a. Frames must share the canvas
    size; each is stored full-rect with disposal 2 (restore background,
    i.e. successive frames replace) — the layout every browser and
    giflib handle identically.  loop: NETSCAPE2.0 iteration count
    (0 = forever, None = omit the loop extension)."""
    first = frames[0][0]
    nbands = first.shape[0]
    H, W = first.shape[1:]

    encoded = []
    for planes, delay in frames:
        if planes.shape != first.shape:
            raise ValueError("animation frames must share shape")
        if nbands == 1:
            idx = planes[0]
            pal = np.repeat(np.arange(256, dtype=np.uint8)[:, None], 3, 1)
            tidx = -1
        elif nbands == 3:
            pal, idx = _palettize(planes, 256)
            tidx = -1
        elif nbands == 4:
            opaque = planes[0] >= 128
            any_alpha_here = not opaque.all()
            pal, idx = _palettize(planes[1:], 255)
            if any_alpha_here:
                tidx = len(pal)
                pal = np.vstack([pal, [[0, 0, 0]]])
                idx = idx.copy()
                idx[~opaque] = tidx
            else:
                tidx = -1
        else:
            raise ValueError("gif codec takes 1, 3 or 4 bands")
        encoded.append((pal, idx, tidx, delay))

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", W, H)
    out += bytes([0x70, 0, 0])  # no GCT (per-frame local tables), bg 0
    if loop is not None and len(frames) > 1:
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01"
        out += struct.pack("<H", loop) + b"\x00"
    for pal, idx, tidx, delay in encoded:
        if len(frames) > 1 or tidx >= 0 or delay:
            flags = (2 << 2) if len(frames) > 1 else 0  # disposal 2
            if tidx >= 0:
                flags |= 1
            out += b"\x21\xf9\x04" + bytes([flags])
            out += struct.pack("<H", delay)
            out += bytes([max(tidx, 0), 0])
        szbits, table = _color_table_block(pal)
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, W, H)
        out += bytes([0x80 | (0x40 if interlace else 0) | szbits])
        out += table
        rows = _interlace(idx) if interlace else idx
        mcs = max(2, szbits + 1)
        out += bytes([mcs])
        out += _subblocks(_lzw_encode(rows.ravel(), mcs))
    out += b"\x3b"
    return bytes(out)
