"""JPEG (JFIF) encoder/decoder in pure numpy — no libjpeg/PIL.

Implemented from the PUBLIC specs: ITU-T T.81 (DCT, entropy coding, marker
structure, Annex K quantization + Huffman tables, Annex G progressive mode)
and the JFIF 1.02 container note. This replaces the round-1/2 deterministic
stub behind codecs._jpeg_*: `fmt='jpeg'` payloads are now REAL JFIF bytes,
and the PSNR≥40dB acceptance gate (north rule / input_hint) runs through an
actual DCT+Huffman round trip.

Scope:
- encode: baseline (SOF0) and progressive (SOF2, encode_progressive with the
  libjpeg default scan script) — greyscale (1 band) or RGB (3 bands, BT.601
  full-range YCbCr), 4:4:4 or 4:2:0 chroma subsampling, IJG quality scaling
  of the Annex K tables, byte stuffing, optional restart markers (baseline).
- decode: any baseline (SOF0/1) or progressive (SOF2) Huffman stream with
  8-bit samples, 1 or 3 components, sampling factors up to 2x2, multiple
  DQT/DHT segments, spectral selection + successive approximation (DC/AC
  first and refinement scans, EOB runs), restart markers (DRI), APPn/COM
  skip. Lossless/hierarchical/arithmetic variants raise NotImplementedError.

Performance shape: the entropy loop is per-symbol Python but fully INLINED —
local-variable bit state, cached python-list 16-bit prefix LUTs (O(1) per
symbol), no per-symbol function calls; profiling showed the object/function
form spent ~80% of wall in call overhead (6.7× decode speedup on 256²
images). DCT/IDCT, level shift, color transform and upsampling are
whole-image numpy einsums. Images decode inside Arrow-batched UDFs
(multimodal.py), so the per-image cost is amortized across executor cores,
and a production cluster swaps in libjpeg bindings at the same seam
(codecs.decode) without touching any Spark plumbing.
"""

from __future__ import annotations

import functools
import struct

import numpy as np

# ----------------------------------------------------------------- tables

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int32)
UNZIGZAG = np.argsort(ZIGZAG)

# Annex K.1 / K.2 base quantization tables (luminance, chrominance)
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99],
    dtype=np.float64).reshape(8, 8)
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99],
    dtype=np.float64).reshape(8, 8)

# Annex K.3 standard Huffman tables: (bits[1..16], huffval)
DC_LUMA_BITS = (0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
DC_LUMA_VALS = tuple(range(12))
DC_CHROMA_BITS = (0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
DC_CHROMA_VALS = tuple(range(12))
AC_LUMA_BITS = (0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D)
AC_LUMA_VALS = (
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA)
AC_CHROMA_BITS = (0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
AC_CHROMA_VALS = (
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA)

# orthonormal 8-point DCT-II matrix: forward block transform = D @ B @ D.T
_D = np.array([[(np.sqrt(0.125) if k == 0 else 0.5)
                * np.cos((2 * n + 1) * k * np.pi / 16.0)
                for n in range(8)] for k in range(8)])


def _quality_scale(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling (libjpeg jpeg_quality_scaling, public source)."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 / q if q < 50 else 200 - 2 * q
    return np.clip(np.floor((base * scale + 50) / 100), 1, 255)


# ----------------------------------------------------------- huffman build

@functools.lru_cache(maxsize=64)
def _huff_codes(bits, vals):
    """(symbol -> (code, length)) per T.81 Annex C canonical assignment.
    Cached — encoders pass the module-constant Annex K tables, and the dict
    build was ~5% of a small-image encode."""
    out, code = {}, 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


@functools.lru_cache(maxsize=64)
def _huff_lookup_lists(bits, vals):
    """Python-list form of _huff_lookup for the inlined decode loop —
    cached: converting the 65k-entry tables per decode costs more than
    decoding a small image, and real streams reuse the Annex K tables."""
    sym, ln = _huff_lookup(list(bits), list(vals))
    return sym.tolist(), ln.tolist()


def _huff_lookup(bits, vals):
    """16-bit prefix lookup: table[peek16] = (symbol, code length)."""
    sym = np.zeros(1 << 16, dtype=np.int16)
    ln = np.zeros(1 << 16, dtype=np.int8)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lo = code << (16 - length)
            hi = (code + 1) << (16 - length)
            sym[lo:hi] = vals[k]
            ln[lo:hi] = length
            code += 1
            k += 1
        code <<= 1
    return sym, ln


# ------------------------------------------------------------ bit plumbing

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.nbits = 0

    def put(self, code: int, length: int):
        self.buf = (self.buf << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.buf >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.buf &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # pad with 1-bits per spec


class _BitReader:
    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0
        self.buf = 0
        self.nbits = 0

    def _fill(self):
        while self.nbits <= 48 and self.pos < len(self.d):
            self.buf = (self.buf << 8) | self.d[self.pos]
            self.pos += 1
            self.nbits += 8

    def peek16(self) -> int:
        self._fill()
        if self.nbits >= 16:
            return (self.buf >> (self.nbits - 16)) & 0xFFFF
        return (self.buf << (16 - self.nbits)) & 0xFFFF  # zero-padded tail

    def skip(self, n: int):
        self.nbits -= n
        self.buf &= (1 << self.nbits) - 1 if self.nbits > 0 else 0

    def receive(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill()
        if self.nbits < n:  # truncated stream: treat missing bits as 0
            self.buf <<= (n - self.nbits)
            self.nbits = n
        v = (self.buf >> (self.nbits - n)) & ((1 << n) - 1)
        self.skip(n)
        return v


def _extend(v: int, s: int) -> int:
    """T.81 F.12: magnitude-category bits → signed value."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


# ----------------------------------------------------------------- encode

def _rgb_to_ycbcr(a: np.ndarray) -> np.ndarray:
    r, g, b = a[0], a[1], a[2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr])


def _blocks_of(plane: np.ndarray) -> np.ndarray:
    """(H, W) padded to /8 by edge replication → (nby, nbx, 8, 8)."""
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    H, W = plane.shape
    return plane.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3)


def _dct_quant_components(a: np.ndarray, quality: int, subsampling: str):
    """Shared encoder front half: uint8 (1|3, h, w) → per-component zigzag
    int32 coefficient arrays (nby, nbx, 64), quant tables, sampling factors.
    Baseline and progressive streams carry IDENTICAL coefficients — only the
    entropy layer differs — which is what the progressive roundtrip tests
    pin (decode(progressive) must equal decode(baseline) bit-for-bit)."""
    nb, h, w = a.shape
    if nb not in (1, 3):
        raise ValueError("encoder supports 1 (grey) or 3 (RGB) bands")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    planes = _rgb_to_ycbcr(a.astype(np.float64)) if nb == 3 else a.astype(np.float64)
    qt = [_quality_scale(QT_LUMA, quality)]
    if nb == 3:
        qt.append(_quality_scale(QT_CHROMA, quality))
    sub = subsampling == "420" and nb == 3
    sampling = [(2, 2), (1, 1), (1, 1)] if sub else [(1, 1)] * nb

    if sub:
        cb = planes[1]
        cr = planes[2]
        ph, pw = -h % 2, -w % 2
        if ph or pw:
            cb = np.pad(cb, ((0, ph), (0, pw)), mode="edge")
            cr = np.pad(cr, ((0, ph), (0, pw)), mode="edge")
        cb = cb.reshape(cb.shape[0] // 2, 2, cb.shape[1] // 2, 2).mean(axis=(1, 3))
        cr = cr.reshape(cr.shape[0] // 2, 2, cr.shape[1] // 2, 2).mean(axis=(1, 3))
        comp_planes = [planes[0], cb, cr]
    else:
        comp_planes = [planes[c] for c in range(nb)]

    # forward DCT + quantize per component, keep zigzagged int blocks
    comp_blocks = []
    for c in range(nb):
        blk = _blocks_of(comp_planes[c] - 128.0)
        coef = np.einsum("ij,abjk,lk->abil", _D, blk, _D)
        q = qt[0] if c == 0 else qt[1]
        zz = np.round(coef / q).astype(np.int32).reshape(blk.shape[0], blk.shape[1], 64)[:, :, ZIGZAG]
        comp_blocks.append(zz)
    return comp_blocks, qt, sampling


def encode_baseline(a: np.ndarray, quality: int = 90, subsampling: str = "444",
                    restart_interval: int = 0) -> bytes:
    """uint8 (1|3, h, w) → baseline JFIF bytes. subsampling: '444' or '420'
    (RGB only; '420' is the dominant production layout, kept optional so
    lossless-critical tests can stay 4:4:4). restart_interval > 0 emits DRI +
    RSTn markers every N MCUs (resync points real encoders use for error
    resilience / parallel decode)."""
    nb, h, w = a.shape
    comp_blocks, qt, sampling = _dct_quant_components(a, quality, subsampling)

    dc_tabs = [_huff_codes(DC_LUMA_BITS, DC_LUMA_VALS)]
    ac_tabs = [_huff_codes(AC_LUMA_BITS, AC_LUMA_VALS)]
    if nb == 3:
        dc_tabs.append(_huff_codes(DC_CHROMA_BITS, DC_CHROMA_VALS))
        ac_tabs.append(_huff_codes(AC_CHROMA_BITS, AC_CHROMA_VALS))

    # HOT LOOP: bit writer inlined with local state (same rationale as the
    # decoder — per-symbol method calls dominated the wall); zz rows become
    # python lists once per block, EOB/ZRL codes are hoisted.
    bw = _BitWriter()
    emit = bw.out
    buf = 0
    nbits = 0
    preds = [0] * nb
    max_h = max(s[0] for s in sampling)
    max_v = max(s[1] for s in sampling)
    mcus_x = -(-w // (8 * max_h))
    mcus_y = -(-h // (8 * max_v))
    mcu_n = 0
    nz_lists = [[(np.nonzero(zzc[ry, rx][1:])[0] + 1).tolist()
                 for ry in range(zzc.shape[0]) for rx in range(zzc.shape[1])]
                for zzc in comp_blocks]
    zz_lists = [[zzc[ry, rx].tolist() for ry in range(zzc.shape[0])
                 for rx in range(zzc.shape[1])] for zzc in comp_blocks]
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_n and mcu_n % restart_interval == 0:
                if nbits:  # flush: pad to byte with 1-bits (spec), stuffed
                    pad = 8 - nbits
                    buf = (buf << pad) | ((1 << pad) - 1)
                    b8 = buf & 0xFF
                    emit.append(b8)
                    if b8 == 0xFF:
                        emit.append(0x00)
                    buf = nbits = 0
                emit += bytes([0xFF, 0xD0 + ((mcu_n // restart_interval - 1) % 8)])
                preds = [0] * nb
            mcu_n += 1
            for c in range(nb):
                ch, cv = sampling[c]
                zzc = comp_blocks[c]
                nbx_c = zzc.shape[1]
                t = 0 if c == 0 else 1
                dc_tab = dc_tabs[t]
                ac_tab = ac_tabs[t]
                for by in range(cv):
                    for bx in range(ch):
                        ry = min(my * cv + by, zzc.shape[0] - 1)
                        rx = min(mx * ch + bx, nbx_c - 1)
                        bi = ry * nbx_c + rx
                        zz = zz_lists[c][bi]
                        # --- DC
                        diff = zz[0] - preds[c]
                        preds[c] = zz[0]
                        s = abs(diff).bit_length()
                        code, ln = dc_tab[s]
                        buf = (buf << ln) | code
                        nbits += ln
                        if s:
                            buf = (buf << s) | ((diff if diff >= 0
                                                 else diff + (1 << s) - 1) & ((1 << s) - 1))
                            nbits += s
                        # --- AC
                        prev = 0
                        for i in nz_lists[c][bi]:
                            run = i - prev - 1
                            while run > 15:
                                code, ln = ac_tab[0xF0]  # ZRL
                                buf = (buf << ln) | code
                                nbits += ln
                                run -= 16
                            v = zz[i]
                            s = abs(v).bit_length()
                            code, ln = ac_tab[(run << 4) | s]
                            buf = (buf << (ln + s)) | (code << s) \
                                | ((v if v >= 0 else v + (1 << s) - 1) & ((1 << s) - 1))
                            nbits += ln + s
                            prev = i
                        if prev < 63:
                            code, ln = ac_tab[0x00]  # EOB
                            buf = (buf << ln) | code
                            nbits += ln
                        # drain whole bytes in one int.to_bytes + stuffing
                        # via bytes.replace — identical to the old per-byte
                        # loop (stuffing inserts 0x00 after EVERY 0xFF byte)
                        nby = nbits >> 3
                        if nby:
                            rem = nbits & 7
                            chunk = (buf >> rem).to_bytes(nby, "big")
                            if b"\xff" in chunk:
                                chunk = chunk.replace(b"\xff", b"\xff\x00")
                            emit += chunk
                            nbits = rem
                            buf &= (1 << rem) - 1
    bw.buf, bw.nbits = buf, nbits
    bw.flush()

    # ----- markers
    def seg(marker, payload):
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(b"\xFF\xD8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")  # APP0
    for i, q in enumerate(qt):
        out += seg(0xFFDB, bytes([i]) + bytes(q.astype(np.uint8).ravel()[ZIGZAG]))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([nb])
    for c in range(nb):
        sof += bytes([c + 1, (sampling[c][0] << 4) | sampling[c][1], 0 if c == 0 else 1])
    out += seg(0xFFC0, sof)
    huffs = [(0x00, DC_LUMA_BITS, DC_LUMA_VALS), (0x10, AC_LUMA_BITS, AC_LUMA_VALS)]
    if nb == 3:
        huffs += [(0x01, DC_CHROMA_BITS, DC_CHROMA_VALS), (0x11, AC_CHROMA_BITS, AC_CHROMA_VALS)]
    for tc, bits, vals in huffs:
        out += seg(0xFFC4, bytes([tc]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
    sos = bytes([nb])
    for c in range(nb):
        t = 0 if c == 0 else 1
        sos += bytes([c + 1, (t << 4) | t])
    sos += bytes([0, 63, 0])
    out += seg(0xFFDA, sos)
    out += bw.out
    out += b"\xFF\xD9"  # EOI
    return bytes(out)


# ------------------------------------------------------- progressive encode

# AC table for progressive scans: the Annex K baseline AC tables lack the
# EOBn run-length symbols (0x10..0xE0), so progressive scans use one custom
# canonical table holding EVERY symbol the scans can emit at a flat 9-bit
# length (176 symbols < 511 ⇒ no all-ones code). Deliberately simple over
# optimal — the streams are spec-valid; production encoders ship frequency-
# built tables, which only changes compression ratio, not decodability.
_PROG_AC_VALS = tuple([r << 4 for r in range(15)] + [0xF0]
                      + [(r << 4) | s for r in range(16) for s in range(1, 11)])
_PROG_AC_BITS = tuple([0] * 8 + [len(_PROG_AC_VALS)] + [0] * 7)


def _std_scan_script(nb: int):
    """(comp_indices, Ss, Se, Ah, Al) per scan — the libjpeg default
    progression (jcparam.c jpeg_simple_progression, public source): DC first
    at Al=1, spectral-selection AC firsts, then one successive-approximation
    refinement per band, DC refine last-but-three."""
    if nb == 1:
        return [((0,), 0, 0, 0, 1),
                ((0,), 1, 63, 0, 1),
                ((0,), 0, 0, 1, 0),
                ((0,), 1, 63, 1, 0)]
    return [((0, 1, 2), 0, 0, 0, 1),
            ((0,), 1, 5, 0, 2),
            ((2,), 1, 63, 0, 1),
            ((1,), 1, 63, 0, 1),
            ((0,), 6, 63, 0, 2),
            ((0,), 1, 63, 2, 1),
            ((0, 1, 2), 0, 0, 1, 0),
            ((2,), 1, 63, 1, 0),
            ((0,), 1, 63, 1, 0),
            ((1,), 1, 63, 1, 0)]


class _ProgWriter(_BitWriter):
    """Bit writer + the EOB-run state machine progressive AC scans share:
    EOBRUN batches end-of-band runs across blocks; refinement scans also
    buffer the run's correction bits (BE) for emission right after EOBn."""

    def __init__(self, ac_tab):
        super().__init__()
        self.ac = ac_tab
        self.eobrun = 0
        self.be = []  # buffered correction bits of the pending EOB run

    def sym(self, s):
        code, ln = self.ac[s]
        self.put(code, ln)

    def bits(self, seq):
        for b in seq:
            self.put(b, 1)

    def flush_eobrun(self):
        n = self.eobrun
        if n:
            r = n.bit_length() - 1
            self.sym(r << 4)
            if r:
                self.put(n - (1 << r), r)
            self.bits(self.be)
            self.eobrun = 0
            self.be = []


def _scan_block_order(comp_blocks, sampling, comp_ids, h, w):
    """Yield (comp_index, by, bx) in scan order: interleaved scans walk MCUs
    (edge blocks clamped like the baseline writer); single-component scans
    walk the component's own block raster (T.81 non-interleaved rule)."""
    if len(comp_ids) == 1:
        c = comp_ids[0]
        hb, wb = comp_blocks[c].shape[:2]
        for by in range(hb):
            for bx in range(wb):
                yield c, by, bx
        return
    max_h = max(s[0] for s in sampling)
    max_v = max(s[1] for s in sampling)
    mcus_x = -(-w // (8 * max_h))
    mcus_y = -(-h // (8 * max_v))
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for c in comp_ids:
                ch, cv = sampling[c]
                hb, wb = comp_blocks[c].shape[:2]
                for by in range(cv):
                    for bx in range(ch):
                        yield c, min(my * cv + by, hb - 1), min(mx * ch + bx, wb - 1)


def encode_progressive(a: np.ndarray, quality: int = 90,
                       subsampling: str = "444") -> bytes:
    """uint8 (1|3, h, w) → PROGRESSIVE (SOF2) JFIF bytes, T.81 Annex G
    spectral selection + successive approximation. Coefficients are identical
    to encode_baseline at the same quality/subsampling — only the scan layout
    differs — so decode(progressive) == decode(baseline) exactly."""
    nb, h, w = a.shape
    comp_blocks, qt, sampling = _dct_quant_components(a, quality, subsampling)
    dc_tabs = [_huff_codes(DC_LUMA_BITS, DC_LUMA_VALS)]
    if nb == 3:
        dc_tabs.append(_huff_codes(DC_CHROMA_BITS, DC_CHROMA_VALS))
    ac_tab = _huff_codes(_PROG_AC_BITS, _PROG_AC_VALS)

    def enc_dc_first(wtr, comp_ids, al):
        preds = [0] * nb
        for c, by, bx in _scan_block_order(comp_blocks, sampling, comp_ids, h, w):
            v = int(comp_blocks[c][by, bx, 0]) >> al  # arithmetic shift (G.1.2.1)
            diff = v - preds[c]
            preds[c] = v
            s = abs(diff).bit_length()
            code, ln = dc_tabs[0 if c == 0 else 1][s]
            wtr.put(code, ln)
            if s:
                wtr.put(diff if diff >= 0 else diff + (1 << s) - 1, s)

    def enc_dc_refine(wtr, comp_ids, al):
        for c, by, bx in _scan_block_order(comp_blocks, sampling, comp_ids, h, w):
            wtr.put((int(comp_blocks[c][by, bx, 0]) >> al) & 1, 1)

    def enc_ac_first(wtr, comp_ids, ss, se, al):
        c = comp_ids[0]
        hb, wb = comp_blocks[c].shape[:2]
        for by in range(hb):
            for bx in range(wb):
                row = comp_blocks[c][by, bx]
                run = 0
                wrote = False
                for k in range(ss, se + 1):
                    t = int(row[k])
                    mag = (-t if t < 0 else t) >> al  # toward-zero (G.1.2.2)
                    if mag == 0:
                        run += 1
                        continue
                    wtr.flush_eobrun()
                    while run > 15:
                        wtr.sym(0xF0)
                        run -= 16
                    s = mag.bit_length()
                    wtr.sym((run << 4) | s)
                    v = mag if t >= 0 else -mag
                    wtr.put(v if v >= 0 else v + (1 << s) - 1, s)
                    run = 0
                    wrote = True
                if run or not wrote:
                    wtr.eobrun += 1
                    if wtr.eobrun == 0x7FFF:
                        wtr.flush_eobrun()
        wtr.flush_eobrun()

    def enc_ac_refine(wtr, comp_ids, ss, se, al):
        # jcphuff.c encode_mcu_AC_refine structure (public libjpeg source):
        # newly-nonzero coefs emit (run<<4)|1 + sign; already-nonzero coefs
        # ride as correction bits, buffered per symbol (BR) or per EOB run (BE)
        c = comp_ids[0]
        hb, wb = comp_blocks[c].shape[:2]
        for by in range(hb):
            for bx in range(wb):
                row = comp_blocks[c][by, bx]
                absv = [(-int(row[k]) if row[k] < 0 else int(row[k])) >> al
                        for k in range(ss, se + 1)]
                eob = -1  # band index of the LAST newly-nonzero coefficient
                for i, t in enumerate(absv):
                    if t == 1:
                        eob = i
                run = 0
                br = []  # correction bits awaiting the current block's next symbol
                for i, t in enumerate(absv):
                    if t == 0:
                        run += 1
                        continue
                    while run > 15 and i <= eob:
                        wtr.flush_eobrun()
                        wtr.sym(0xF0)
                        run -= 16
                        wtr.bits(br)
                        br = []
                    if t > 1:
                        br.append(t & 1)
                        continue
                    wtr.flush_eobrun()
                    wtr.sym((run << 4) | 1)
                    wtr.put(1 if row[ss + i] >= 0 else 0, 1)
                    wtr.bits(br)
                    br = []
                    run = 0
                if run or br:
                    wtr.eobrun += 1
                    wtr.be.extend(br)
                    if wtr.eobrun == 0x7FFF or len(wtr.be) > 900:
                        wtr.flush_eobrun()
        wtr.flush_eobrun()

    # ----- markers
    def seg(marker, payload):
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(b"\xFF\xD8")
    out += seg(0xFFE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")
    for i, q in enumerate(qt):
        out += seg(0xFFDB, bytes([i]) + bytes(q.astype(np.uint8).ravel()[ZIGZAG]))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([nb])
    for c in range(nb):
        sof += bytes([c + 1, (sampling[c][0] << 4) | sampling[c][1], 0 if c == 0 else 1])
    out += seg(0xFFC2, sof)  # SOF2: progressive DCT, Huffman
    huffs = [(0x00, DC_LUMA_BITS, DC_LUMA_VALS),
             (0x10, _PROG_AC_BITS, _PROG_AC_VALS)]
    if nb == 3:
        huffs.append((0x01, DC_CHROMA_BITS, DC_CHROMA_VALS))
    for tc, bits, vals in huffs:
        out += seg(0xFFC4, bytes([tc]) + bytes(bits) + bytes(vals))

    for comp_ids, ss, se, ah, al in _std_scan_script(nb):
        wtr = _ProgWriter(ac_tab)
        if ss == 0 and ah == 0:
            enc_dc_first(wtr, comp_ids, al)
        elif ss == 0:
            enc_dc_refine(wtr, comp_ids, al)
        elif ah == 0:
            enc_ac_first(wtr, comp_ids, ss, se, al)
        else:
            enc_ac_refine(wtr, comp_ids, ss, se, al)
        wtr.flush()
        sos = bytes([len(comp_ids)])
        for c in comp_ids:
            td = 0 if c == 0 else 1
            sos += bytes([c + 1, (td << 4) | 0])  # AC table 0 for every comp
        sos += bytes([ss, se, (ah << 4) | al])
        out += seg(0xFFDA, sos)
        out += wtr.out
    out += b"\xFF\xD9"
    return bytes(out)


# ----------------------------------------------------------------- decode

def _split_segments(scan: bytes, restart_interval: int) -> list:
    """Entropy bytes → unstuffed segments, split at RSTn when DRI is set."""
    if not restart_interval:
        return [scan.replace(b"\xFF\x00", b"\xFF")]
    segments = []
    seg_bytes = bytearray()
    i = 0
    while i < len(scan):
        if scan[i] == 0xFF and i + 1 < len(scan) and 0xD0 <= scan[i + 1] <= 0xD7:
            segments.append(bytes(seg_bytes))
            seg_bytes = bytearray()
            i += 2
            continue
        seg_bytes.append(scan[i])
        if scan[i] == 0xFF and i + 1 < len(scan) and scan[i + 1] == 0x00:
            i += 2
        else:
            i += 1
    segments.append(bytes(seg_bytes))
    return segments


def _rsym(rd: _BitReader, lut) -> int:
    """One Huffman symbol via the 16-bit prefix LUT (list form)."""
    sym, ln = lut
    idx = rd.peek16()
    length = ln[idx]
    if length == 0:
        raise ValueError("bad Huffman code")
    rd.skip(length)
    if rd.nbits < 0:  # truncated tail: missing bits read as 0 (baseline rule)
        rd.nbits = 0
        rd.buf = 0
    return sym[idx]


def decode_baseline(data: bytes) -> np.ndarray:
    """JFIF bytes → uint8 (1|3, h, w). Decodes baseline (SOF0/1) with the
    inlined hot loop AND progressive (SOF2, T.81 Annex G: spectral selection
    + successive approximation, DC/AC first and refinement scans, EOB runs).
    Raises NotImplementedError on >8-bit precision / arithmetic coding."""
    if data[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    dc_lut: dict[int, tuple] = {}
    ac_lut: dict[int, tuple] = {}
    comps = None
    h = w = 0
    restart_interval = 0
    scan = None
    scan_comps = None
    progressive = False
    pblocks = None  # progressive: per-component int32 coefficient arrays

    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", data[pos:pos + 2])
        payload = data[pos + 2:pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT (possibly several tables)
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables unsupported")
                tbl = np.frombuffer(payload, dtype=np.uint8, count=64, offset=p + 1).astype(np.float64)
                qts[tq] = tbl[UNZIGZAG].reshape(8, 8)
                p += 65
        elif marker == 0xC4:  # DHT (possibly several tables)
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0x0F
                bits = list(payload[p + 1:p + 17])
                nv = sum(bits)
                vals = list(payload[p + 17:p + 17 + nv])
                (ac_lut if tc else dc_lut)[th] = _huff_lookup_lists(tuple(bits), tuple(vals))
                p += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            prec = payload[0]
            if prec != 8:
                raise NotImplementedError("only 8-bit precision supported")
            progressive = marker == 0xC2
            h, w = struct.unpack(">HH", payload[1:5])
            nc = payload[5]
            comps = []
            for c in range(nc):
                cid, hv, tq = payload[6 + 3 * c:9 + 3 * c]
                comps.append(dict(id=cid, h=hv >> 4, v=hv & 0x0F, tq=tq))
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError("only baseline/extended/progressive Huffman JPEG supported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", payload[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = payload[0]
            scan_comps = []
            for c in range(ns):
                cs, tt = payload[1 + 2 * c:3 + 2 * c]
                comp = next(x for x in comps if x["id"] == cs)
                scan_comps.append(dict(comp=comp, td=tt >> 4, ta=tt & 0x0F))
            ss, se = payload[1 + 2 * ns], payload[2 + 2 * ns]
            ah, al = payload[3 + 2 * ns] >> 4, payload[3 + 2 * ns] & 0x0F
            # find entropy segment end: next marker that is not stuffing/RST.
            # bytes.find jumps between 0xFF bytes instead of walking every
            # entropy byte in Python (the old per-byte loop was ~30% of a
            # small-image decode); identical end position.
            p = pos
            n_data = len(data)
            while p < n_data - 1:
                q = data.find(b"\xff", p, n_data - 1)
                if q == -1:
                    p = n_data - 1
                    break
                nxt = data[q + 1]
                if nxt != 0x00 and not (0xD0 <= nxt <= 0xD7):
                    p = q
                    break
                p = q + 2
                if p > n_data - 1:
                    p = n_data - 1
            scan = data[pos:p]
            pos = p
            if progressive:
                if pblocks is None:
                    pblocks = _alloc_blocks(comps, h, w, np.int32)
                _decode_prog_scan(pblocks, comps, scan_comps, ss, se, ah, al,
                                  scan, restart_interval, dc_lut, ac_lut, h, w)
    if comps is None or scan is None:
        raise ValueError("truncated JPEG: missing SOF/SOS")

    max_h = max(c["h"] for c in comps)
    max_v = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * max_h))
    mcus_y = -(-h // (8 * max_v))
    n_comp = len(comps)
    nbx = [mcus_x * c["h"] for c in comps]
    nby = [mcus_y * c["v"] for c in comps]

    if progressive:
        blocks = [b.astype(np.float64) for b in pblocks]
        return _reconstruct(blocks, comps, qts, nbx, nby, max_h, max_v, h, w)

    # entropy decode into per-component zigzag coefficient arrays
    blocks = _alloc_blocks(comps, h, w, np.float64)

    segments = _split_segments(scan, restart_interval)

    # HOT LOOP: the per-symbol bit reader is fully inlined with local-
    # variable state and python-list Huffman LUTs — the object/function
    # form spent ~80% of decode wall in call overhead (profiled: 307k
    # read_symbol calls per 256² image). Semantics identical, incl. the
    # zero-padded-tail handling of truncated streams.
    per_comp_luts = [(*dc_lut[sc["td"]], *ac_lut[sc["ta"]]) for sc in scan_comps]

    mcu = 0
    seg_idx = 0
    d = segments[0]
    dlen = len(d)
    pos = buf = nbits = 0
    preds = [0] * n_comp
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu and mcu % restart_interval == 0:
                seg_idx += 1
                d = segments[seg_idx]
                dlen = len(d)
                pos = buf = nbits = 0
                preds = [0] * n_comp
            for ci, sc in enumerate(scan_comps):
                comp = sc["comp"]
                dsym, dln, asym, aln = per_comp_luts[ci]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        row = blocks[ci][my * comp["v"] + by, mx * comp["h"] + bx]
                        # --- DC symbol
                        # refills pull 6 bytes per int.from_bytes instead of
                        # one byte per loop turn; a single chunk either
                        # reaches the 16-bit lookahead or exhausts the
                        # segment, exactly like the old per-byte loop
                        if nbits < 16 and pos < dlen:
                            take = dlen - pos
                            if take > 6:
                                take = 6
                            buf = (buf << (take << 3)) | int.from_bytes(
                                d[pos:pos + take], "big")
                            pos += take
                            nbits += take << 3
                        idx = ((buf >> (nbits - 16)) if nbits >= 16
                               else (buf << (16 - nbits))) & 0xFFFF
                        ln = dln[idx]
                        if ln == 0:
                            raise ValueError("bad Huffman code")
                        s = dsym[idx]
                        nbits -= ln
                        if nbits < 0:  # truncated tail (corrupt stream)
                            nbits = 0
                        buf &= (1 << nbits) - 1
                        if s:
                            if nbits < s and pos < dlen:
                                take = dlen - pos
                                if take > 6:
                                    take = 6
                                buf = (buf << (take << 3)) | int.from_bytes(
                                    d[pos:pos + take], "big")
                                pos += take
                                nbits += take << 3
                            if nbits < s:  # truncated: missing bits read 0
                                buf <<= s - nbits
                                nbits = s
                            v = buf >> (nbits - s)
                            nbits -= s
                            buf &= (1 << nbits) - 1
                            preds[ci] += v if v >= (1 << (s - 1)) else v - (1 << s) + 1
                        row[0] = preds[ci]
                        # --- AC run-length symbols
                        k = 1
                        while k < 64:
                            if nbits < 16 and pos < dlen:
                                take = dlen - pos
                                if take > 6:
                                    take = 6
                                buf = (buf << (take << 3)) | int.from_bytes(
                                    d[pos:pos + take], "big")
                                pos += take
                                nbits += take << 3
                            idx = ((buf >> (nbits - 16)) if nbits >= 16
                                   else (buf << (16 - nbits))) & 0xFFFF
                            ln = aln[idx]
                            if ln == 0:
                                raise ValueError("bad Huffman code")
                            rs = asym[idx]
                            nbits -= ln
                            if nbits < 0:
                                nbits = 0
                            buf &= (1 << nbits) - 1
                            s = rs & 0x0F
                            if s == 0:
                                if rs == 0xF0:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += rs >> 4
                            if k > 63:
                                break
                            if nbits < s and pos < dlen:
                                take = dlen - pos
                                if take > 6:
                                    take = 6
                                buf = (buf << (take << 3)) | int.from_bytes(
                                    d[pos:pos + take], "big")
                                pos += take
                                nbits += take << 3
                            if nbits < s:
                                buf <<= s - nbits
                                nbits = s
                            v = buf >> (nbits - s)
                            nbits -= s
                            buf &= (1 << nbits) - 1
                            row[k] = v if v >= (1 << (s - 1)) else v - (1 << s) + 1
                            k += 1
            mcu += 1

    return _reconstruct(blocks, comps, qts, nbx, nby, max_h, max_v, h, w)


def _alloc_blocks(comps, h, w, dtype):
    """MCU-padded per-component zigzag coefficient arrays (nby, nbx, 64)."""
    max_h = max(c["h"] for c in comps)
    max_v = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * max_h))
    mcus_y = -(-h // (8 * max_v))
    return [np.zeros((mcus_y * c["v"], mcus_x * c["h"], 64), dtype=dtype)
            for c in comps]


def _fancy_h2v1(p: np.ndarray) -> np.ndarray:
    """libjpeg jdsample.c h2v1_fancy_upsample, vectorized: horizontal 1→2
    triangular filter in exact integer arithmetic. (h, w) → (h, 2w)."""
    h, w = p.shape
    if w == 1:
        return np.repeat(p, 2, axis=1)
    out = np.empty((h, 2 * w), np.int32)
    t3 = 3 * p
    out[:, 0] = p[:, 0]
    out[:, 2::2] = (t3[:, 1:] + p[:, :-1] + 1) >> 2
    out[:, 1:-1:2] = (t3[:, :-1] + p[:, 1:] + 2) >> 2
    out[:, -1] = p[:, -1]
    return out


def _fancy_h1v2(p: np.ndarray) -> np.ndarray:
    """libjpeg-turbo h1v2_fancy_upsample: vertical 1→2 triangular filter.
    (h, w) → (2h, w)."""
    t3 = 3 * p
    above = np.vstack([p[:1], p[:-1]])
    below = np.vstack([p[1:], p[-1:]])
    out = np.empty((2 * p.shape[0], p.shape[1]), np.int32)
    out[0::2] = (t3 + above + 1) >> 2
    out[1::2] = (t3 + below + 2) >> 2
    return out


def _fancy_h2v2(p: np.ndarray) -> np.ndarray:
    """libjpeg jdsample.c h2v2_fancy_upsample: 2×2 triangular filter on
    3:1 column sums, exact integer arithmetic. (h, w) → (2h, 2w)."""
    h, w = p.shape
    if w == 1 or h == 1:
        return np.repeat(np.repeat(p, 2, axis=0), 2, axis=1)
    cs = np.empty((2 * h, w), np.int32)  # 3*nearer + farther row sums
    t3 = 3 * p
    cs[0::2] = t3 + np.vstack([p[:1], p[:-1]])
    cs[1::2] = t3 + np.vstack([p[1:], p[-1:]])
    out = np.empty((2 * h, 2 * w), np.int32)
    c3 = 3 * cs
    out[:, 0] = (cs[:, 0] * 4 + 8) >> 4
    out[:, 2::2] = (c3[:, 1:] + cs[:, :-1] + 8) >> 4
    out[:, 1:-1:2] = (c3[:, :-1] + cs[:, 1:] + 7) >> 4
    out[:, -1] = (cs[:, -1] * 4 + 7) >> 4
    return out


def _reconstruct(blocks, comps, qts, nbx, nby, max_h, max_v, h, w) -> np.ndarray:
    """Dequantize + IDCT (whole-component einsum) + upsample + color — shared
    by the baseline and progressive entropy decoders.

    Chroma upsampling uses libjpeg's default "fancy" triangular filter
    (jdsample.c h2v1/h1v2/h2v2 integer semantics, applied to range-limited
    uint8-domain samples like libjpeg does) — box replication was ~23 dB
    against libjpeg on noisy 4:2:0 content; the triangular filter is the
    de-facto decode contract of real-world JPEG. Other sampling ratios
    fall back to replication."""
    planes = []
    for ci, comp in enumerate(comps):
        q = qts[comp["tq"]]
        coef = blocks[ci][:, :, UNZIGZAG].reshape(nby[ci], nbx[ci], 8, 8) * q
        pix = np.einsum("ji,abjk,kl->abil", _D, coef, _D) + 128.0
        plane = pix.transpose(0, 2, 1, 3).reshape(nby[ci] * 8, nbx[ci] * 8)
        sy, sx = max_v // comp["v"], max_h // comp["h"]
        if sy > 1 or sx > 1:
            # libjpeg range-limits samples BEFORE upsampling
            p8 = np.clip(np.round(plane), 0, 255).astype(np.int32)
            # crop the MCU padding first: the triangular filter must see
            # the true right/bottom edge, not padding garbage
            p8 = p8[: -(-h // sy), : -(-w // sx)]
            if (sy, sx) == (1, 2):
                plane = _fancy_h2v1(p8)
            elif (sy, sx) == (2, 1):
                plane = _fancy_h1v2(p8)
            elif (sy, sx) == (2, 2):
                plane = _fancy_h2v2(p8)
            else:
                plane = np.repeat(np.repeat(p8, sy, axis=0), sx, axis=1)
            plane = plane.astype(np.float64)
        planes.append(plane[:h, :w])
    n_comp = len(comps)
    if n_comp == 1:
        out = planes[0][None]
    elif n_comp == 3:
        y, cb, cr = planes
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        out = np.stack([r, g, b])
    else:
        raise NotImplementedError(f"{n_comp}-component JPEG unsupported")
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def _decode_prog_scan(pblocks, comps, scan_comps, ss, se, ah, al, scan,
                      restart_interval, dc_lut, ac_lut, h, w):
    """One progressive scan into the shared coefficient state (T.81 G.2;
    control flow mirrors libjpeg's jdphuff.c, public source). Coefficients
    accumulate in two's-complement int32, so successive-approximation bit
    insertion is plain |= / += on the array."""
    max_h = max(c["h"] for c in comps)
    max_v = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * max_h))
    mcus_y = -(-h // (8 * max_v))
    segments = _split_segments(scan, restart_interval)
    comp_idx = [comps.index(sc["comp"]) for sc in scan_comps]
    interleaved = len(scan_comps) > 1

    def units():
        """Yield lists of (ci, by, bx) — the blocks of one restart unit
        (MCU when interleaved, single block when not)."""
        if interleaved:
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    u = []
                    for sci, ci in enumerate(comp_idx):
                        comp = comps[ci]
                        for by in range(comp["v"]):
                            for bx in range(comp["h"]):
                                u.append((sci, ci, my * comp["v"] + by, mx * comp["h"] + bx))
                    yield u
        else:
            ci = comp_idx[0]
            comp = comps[ci]
            cw = -(-w * comp["h"] // max_h)
            chh = -(-h * comp["v"] // max_v)
            for by in range(-(-chh // 8)):
                for bx in range(-(-cw // 8)):
                    yield [(0, ci, by, bx)]

    p1 = 1 << al
    m1 = -p1
    rd = _BitReader(segments[0])
    seg_idx = 0
    preds = [0] * len(scan_comps)
    eobrun = 0
    unit_n = 0
    for unit in units():
        if restart_interval and unit_n and unit_n % restart_interval == 0:
            seg_idx += 1
            rd = _BitReader(segments[seg_idx])
            preds = [0] * len(scan_comps)
            eobrun = 0
        unit_n += 1
        for sci, ci, by, bx in unit:
            row = pblocks[ci][by, bx]
            if ss == 0 and ah == 0:  # DC first
                s = _rsym(rd, dc_lut[scan_comps[sci]["td"]])
                diff = _extend(rd.receive(s), s) if s else 0
                preds[sci] += diff
                row[0] = preds[sci] << al
            elif ss == 0:  # DC refine: one appended magnitude bit per block
                if rd.receive(1):
                    row[0] |= p1
            elif ah == 0:  # AC first (spectral band, EOB runs)
                if eobrun > 0:
                    eobrun -= 1
                    continue
                ac = ac_lut[scan_comps[sci]["ta"]]
                k = ss
                while k <= se:
                    sym = _rsym(rd, ac)
                    r, s = sym >> 4, sym & 15
                    if s:
                        k += r
                        if k > se:
                            break
                        row[k] = _extend(rd.receive(s), s) << al
                        k += 1
                    else:
                        if r != 15:
                            eobrun = (1 << r) - 1
                            if r:
                                eobrun += rd.receive(r)
                            break
                        k += 16
            else:  # AC refine: corrections + newly-nonzero coefficients
                ac = ac_lut[scan_comps[sci]["ta"]]
                k = ss
                if eobrun == 0:
                    while k <= se:
                        sym = _rsym(rd, ac)
                        r, s = sym >> 4, sym & 15
                        newval = 0
                        if s:
                            newval = p1 if rd.receive(1) else m1
                        elif r != 15:
                            eobrun = 1 << r
                            if r:
                                eobrun += rd.receive(r)
                            break
                        # advance past r zero-history coefficients, applying
                        # correction bits to nonzero-history ones on the way
                        while k <= se:
                            v = int(row[k])
                            if v != 0:
                                if rd.receive(1) and (v & p1) == 0:
                                    row[k] = v + (p1 if v >= 0 else m1)
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            k += 1
                        if newval and k <= se:
                            row[k] = newval
                        k += 1
                if eobrun > 0:
                    while k <= se:
                        v = int(row[k])
                        if v != 0:
                            if rd.receive(1) and (v & p1) == 0:
                                row[k] = v + (p1 if v >= 0 else m1)
                        k += 1
                    eobrun -= 1
