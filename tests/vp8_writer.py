"""Test-only VP8 key-frame bitstream writer.

libwebp's simple encode API never emits several header features the decoder
must handle (simple filter, multiple token partitions, loop-filter deltas,
absolute segment quantizers, nonzero sharpness, per-MB skip flags).  This
writer crafts minimal-but-valid key frames exercising those paths; the test
oracle is libwebp's own decode of the crafted stream, compared bit-for-bit
against gdalcubes_spark.vp8codec.

Only what the tests need is implemented: DC_PRED macroblocks with small
per-block DC coefficients (enough to drive every loop-filter branch), the
full header surface, and 1/2/4/8 token partitions.
"""

from __future__ import annotations

import numpy as np

from gdalcubes_spark.vp8codec import (
    CAT_BASE,
    CAT_PROBS,
    COEFF_BANDS,
    ZIGZAG,
)
from gdalcubes_spark.vp8tables import COEFF_PROBS, COEFF_UPDATE_PROBS


class BoolEncoder:
    """RFC 6386 §8 boolean encoder, big-int low (carries resolve at flush)."""

    def __init__(self):
        self.low = 0
        self.range = 255
        self.nbits = 0

    def put(self, bit: int, prob: int) -> None:
        split = 1 + (((self.range - 1) * prob) >> 8)
        if bit:
            self.low += split
            self.range -= split
        else:
            self.range = split
        while self.range < 128:
            self.range <<= 1
            self.low <<= 1
            self.nbits += 1

    def put_literal(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.put((v >> i) & 1, 128)

    def put_signed(self, v: int, n: int) -> None:
        self.put_literal(abs(v), n)
        self.put(1 if v < 0 else 0, 128)

    def put_flagged(self, v: int, n: int) -> None:
        """Conditional signed field: flag bit then magnitude+sign if set."""
        if v:
            self.put(1, 128)
            self.put_signed(v, n)
        else:
            self.put(0, 128)

    def bytes(self) -> bytes:
        # `low` carries 8 integer bits above nbits fractional bits (the
        # coder works in [0, 256) at the top scale).  Any decoder value in
        # [low, low + range) round-trips, and zero-padded `low` is inside
        # that interval (range >= 1).  Pad the fraction to a byte boundary.
        pad = (-self.nbits) % 8
        v = self.low << pad
        n = (self.nbits + pad) // 8 + 1
        return v.to_bytes(n, "big")


def _put_tree(be: BoolEncoder, tree, probs, leaf: int) -> None:
    """Emit the bit path that makes read_tree() return `leaf`."""
    # find path by DFS from root
    def path(i):
        for b in (0, 1):
            nxt = tree[i + b]
            if nxt <= 0:
                if -nxt == leaf:
                    return [(i >> 1, b)]
            else:
                sub = path(nxt)
                if sub is not None:
                    return [(i >> 1, b)] + sub
        return None

    for pi, b in path(0):
        be.put(b, probs[pi])


def _write_coeffs(be: BoolEncoder, probs, ptype: int, first: int, ctx: int,
                  coeffs) -> int:
    """Mirror of vp8codec._decode_coeffs with puts; returns nnz flag."""
    base = ptype * 264
    # last nonzero coefficient position (in zigzag order)
    last = -1
    for c in range(first, 16):
        if coeffs[ZIGZAG[c]]:
            last = c
    c = first
    ctx_now = ctx
    skip_eob = False
    while c < 16:
        p = base + COEFF_BANDS[c] * 33 + ctx_now * 11
        if not skip_eob:
            if last < c:
                be.put(0, probs[p])  # EOB
                return 1 if last >= first else 0
            be.put(1, probs[p])
        v = coeffs[ZIGZAG[c]]
        if v == 0:
            be.put(0, probs[p + 1])
            ctx_now = 0
            skip_eob = True
            c += 1
            continue
        be.put(1, probs[p + 1])
        skip_eob = False
        a = abs(v)
        if a == 1:
            be.put(0, probs[p + 2])
            ctx_now = 1
        else:
            be.put(1, probs[p + 2])
            ctx_now = 2
            if a <= 4:
                be.put(0, probs[p + 3])
                if a == 2:
                    be.put(0, probs[p + 4])
                else:
                    be.put(1, probs[p + 4])
                    be.put(a - 3, probs[p + 5])
            else:
                be.put(1, probs[p + 3])
                cat = max(i for i in range(6) if CAT_BASE[i] <= a)
                if cat <= 1:
                    be.put(0, probs[p + 6])
                    be.put(cat, probs[p + 7])
                else:
                    be.put(1, probs[p + 6])
                    if cat <= 3:
                        be.put(0, probs[p + 8])
                        be.put(cat - 2, probs[p + 9])
                    else:
                        be.put(1, probs[p + 8])
                        be.put(cat - 4, probs[p + 10])
                extra = a - CAT_BASE[cat]
                cp = CAT_PROBS[cat]
                for i, prob in enumerate(cp):
                    be.put((extra >> (len(cp) - 1 - i)) & 1, prob)
        be.put(1 if v < 0 else 0, 128)
        c += 1
    return 1


def write_stream(mb_w, mb_h, *, dc_plan, simple_filter=0, filter_level=20,
                 sharpness=0, n_parts=1, lf_delta=None, segmentation=None,
                 use_skip=0, skip_plan=None, width=None, height=None):
    """Craft a VP8 key frame of DC_PRED macroblocks.

    dc_plan(my, mx) -> (y_dc, u_dc, v_dc) small ints: the quantized DC
    coefficient written for the Y2/U/V blocks of that MB.  skip_plan(my,
    mx) -> bool marks MBs whose residuals are skipped (requires use_skip).
    segmentation: None or dict(quant=[4], lf=[4], abs=0/1, map=(my,mx)->id).
    lf_delta: None or (ref_deltas[4], mode_deltas[4]).
    Returns a complete RIFF/WEBP container (bytes).
    """
    w = width or mb_w * 16
    h = height or mb_h * 16

    hdr = BoolEncoder()
    hdr.put(0, 128)  # color space
    hdr.put(0, 128)  # clamping
    seg = segmentation
    hdr.put(1 if seg else 0, 128)
    if seg:
        hdr.put(1, 128)  # update map
        hdr.put(1, 128)  # update feature data
        hdr.put(seg.get("abs", 0), 128)
        for q in seg["quant"]:
            hdr.put_flagged(q, 7)
        for f in seg["lf"]:
            hdr.put_flagged(f, 6)
        for _ in range(3):  # keep default 255 tree probs
            hdr.put(0, 128)
    hdr.put(simple_filter, 128)
    hdr.put_literal(filter_level, 6)
    hdr.put_literal(sharpness, 3)
    if lf_delta:
        hdr.put(1, 128)  # enabled
        hdr.put(1, 128)  # update
        for d in lf_delta[0]:
            hdr.put_flagged(d, 6)
        for d in lf_delta[1]:
            hdr.put_flagged(d, 6)
    else:
        hdr.put(0, 128)
    hdr.put_literal({1: 0, 2: 1, 4: 2, 8: 3}[n_parts], 2)
    hdr.put_literal(40, 7)  # y_ac_qi
    for _ in range(5):  # no quantizer deltas
        hdr.put(0, 128)
    hdr.put(1, 128)  # refresh entropy probs
    for i in range(1056):  # keep default token probs
        hdr.put(0, COEFF_UPDATE_PROBS[i])
    hdr.put(use_skip, 128)
    if use_skip:
        hdr.put_literal(200, 8)  # skip prob

    # modes: all DC_PRED (kf ymode tree path "1,0,0"), uv DC ("0")
    for my in range(mb_h):
        for mx in range(mb_w):
            if seg:
                sid = seg["map"](my, mx)
                # default 255 probs: tree {2,4,-0,-1,-2,-3}
                if sid < 2:
                    hdr.put(0, 255)
                    hdr.put(sid, 255)
                else:
                    hdr.put(1, 255)
                    hdr.put(sid - 2, 255)
            if use_skip:
                hdr.put(1 if skip_plan(my, mx) else 0, 200)
            hdr.put(1, 145)
            hdr.put(0, 156)
            hdr.put(0, 163)
            hdr.put(0, 142)

    # residual partitions with decoder-mirrored nz context tracking
    parts = [BoolEncoder() for _ in range(n_parts)]
    anz = [[0] * 9 for _ in range(mb_w)]
    probs = COEFF_PROBS
    zero = [0] * 16
    for my in range(mb_h):
        be = parts[my % n_parts]
        lnz = [0] * 9
        for mx in range(mb_w):
            a = anz[mx]
            if use_skip and skip_plan(my, mx):
                for k in range(8):
                    lnz[k] = a[k] = 0
                lnz[8] = a[8] = 0  # DC_PRED MBs have a Y2 block
                continue
            y_dc, u_dc, v_dc = dc_plan(my, mx)
            y2 = [0] * 16
            y2[0] = y_dc
            nz = _write_coeffs(be, probs, 1, 0, lnz[8] + a[8], y2)
            lnz[8] = a[8] = nz
            for i in range(16):
                r, cidx = i >> 2, i & 3
                nz = _write_coeffs(be, probs, 0, 1, lnz[r] + a[cidx], zero)
                lnz[r] = a[cidx] = nz
            for off, dc in ((4, u_dc), (6, v_dc)):
                blk = [0] * 16
                blk[0] = dc
                for i in range(4):
                    r, cidx = i >> 1, i & 1
                    nz = _write_coeffs(be, probs, 2, 0,
                                       lnz[off + r] + a[off + cidx], blk)
                    lnz[off + r] = a[off + cidx] = nz
            del y2

    part0 = hdr.bytes()
    tag = (0) | (0 << 1) | (1 << 4) | (len(part0) << 5)
    payload = bytearray()
    payload += bytes((tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF))
    payload += b"\x9d\x01\x2a"
    payload += int(w).to_bytes(2, "little")
    payload += int(h).to_bytes(2, "little")
    payload += part0
    pbytes = [p.bytes() for p in parts]
    for pb in pbytes[:-1]:
        payload += len(pb).to_bytes(3, "little")
    for pb in pbytes:
        payload += pb

    chunk = bytes(payload)
    if len(chunk) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + b"VP8 " + len(payload).to_bytes(4, "little") + chunk
    return b"RIFF" + len(riff).to_bytes(4, "little") + riff


def checkerboard_dc(scale=8):
    """A dc_plan producing strong MB-to-MB discontinuities (drives the
    loop filter's mask/hev branches both ways)."""
    def plan(my, mx):
        s = scale if (my + mx) % 2 == 0 else -scale
        return (s * 3, s, -s)
    return plan
