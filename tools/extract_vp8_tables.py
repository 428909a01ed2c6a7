"""Regenerate gdalcubes_spark/vp8tables.py from a system libwebp binary.

The VP8 key-frame decoder (gdalcubes_spark/vp8codec.py) needs the RFC 6386
constant tables: default/update token probabilities (13.4/13.5), key-frame
intra-mode probabilities (11.3-11.5), quantizer lookup tables (14.1) and the
coefficient band mapping (13.3).  These are published spec constants; typing
~4.3 KB of numbers by hand is error-prone, so this tool carves them out of a
system libwebp shared library, anchored on short sequences that ARE reliably
known from the RFC text (the zigzag order, the band map, the category-6
probabilities, the first rows of the mode/coefficient tables), and emits a
self-contained Python module.  The generated module is committed; this tool
exists for provenance and regeneration.  Correctness of the extraction is
established independently by the bit-exact decode parity fuzz against
libwebp itself (tests/test_vp8codec.py).

Usage: python tools/extract_vp8_tables.py [path-to-libwebp.so] > /dev/null
Writes gdalcubes_spark/vp8tables.py.
"""

from __future__ import annotations

import ctypes.util
import re
import struct
import sys


def _find_lib() -> str:
    if len(sys.argv) > 1:
        return sys.argv[1]
    for cand in (
        "/usr/lib/x86_64-linux-gnu/libwebp.so.7",
        ctypes.util.find_library("webp"),
    ):
        if cand:
            try:
                with open(cand, "rb"):
                    return cand
            except OSError:
                continue
    raise SystemExit("no libwebp shared library found; pass a path")


def main() -> None:
    path = _find_lib()
    import os

    real = os.path.realpath(path)
    data = open(real, "rb").read()

    # Anchor: the AC quantizer lookup (RFC 6386 14.1 ac_qlookup) starts
    # 4,5,6,7,8,9,10 and is stored little-endian uint16 in libwebp.
    anchor = struct.pack("<7H", 4, 5, 6, 7, 8, 9, 10)
    hits = [m.start() for m in re.finditer(re.escape(anchor), data)]
    if not hits:
        raise SystemExit("ac_qlookup anchor not found")
    base = None
    for h in hits:
        # The decoder copy is immediately followed by the uint8 dc table
        # (also starting 4,5,6,...) and the coefficient band map.
        if data[h + 256 : h + 256 + 7] == bytes([4, 5, 6, 7, 8, 9, 10]) and data[
            h + 384 : h + 384 + 16
        ] == bytes([0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7]):
            base = h
            break
    if base is None:
        raise SystemExit("decoder-layout ac/dc/bands cluster not found")

    ac_q = list(struct.unpack_from("<128H", data, base))
    dc_q = list(data[base + 256 : base + 256 + 128])

    # Key-frame B-mode probabilities [10][10][9] (RFC 6386 11.5): first row
    # {231,120,48,89,115,113,120,152,112} is given in the spec text.
    bm_anchor = bytes([231, 120, 48, 89, 115, 113, 120, 152, 112])
    bm_hits = [m.start() for m in re.finditer(re.escape(bm_anchor), data)]
    bm_off = min(bm_hits, key=lambda o: abs(o - base))
    raw_bmode = data[bm_off : bm_off + 900]
    # libwebp's intra4 enum permutes the RFC order (its B_RD/B_VR/B_LD/B_VL
    # are 4/5/6/7 vs the RFC's B_LD/B_RD/B_VR/B_VL), so its kBModesProba is
    # indexed [lib_above][lib_left].  Re-index to RFC order here so the
    # emitted table is kf_bmode_prob[rfc_above][rfc_left] as printed in
    # RFC 6386 11.5.  The 9 per-row probabilities are in tree-node order,
    # which is identical in both (checked against the RFC bmode tree).
    M = (0, 1, 2, 3, 6, 4, 5, 7, 8, 9)  # rfc mode -> libwebp mode
    kf_bmode = [0] * 900
    for a in range(10):
        for l in range(10):
            src = (M[a] * 10 + M[l]) * 9
            dst = (a * 10 + l) * 9
            kf_bmode[dst : dst + 9] = raw_bmode[src : src + 9]

    # Default token probabilities [4][8][3][11] (RFC 6386 13.5): band 0 of
    # block type 0 is all 128s, band 1 ctx 0 begins 253,136,254,255,228,219.
    cp_anchor = bytes([253, 136, 254, 255, 228, 219])
    cp_hits = [m.start() for m in re.finditer(re.escape(cp_anchor), data)]
    cp_off = min(cp_hits, key=lambda o: abs(o - base)) - 33
    if list(data[cp_off : cp_off + 33]) != [128] * 33:
        raise SystemExit("coeff default probs: leading 128-band not found")
    coeff_probs = list(data[cp_off : cp_off + 1056])

    # Token-probability update flags [4][8][3][11] (RFC 6386 13.4): sits
    # between the band map and the key-frame B-mode table in this layout;
    # locate it as the 1056 bytes ending exactly at the B-mode table, and
    # sanity-check the first 33 entries are 255 (band 0 is never updated).
    up_off = bm_off - 1056
    if list(data[up_off : up_off + 33]) != [255] * 33:
        raise SystemExit("coeff update probs: leading 255-band not found")
    update_probs = list(data[up_off : up_off + 1056])

    def fmt(name: str, vals: list, per: int = 16) -> str:
        lines = [f"{name} = ("]
        for i in range(0, len(vals), per):
            lines.append("    " + ", ".join(str(v) for v in vals[i : i + per]) + ",")
        lines.append(")")
        return "\n".join(lines)

    out = f'''"""RFC 6386 constant tables for the VP8 key-frame decoder.

GENERATED by tools/extract_vp8_tables.py from a system libwebp build
(anchored extraction of the published spec constants; see that tool's
docstring).  All tables are the ones printed in RFC 6386:

- DC_QLOOKUP / AC_QLOOKUP: 14.1 (dequantization lookup, index 0..127)
- COEFF_BANDS: 13.3 (coefficient position -> probability band)
- COEFF_PROBS: 13.5 default_coeff_probs[4][8][3][11], flattened
- COEFF_UPDATE_PROBS: 13.4 coeff_update_probs[4][8][3][11], flattened
- KF_BMODE_PROBS: 11.5 kf_bmode_prob[10][10][9], flattened

Do not edit by hand; regenerate with the tool.  Bit-exact decode parity
against libwebp (tests/test_vp8codec.py) validates the extraction.
"""

{fmt("DC_QLOOKUP", dc_q)}

{fmt("AC_QLOOKUP", ac_q)}

COEFF_BANDS = (0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7)

{fmt("COEFF_PROBS", coeff_probs, 11)}

{fmt("COEFF_UPDATE_PROBS", update_probs, 11)}

{fmt("KF_BMODE_PROBS", kf_bmode, 9)}
'''
    dest = "gdalcubes_spark/vp8tables.py"
    with open(dest, "w") as f:
        f.write(out)
    print(
        f"wrote {dest}: dcq@{base + 256} acq@{base} bands@{base + 384} "
        f"update@{up_off} bmode@{bm_off} probs@{cp_off} from {real}"
    )


if __name__ == "__main__":
    main()
