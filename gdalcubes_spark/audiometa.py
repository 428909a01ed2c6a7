"""Audio container metadata parsers — MP3 (MPEG-1/2/2.5 Layer I-III
frame-header walk + Xing/Info VBR tag), FLAC (STREAMINFO), WAV (fmt
chunk).  Pure header parsing from the public specs (ISO/IEC 11172-3 /
13818-3 frame syntax, the de-facto Xing tag layout, the FLAC format
spec, RIFF/WAVE) — NO sample decode: the point is that a 100 TB audio
inventory can be triaged (duration / rate / channels / bitrate / VBR)
with a few KB of reads per object while full mp3/flac decode stays the
documented external-library seam (multimodal.audio_features).

Returns plain dicts so the Spark operator (multimodal.audio_info) can
Arrow-batch them without intermediate objects.
"""
from __future__ import annotations

import struct

# bitrate tables, kbps; index 0 = "free", 15 = invalid  (11172-3 / 13818-3)
_BITRATES = {
    (1, 1): (0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384,
             416, 448),
    (1, 2): (0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256,
             320, 384),
    (1, 3): (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
             256, 320),
    (2, 1): (0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192,
             224, 256),
    (2, 2): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
             160),
}
_RATES = {3: (44100, 48000, 32000),   # MPEG-1
          2: (22050, 24000, 16000),   # MPEG-2
          0: (11025, 12000, 8000)}    # MPEG-2.5


def _skip_id3v2(b: bytes) -> int:
    if b[:3] != b"ID3" or len(b) < 10:
        return 0
    size = ((b[6] & 0x7F) << 21) | ((b[7] & 0x7F) << 14) \
        | ((b[8] & 0x7F) << 7) | (b[9] & 0x7F)
    return 10 + size + (10 if b[5] & 0x10 else 0)


def _parse_mp3_frame(b: bytes, pos: int):
    """Frame header at pos → (frame_bytes, samples, rate, kbps) or None."""
    if pos + 4 > len(b) or b[pos] != 0xFF or (b[pos + 1] & 0xE0) != 0xE0:
        return None
    h = struct.unpack(">I", b[pos:pos + 4])[0]
    ver_bits = (h >> 19) & 3          # 0=2.5, 2=MPEG-2, 3=MPEG-1
    layer_bits = (h >> 17) & 3        # 1=III, 2=II, 3=I
    if ver_bits == 1 or layer_bits == 0:
        return None
    layer = 4 - layer_bits            # 1, 2, 3
    br_idx = (h >> 12) & 0xF
    sr_idx = (h >> 10) & 3
    padding = (h >> 9) & 1
    if br_idx in (0, 15) or sr_idx == 3:
        return None                   # free-format / invalid
    v = 1 if ver_bits == 3 else 2
    if v == 1:
        kbps = _BITRATES[(1, layer)][br_idx]
    else:  # MPEG-2/2.5: Layer II and III share one table
        kbps = _BITRATES[(2, 1 if layer == 1 else 2)][br_idx]
    rate = _RATES[ver_bits][sr_idx]
    if layer == 1:
        samples = 384
        frame = (12 * kbps * 1000 // rate + padding) * 4
    else:
        samples = 1152 if (layer == 2 or v == 1) else 576
        frame = samples // 8 * kbps * 1000 // rate + padding
    if frame <= 4:
        return None
    return frame, samples, rate, kbps, v, layer, h


def parse_mp3(b: bytes, max_frames: int = 1_000_000) -> dict:
    """Walk every MPEG audio frame: exact frame count / duration / mean
    bitrate, Xing/Info VBR tag detection.  Resyncs on garbage like real
    players (scan forward for the next valid sync)."""
    pos = _skip_id3v2(b)
    n = len(b)
    frames = 0
    samples_total = 0
    rate = 0
    kbps_first = None
    vbr = False
    cbr = True
    channels = None
    version = layer = None
    while pos + 4 <= n and frames < max_frames:
        f = _parse_mp3_frame(b, pos)
        if f is None:
            pos += 1  # resync
            continue
        frame, samples, rate, kbps, v, lay, h = f
        if frames == 0:
            kbps_first = kbps
            version, layer = v, lay
            mode = (h >> 6) & 3
            channels = 1 if mode == 3 else 2
            # Xing/Info tag sits after the Layer-III side info
            if lay == 3:
                off = pos + 4 + ((17 if mode == 3 else 32) if v == 1
                                 else (9 if mode == 3 else 17))
                tag = b[off:off + 4]
                if tag == b"Xing":
                    vbr = True
                elif tag == b"Info":
                    vbr = False
        elif kbps != kbps_first:
            cbr = False
        frames += 1
        samples_total += samples
        pos += frame
    if frames == 0:
        raise ValueError("no MPEG audio frames found")
    duration = samples_total / rate
    return dict(container=f"mp3(v{version}L{layer})", sample_rate=rate,
                channels=channels, bits_per_sample=0, n_frames=frames,
                n_samples=samples_total, duration_s=duration,
                bitrate_kbps=len(b) * 8 / duration / 1000,
                vbr=vbr or not cbr)


def parse_flac(b: bytes) -> dict:
    """fLaC STREAMINFO → exact sample count / rate / channels / bits
    (and thus exact duration) without touching a single audio frame."""
    if b[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    while pos + 4 <= len(b):
        hdr = b[pos]
        btype = hdr & 0x7F
        (ln,) = struct.unpack(">I", b"\x00" + b[pos + 1:pos + 4])
        body = b[pos + 4:pos + 4 + ln]
        if btype == 0:  # STREAMINFO
            bits = int.from_bytes(body[10:18], "big")
            rate = (bits >> 44) & 0xFFFFF
            channels = ((bits >> 41) & 7) + 1
            bps = ((bits >> 36) & 0x1F) + 1
            total = bits & ((1 << 36) - 1)
            return dict(container="flac", sample_rate=rate,
                        channels=channels, bits_per_sample=bps,
                        n_frames=0, n_samples=total,
                        duration_s=total / rate if rate else 0.0,
                        bitrate_kbps=(len(b) * 8 / (total / rate) / 1000
                                      if total and rate else 0.0),
                        vbr=True)
        if hdr & 0x80:  # last-metadata-block flag
            break
        pos += 4 + ln
    raise ValueError("FLAC without a STREAMINFO block")


def parse_wav(b: bytes) -> dict:
    """RIFF/WAVE fmt + data chunk sizes → rate / channels / bits /
    exact sample count."""
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos = 12
    rate = channels = bits = None
    data_len = 0
    while pos + 8 <= len(b):
        tag = b[pos:pos + 4]
        (sz,) = struct.unpack("<I", b[pos + 4:pos + 8])
        if tag == b"fmt ":
            _fmt, channels, rate = struct.unpack("<HHI", b[pos + 8:pos + 16])
            bits = struct.unpack("<H", b[pos + 22:pos + 24])[0]
        elif tag == b"data":
            data_len = sz
        pos += 8 + sz + (sz & 1)
    if rate is None:
        raise ValueError("WAV without fmt chunk")
    n = data_len // (channels * max(bits // 8, 1))
    return dict(container="wav", sample_rate=rate, channels=channels,
                bits_per_sample=bits, n_frames=0, n_samples=n,
                duration_s=n / rate if rate else 0.0,
                bitrate_kbps=rate * channels * bits / 1000,
                vbr=False)


def parse_audio(b: bytes) -> dict:
    """Sniff + parse: WAV / FLAC / MP3 (incl. ID3v2-prefixed)."""
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        return parse_wav(b)
    if b[:4] == b"fLaC":
        return parse_flac(b)
    return parse_mp3(b)
