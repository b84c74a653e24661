"""From-scratch PNG codec (RFC 2083), 8-bit grayscale, stdlib-only.

The lossless sibling of ``functions/jpeg.py`` on the S13 media surface:
zlib (stdlib) carries the DEFLATE layer; this module implements the PNG
container — signature, chunk framing + CRC-32, IHDR/IDAT/IEND — and the
scanline filter layer (encode uses filter 0/None per line; decode
reconstructs ALL five standard filter types, so streams from any
compliant encoder of this profile parse). Lossless ⇒ the generator truth
pins exact pixels, unlike the JPEG class.

Scope (documented): color type 0 (grayscale), bit depth 8, no interlace.
Palette/RGBA/16-bit/Adam7 raise ``ValueError`` — they stay at the
declared PIL-class stub boundary.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_gray(arr: np.ndarray, level: int = 6) -> bytes:
    """uint8 (h, w) → PNG bytes (grayscale-8, filter 0 per scanline)."""
    h, w = arr.shape
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, level))
        + _chunk(b"IEND", b"")
    )


def _unfilter(raw: bytes, h: int, w: int) -> np.ndarray:
    """Reconstruct scanlines for all five standard filter types (RFC 2083
    §6; bpp = 1 for grayscale-8)."""
    out = np.zeros((h, w), np.uint8)
    stride = w + 1
    prev = np.zeros(w, np.int32)
    for y in range(h):
        line = raw[y * stride : (y + 1) * stride]
        ftype = line[0]
        cur = np.frombuffer(line[1:], np.uint8).astype(np.int32)
        if ftype == 0:  # None
            rec = cur
        elif ftype == 2:  # Up
            rec = (cur + prev) & 0xFF
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth: sequential in x
            rec = np.zeros(w, np.int32)
            a = 0  # left neighbor (reconstructed)
            for x in range(w):
                b = int(prev[x])
                c = int(prev[x - 1]) if x else 0
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + b) // 2
                else:  # Paeth
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                a = (int(cur[x]) + pred) & 0xFF
                rec[x] = a
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = rec.astype(np.uint8)
        prev = rec
    return out


def decode_gray(payload: bytes) -> tuple[int, int, np.ndarray]:
    """PNG bytes → (w, h, uint8 array). Grayscale-8 non-interlaced only."""
    if payload[:8] != _SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    w = h = -1
    idat = bytearray()
    while pos < len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", payload[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk CRC mismatch in {tag!r}")
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, inter = struct.unpack(">IIBBBBB", body)
            if depth != 8 or ctype != 0:
                raise ValueError("only grayscale-8 supported (stub boundary)")
            if inter != 0:
                raise ValueError("interlaced PNG unsupported (stub boundary)")
            if comp != 0 or filt != 0:
                raise ValueError("nonstandard compression/filter method")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if w < 0 or not idat:
        raise ValueError("missing IHDR/IDAT")
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (w + 1):
        raise ValueError("PNG raster size mismatch")
    return w, h, _unfilter(raw, h, w)
