"""From-scratch PNG decoder (stdlib zlib only) — the counterpart of the
minimal encoder in ``render.py:encode_png``.

Closes the round-1 gap where the mostly-white/black and perceptual operators
(F5/F6/D3 — ``pdfplumber/pdf_image_extractor_improved.py:77-124``) had only
ever seen fabricated pixels: ``decode_image`` now really decodes any PNG
payload (signature-sniffed), so those filters run on actual rendered-page
rasters. PIL is absent in this container; this implements the subset a
correct 8-bit PNG reader needs:

- chunk walk with length/CRC framing (CRC not verified — content is local),
- IHDR: bit depth 8; color types 0 (gray), 2 (RGB), 4 (gray+alpha),
  6 (RGBA); interlace 0 only,
- concatenated IDAT zlib stream,
- all five scanline filters (None/Sub/Up/Average/Paeth, PNG spec §9).

Output is always HxWx3 uint8 (gray broadcast, alpha dropped) — the shape
the pixel filters consume.
"""
from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = ["is_png", "decode_png", "PngError"]

_SIG = b"\x89PNG\r\n\x1a\n"


class PngError(ValueError):
    pass


def is_png(data: bytes) -> bool:
    return data[:8] == _SIG


_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _unfilter(raw: bytes, h: int, w: int, ch: int) -> np.ndarray:
    """Undo per-scanline filtering; returns (h, w*ch) uint8."""
    stride = w * ch
    if len(raw) < h * (stride + 1):
        raise PngError("truncated pixel data")
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    prev = np.zeros(stride, dtype=np.int32)
    for r in range(h):
        ftype = raw[pos]
        pos += 1
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos).astype(
            np.int32
        )
        pos += stride
        if ftype == 0:  # None
            cur = line
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype in (1, 3, 4):
            # Sub/Average/Paeth reference the previous PIXEL on the same
            # line — a sequential recurrence per scanline (numpy cumsum
            # tricks only cover Sub; keep the loop, lines are short)
            cur = np.empty(stride, dtype=np.int32)
            for i in range(stride):
                a = cur[i - ch] if i >= ch else 0  # left
                b = prev[i]  # up
                if ftype == 1:
                    cur[i] = (line[i] + a) & 0xFF
                elif ftype == 3:
                    cur[i] = (line[i] + ((a + b) >> 1)) & 0xFF
                else:  # Paeth
                    c = prev[i - ch] if i >= ch else 0  # upper-left
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    if pa <= pb and pa <= pc:
                        pred = a
                    elif pb <= pc:
                        pred = b
                    else:
                        pred = c
                    cur[i] = (line[i] + pred) & 0xFF
        else:
            raise PngError(f"unknown filter {ftype}")
        out[r] = cur.astype(np.uint8)
        prev = cur
    return out


def decode_png(data: bytes) -> np.ndarray:
    """Decode a PNG byte string to an HxWx3 uint8 RGB array."""
    if not is_png(data):
        raise PngError("not a png")
    pos = 8
    ihdr = None
    idat = bytearray()
    n = len(data)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + tag + payload + crc
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if ihdr is None:
        raise PngError("missing IHDR")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if depth != 8 or ctype not in _CHANNELS or comp != 0 or filt != 0 or interlace != 0:
        raise PngError(f"unsupported format (depth={depth} ctype={ctype})")
    if w == 0 or h == 0:
        raise PngError("empty image")
    ch = _CHANNELS[ctype]
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise PngError(f"bad idat: {e}") from e
    px = _unfilter(raw, h, w, ch).reshape(h, w, ch)
    if ctype == 2:
        return px
    if ctype == 6:
        return px[:, :, :3].copy()
    if ctype == 0:
        return np.repeat(px, 3, axis=2)
    return np.repeat(px[:, :, :1], 3, axis=2)  # gray+alpha
