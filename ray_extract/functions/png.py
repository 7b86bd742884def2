"""Minimal from-scratch PNG codec: stdlib ``zlib`` + numpy scanline filters.

Closes the sandbox's media-decode gap for the one raster format the standard
library can actually carry end-to-end (RFC 2083 / ISO 15948 are public
specs; DEFLATE ships in ``zlib``). The reference pipeline treats media as
opaque refs (azure-pdf-parser keeps table/figure regions as metadata only),
so this is engine-side capability beyond the reference: real bytes in, real
pixel statistics out, inside the same actor-pool decode stage
(`pipelines/media.py`) that stubs the formats genuinely needing external
codecs (JPEG/video).

Supported: 8-bit depth, color types 0 (gray), 2 (RGB), 4 (gray+alpha),
6 (RGBA), non-interlaced, filters 0-4. Anything else raises ``PngError`` —
callers dead-letter, never crash.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


class PngError(ValueError):
    pass


def is_png(data: bytes) -> bool:
    return bytes(data[:8]) == PNG_MAGIC


def _chunk(ctype: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + ctype
        + payload
        + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
    )


def png_encode_gray(pixels: np.ndarray, cycle_filters: bool = True) -> bytes:
    """Encode an (h, w) uint8 array as an 8-bit grayscale PNG.

    ``cycle_filters`` applies scanline filter ``y % 5`` per row (None, Sub,
    Up, Average, Paeth) so a round-trip exercises every unfilter branch;
    False writes filter 0 throughout.
    """
    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    if px.ndim != 2:
        raise PngError("png_encode_gray expects an (h, w) array")
    h, w = px.shape
    raw = bytearray()
    prev = np.zeros(w, dtype=np.int16)
    for y in range(h):
        row = px[y].astype(np.int16)
        ft = (y % 5) if cycle_filters else 0
        if ft == 0:
            enc = row
        elif ft == 1:  # Sub: x - left
            enc = row - np.r_[np.int16(0), row[:-1]]
        elif ft == 2:  # Up: x - up
            enc = row - prev
        elif ft == 3:  # Average: x - (left + up) // 2
            enc = row - (np.r_[np.int16(0), row[:-1]] + prev) // 2
        else:  # Paeth
            left = np.r_[np.int16(0), row[:-1]]
            ul = np.r_[np.int16(0), prev[:-1]]
            p = left + prev - ul
            pa_, pb_, pc_ = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where(
                (pa_ <= pb_) & (pa_ <= pc_), left,
                np.where(pb_ <= pc_, prev, ul),
            )
            enc = row - pred
        raw.append(ft)
        raw += (enc & 0xFF).astype(np.uint8).tobytes()
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def _unfilter(raw: bytes, h: int, w: int, channels: int) -> np.ndarray:
    """PNG scanline unfilter -> (h, w * channels) uint8. Per-row numpy:
    None/Up are vector adds, Sub (bpp=1) is a mod-256 cumsum; Average and
    Paeth carry a true left-dependence, done per-pixel on int16 rows —
    acceptable because decode parallelism at scale comes from the actor
    pool over images, not from within one scanline."""
    rowlen = w * channels
    bpp = channels
    if len(raw) < h * (rowlen + 1):
        raise PngError("IDAT shorter than h * (rowlen + 1)")
    data = np.frombuffer(raw, dtype=np.uint8)[: h * (rowlen + 1)].reshape(
        h, rowlen + 1
    )
    out = np.zeros((h, rowlen), dtype=np.uint8)
    prev = np.zeros(rowlen, dtype=np.int16)
    for y in range(h):
        ft = int(data[y, 0])
        row = data[y, 1:].astype(np.int16)
        if ft == 0:
            cur = row
        elif ft == 1:  # Sub
            if bpp == 1:
                cur = np.cumsum(row, dtype=np.int64)
            else:
                cur = row.copy()
                for i in range(bpp, rowlen):
                    cur[i] = (cur[i] + cur[i - bpp]) & 0xFF
        elif ft == 2:  # Up
            cur = row + prev
        elif ft == 3:  # Average
            cur = row.copy()
            for i in range(rowlen):
                left = cur[i - bpp] & 0xFF if i >= bpp else 0
                cur[i] = cur[i] + ((left + (prev[i] & 0xFF)) >> 1)
        elif ft == 4:  # Paeth
            cur = row.copy()
            for i in range(rowlen):
                a = cur[i - bpp] & 0xFF if i >= bpp else 0
                b = prev[i] & 0xFF
                c = prev[i - bpp] & 0xFF if i >= bpp else 0
                p = a + b - c
                pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb_ and pa_ <= pc_) else (
                    b if pb_ <= pc_ else c
                )
                cur[i] = cur[i] + pred
        else:
            raise PngError(f"unsupported filter type {ft}")
        cur = (cur & 0xFF).astype(np.int16)
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out


def png_decode(data: bytes) -> dict:
    """Decode a PNG byte string -> dict(width, height, bit_depth,
    color_type, channels, pixels) with pixels an (h, w*channels) uint8
    array. CRCs are verified (corrupt chunks raise, callers dead-letter)."""
    data = bytes(data)
    if not is_png(data):
        raise PngError("bad PNG signature")
    pos = 8
    ihdr = None
    idat = bytearray()
    seen_end = False
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if len(payload) != length or pos + 12 + length > len(data):
            raise PngError("truncated chunk")
        (crc,) = struct.unpack(
            ">I", data[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(ctype + payload) & 0xFFFFFFFF != crc:
            raise PngError(f"CRC mismatch in {ctype!r}")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif ctype == b"IDAT":
            idat += payload
        elif ctype == b"IEND":
            seen_end = True
            break
        pos += 12 + length
    if ihdr is None or not seen_end:
        raise PngError("missing IHDR or IEND")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise PngError(
            f"unsupported PNG (depth={depth} interlace={interlace})"
        )
    if color_type not in _CHANNELS:
        raise PngError(f"unsupported color type {color_type}")
    channels = _CHANNELS[color_type]
    if w <= 0 or h <= 0 or w * h > 100_000_000:
        raise PngError("unreasonable dimensions")
    raw = zlib.decompress(bytes(idat))
    return {
        "width": int(w),
        "height": int(h),
        "bit_depth": int(depth),
        "color_type": int(color_type),
        "channels": channels,
        "pixels": _unfilter(raw, h, w, channels),
    }
