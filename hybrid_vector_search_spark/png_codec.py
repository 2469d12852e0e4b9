"""Minimal pure-stdlib PNG codec (zlib + struct) for the multimodal lane.

The container has no image libraries, but PNG's wire format is public and
small: length-prefixed chunks, zlib-compressed scanlines, five per-scanline
filters. This gives the engine a REAL codec path — testable in-container,
byte-exact, no dependencies — alongside the Pillow gate (which stays the
route for JPEG & friends). Supports the formats a training pipeline's
thumbnails actually use: 8-bit greyscale (color type 0), RGB (2) and RGBA
(6), non-interlaced. Anything else raises with the reason.

Scale note: the codec runs INSIDE Arrow-batched kernels (multimodal
.decode_media dispatches format='png' here); bytes stay executor-side and
never transit a shuffle, same rule as every media kernel.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → (H, W, C) uint8 array (C ∈ {1, 3, 4})."""
    if data[:8] != _MAGIC:
        raise ValueError("not a PNG: bad signature")
    pos, ihdr, idat = 8, None, []
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + body + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("not a PNG: missing IHDR")
    w, h, depth, color, _comp, _filt, interlace = ihdr
    if depth != 8 or color not in _CHANNELS or interlace != 0:
        raise NotImplementedError(
            f"png_codec handles 8-bit non-interlaced grey/RGB/RGBA only "
            f"(got depth={depth}, color_type={color}, interlace={interlace})"
        )
    ch = _CHANNELS[color]
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("corrupt PNG: scanline payload size mismatch")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).copy()
        if f == 0:  # None
            cur = line
        elif f == 1:  # Sub
            cur = line
            for x in range(ch, stride):
                cur[x] = (int(cur[x]) + int(cur[x - ch])) & 0xFF
        elif f == 2:  # Up
            cur = (line.astype(np.uint16) + prev) & 0xFF
            cur = cur.astype(np.uint8)
        elif f == 3:  # Average
            cur = line
            for x in range(stride):
                left = int(cur[x - ch]) if x >= ch else 0
                cur[x] = (int(cur[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            cur = line
            for x in range(stride):
                a = int(cur[x - ch]) if x >= ch else 0
                b = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (int(cur[x]) + pred) & 0xFF
        else:
            raise ValueError(f"corrupt PNG: unknown filter {f}")
        out[y] = cur
        prev = out[y]
    return out.reshape(h, w, ch)


def encode_png(img: np.ndarray, *, compresslevel: int = 6) -> bytes:
    """(H, W, C) or (H, W) uint8 array → PNG bytes (filter 0 scanlines —
    simple, valid, and deterministic; decoders apply any-filter anyway)."""
    a = np.asarray(img, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    color = {1: 0, 3: 2, 4: 6}.get(ch)
    if color is None:
        raise ValueError(f"encode_png needs 1/3/4 channels, got {ch}")

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    stride_rows = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), a.reshape(h, w * ch)], axis=1
    )
    idat = zlib.compress(stride_rows.tobytes(), compresslevel)
    return _MAGIC + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")
